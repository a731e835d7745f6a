"""SEI messages: decoded picture hash + generic container.

Capability ref: SEI.h:49-74 payload registry, SEIwrite.cpp (serialization),
SEIread.cpp (parse), and the decoded-picture-hash oracle the reference uses
as its integration test (TEncGOP.cpp:1789-1794 emit,
TDecGop.cpp:230-290 verify). Payload syntax per H.265 Annex D.
"""
from __future__ import annotations

import dataclasses
import hashlib

import numpy as np

PICTURE_HASH = 132      # decoded_picture_hash payload type (D.2.19)

HASH_MD5 = 0
HASH_CRC = 1
HASH_CHECKSUM = 2


@dataclasses.dataclass
class SEIMessage:
    payload_type: int
    payload: bytes


def plane_md5s(y, cb, cr, bit_depth: int = 8) -> list:
    """Per-plane MD5 digests, sample layout per D.3.19 / TComPicYuvMD5.cpp:
    each sample little-endian, 1 or 2 bytes by bit depth."""
    out = []
    for plane in (y, cb, cr):
        p = np.asarray(plane)
        md5 = hashlib.md5()
        if bit_depth <= 8:
            md5.update(p.astype(np.uint8).tobytes())
        else:
            md5.update(p.astype("<u2").tobytes())
        out.append(md5.digest())
    return out


def make_picture_hash_payload(digests: list,
                              hash_type: int = HASH_MD5) -> bytes:
    return bytes([hash_type]) + b"".join(digests)


def write_sei(messages: list) -> bytes:
    """Serialize SEI messages into one RBSP (sei_message syntax, D.1)."""
    out = bytearray()
    for msg in messages:
        t = msg.payload_type
        while t >= 255:
            out.append(255)
            t -= 255
        out.append(t)
        s = len(msg.payload)
        while s >= 255:
            out.append(255)
            s -= 255
        out.append(s)
        out += msg.payload
    out.append(0x80)    # rbsp_trailing_bits
    return bytes(out)


def parse_sei(rbsp: bytes) -> list:
    """Parse all sei_message()s in an SEI RBSP."""
    out = []
    i = 0
    while i < len(rbsp) and rbsp[i] != 0x80:
        t = 0
        while rbsp[i] == 255:
            t += 255
            i += 1
        t += rbsp[i]
        i += 1
        s = 0
        while rbsp[i] == 255:
            s += 255
            i += 1
        s += rbsp[i]
        i += 1
        out.append(SEIMessage(t, rbsp[i:i + s]))
        i += s
    return out


def verify_picture_hash(payload: bytes, y, cb, cr,
                        bit_depth: int = 8) -> bool:
    """True iff the decoded picture matches the hash SEI
    (TDecGop.cpp:230 calcAndPrintHashStatus). All three hash types."""
    from hevc_hop_tpu.ops import hashes
    if payload[0] == HASH_MD5:
        digests = plane_md5s(y, cb, cr, bit_depth)
    elif payload[0] == HASH_CRC:
        digests = hashes.crc_digests(y, cb, cr, bit_depth)
    elif payload[0] == HASH_CHECKSUM:
        digests = hashes.checksum_digests_np(y, cb, cr, bit_depth)
    else:
        raise ValueError(f"unknown hash type {payload[0]}")
    return payload[1:] == b"".join(digests)
