"""Decoded-picture-hash SEI: emit + parse + verify (the reference's
integration oracle, TEncGOP.cpp:1789 / TDecGop.cpp:230)."""
import numpy as np

from hevc_hop_tpu.bitstream import sei
from hevc_hop_tpu.models.decoder import Decoder
from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder
from hevc_hop_tpu.models.ss_encoder import HoloConfig, HoloEncoder
from tests.test_e2e_iss import synth_lenslet


def test_sei_roundtrip_bytes():
    msgs = [sei.SEIMessage(sei.PICTURE_HASH, b"\x00" + b"a" * 48),
            sei.SEIMessage(300, b"xyz")]
    rbsp = sei.write_sei(msgs)
    got = sei.parse_sei(rbsp)
    assert [(m.payload_type, m.payload) for m in got] == \
        [(m.payload_type, m.payload) for m in msgs]


def test_decoder_verifies_hash_intra():
    y, cb, cr = synth_lenslet(64, 64, 8, seed=1)
    enc = IntraEncoder(EncoderConfig(width=64, height=64, qp=30, cu_log2=4))
    stream = enc.encode_frame(y, cb, cr)
    dec = Decoder()
    dec.decode_stream(stream)
    assert dec.hash_ok == [True]


def test_decoder_verifies_hash_sequence():
    y, cb, cr = synth_lenslet(64, 64, 13, seed=2)
    frames = [(y, cb, cr), (np.roll(y, 1, 1), cb, cr)]
    enc = HoloEncoder(HoloConfig(width=64, height=64, qp=32, cu_log2=4,
                                 search_range=16, search_range_t=8,
                                 mi_size=13))
    stream = enc.encode_sequence(frames)
    dec = Decoder()
    dec.decode_stream(stream)
    assert dec.hash_ok == [True, True]


def test_corrupt_stream_fails_hash():
    y, cb, cr = synth_lenslet(64, 64, 8, seed=3)
    enc = IntraEncoder(EncoderConfig(width=64, height=64, qp=30, cu_log2=4,
                                     deblocking=False))
    stream = bytearray(enc.encode_frame(y, cb, cr))
    # flip one bit deep inside the slice payload (past headers)
    stream[len(stream) - 80] ^= 0x10
    dec = Decoder()
    try:
        dec.decode_stream(bytes(stream))
    except (RuntimeError, AssertionError, IndexError):
        return  # desync detected = also acceptable
    assert dec.hash_ok and dec.hash_ok[-1] is False
