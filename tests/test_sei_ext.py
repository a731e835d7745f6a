"""Extended SEI payloads (SEI.h:49-74 registry subset) + lost-reference
concealment (TDecTop.cpp:258 xCreateLostPicture analog)."""
import numpy as np

from hevc_hop_tpu.bitstream import nal, sei
from hevc_hop_tpu.common.types import NalUnitType
from hevc_hop_tpu.models.decoder import Decoder


def test_sei_payload_roundtrips():
    uuid = bytes(range(16))
    msgs = [
        sei.SEIMessage(sei.USER_DATA_UNREGISTERED,
                       sei.make_user_data_unregistered(uuid, b"hevc-hop")),
        sei.SEIMessage(sei.RECOVERY_POINT,
                       sei.make_recovery_point(3, exact_match=False)),
        sei.SEIMessage(sei.ACTIVE_PARAMETER_SETS,
                       sei.make_active_parameter_sets(0, 0)),
        sei.SEIMessage(sei.FRAME_PACKING, sei.make_frame_packing(3)),
    ]
    back = sei.parse_sei(sei.write_sei(msgs))
    assert [m.payload_type for m in back] == [m.payload_type for m in msgs]
    u, d = sei.parse_user_data_unregistered(back[0].payload)
    assert (u, d) == (uuid, b"hevc-hop")
    rp = sei.parse_recovery_point(back[1].payload)
    assert rp["recovery_poc_cnt"] == 3 and rp["exact_match"] is False
    aps = sei.parse_active_parameter_sets(back[2].payload)
    assert aps == {"vps_id": 0, "sps_ids": [0]}
    fp = sei.parse_frame_packing(back[3].payload)
    assert fp["arrangement_type"] == 3


def test_decoder_sei_log_and_extra_sei_tolerated():
    """A stream carrying non-hash SEI decodes fine and logs the payloads."""
    from hevc_hop_tpu.models.encoder import EncoderConfig, IntraEncoder
    w, h = 64, 64
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    cb = np.full((h // 2, w // 2), 128, np.int32)
    cr = np.full((h // 2, w // 2), 128, np.int32)
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=32))
    stream = enc.encode_frame(y, cb, cr)
    extra = nal.make_nal(NalUnitType.PREFIX_SEI_NUT, sei.write_sei([
        sei.SEIMessage(sei.RECOVERY_POINT, sei.make_recovery_point(0)),
        sei.SEIMessage(sei.ACTIVE_PARAMETER_SETS,
                       sei.make_active_parameter_sets()),
    ]))
    stream2 = nal.annexb_wrap([extra]) + stream
    d = Decoder()
    d.decode_stream(stream2)
    assert d.hash_ok == [True]
    kinds = [k for (k, _) in d.sei_log]
    assert "recovery_point" in kinds and "active_parameter_sets" in kinds


def test_lost_reference_concealment():
    """Dropping the leading ISS IDR from an ISS+PSS sequence: the decoder
    synthesizes a mid-grey reference, keeps decoding, and records the
    concealment (the hash SEI then reports the corruption honestly)."""
    from hevc_hop_tpu.models.ss_encoder import HoloConfig, HoloEncoder
    w, h = 64, 64
    rng = np.random.default_rng(4)
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    cb = np.full((h // 2, w // 2), 128, np.int32)
    cr = np.full((h // 2, w // 2), 128, np.int32)
    enc = HoloEncoder(HoloConfig(width=w, height=h, qp=32, mi_size=16,
                                 gt=False, search_range=8))
    full = enc.encode_sequence([(y, cb, cr),
                                (np.clip(y + 1, 0, 255), cb, cr)])
    # split at NAL boundaries and drop the IDR slice, keep headers + PSS
    from hevc_hop_tpu.bitstream.bits import rbsp_to_ebsp
    rebuilt = []
    for (t, rbsp) in nal.annexb_split(full):
        if t == int(NalUnitType.IDR_W_RADL):
            continue   # lost IDR picture
        hdr = bytes([(t << 1) & 0xFF, 1])
        rebuilt.append(b"\x00\x00\x00\x01" + hdr + rbsp_to_ebsp(rbsp))
    broken = b"".join(rebuilt)
    d = Decoder()
    pics = d.decode_stream(broken)
    assert d.concealed, "concealment never triggered"
    assert len(pics) >= 2   # grey stand-in + decoded PSS picture
    # the PSS picture decoded against the stand-in: hash mismatch reported
    assert d.hash_ok and d.hash_ok[-1] is False
