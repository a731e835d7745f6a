"""ISS (self-similarity) slice-data syntax round-trip fuzz: intra + inter
CUs with merge/skip/AMVP/GT vectors through the native codec."""
import random

import numpy as np

from hevc_hop_tpu.entropy import ctx_layout, native


def _rand_coefs(rng, n, density=0.15):
    c = np.zeros((n, n), np.int16)
    for _ in range(max(1, int(n * n * density))):
        c[rng.randrange(n), rng.randrange(n)] = rng.randrange(-80, 81) or 1
    return c


def test_iss_slice_roundtrip_fuzz():
    rng = random.Random(77)
    w, h = 96, 64
    for trial in range(8):
        maps = native.SliceMaps(w, h, ctb_log2=5)
        maps.slice_type = 3  # ISS
        maps.mi_size = 13
        for cy in range(0, h, 32):
            for cx in range(0, w, 32):
                d = rng.choice([0, 1, 1, 2])
                maps.depth8[cy // 8:(cy + 32) // 8,
                            cx // 8:(cx + 32) // 8] = d
                cu = 32 >> d
                for y in range(cy, cy + 32, cu):
                    for x in range(cx, cx + 32, cu):
                        maps.tu4[y // 4:(y + cu) // 4,
                                 x // 4:(x + cu) // 4] = (
                            5 - d)
                        is_inter = rng.random() < 0.6
                        has_resi = rng.random() < 0.6
                        if is_inter:
                            maps.pred4[y // 4:(y + cu) // 4,
                                       x // 4:(x + cu) // 4] = 0
                            maps.mode4[y // 4:(y + cu) // 4,
                                       x // 4:(x + cu) // 4] = 1
                            maps.cmode8[y // 8:(y + cu) // 8,
                                        x // 8:(x + cu) // 8] = 36
                            mvx = rng.randrange(-40, 1) * 4
                            mvy = rng.randrange(-40, 1) * 4
                            maps.mv4x[y // 4:(y + cu) // 4,
                                      x // 4:(x + cu) // 4] = mvx
                            maps.mv4y[y // 4:(y + cu) // 4,
                                      x // 4:(x + cu) // 4] = mvy
                            if rng.random() < 0.3:
                                maps.gt8[y // 8, x // 8] = 1
                                for k in range(6):
                                    maps.gtv8[y // 8, x // 8, k] = (
                                        rng.randrange(-4, 5))
                        else:
                            maps.mode4[y // 4:(y + cu) // 4,
                                       x // 4:(x + cu) // 4] = (
                                rng.randrange(35))
                        if has_resi or not is_inter:
                            c = _rand_coefs(rng, cu)
                            maps.coef_y[y:y + cu, x:x + cu] = c
                            maps.cbf4_y[y // 4:(y + cu) // 4,
                                        x // 4:(x + cu) // 4] = (
                                np.abs(c).max() > 0)
                        if rng.random() < 0.4:
                            cc = _rand_coefs(rng, cu // 2)
                            maps.coef_cb[y // 2:(y + cu) // 2,
                                         x // 2:(x + cu) // 2] = cc
                            maps.cbf8_cb[y // 8:(y + cu) // 8,
                                         x // 8:(x + cu) // 8] = (
                                np.abs(cc).max() > 0)

        states = ctx_layout.init_states(3, 30)  # ISS init set
        payload = native.encode_slice_data_ss(states, maps)
        dec = native.decode_slice_data_ss(states, payload, w, h, 5, 0, 3, 13)

        for name in ("depth8", "tu4", "pred4", "mode4", "cbf4_y",
                     "coef_y", "coef_cb", "cbf8_cb", "skip8", "gt8"):
            np.testing.assert_array_equal(
                getattr(dec, name), getattr(maps, name),
                err_msg=f"trial {trial}: {name}")
        # MV maps compare only on inter units
        im = maps.pred4 == 0
        np.testing.assert_array_equal(dec.mv4x[im], maps.mv4x[im],
                                      err_msg=f"trial {trial}: mv4x")
        np.testing.assert_array_equal(dec.mv4y[im], maps.mv4y[im],
                                      err_msg=f"trial {trial}: mv4y")
        gm = maps.gt8 != 0
        np.testing.assert_array_equal(dec.gtv8[gm], maps.gtv8[gm],
                                      err_msg=f"trial {trial}: gtv8")


def test_merge_amvp_probe():
    """Merge/AMVP structural sanity (incl. micro-image candidates)."""
    w = h = 64
    u4w, u4h = w // 4, h // 4
    pred4 = np.ones((u4h, u4w), np.uint8)
    mv4x = np.zeros((u4h, u4w), np.int16)
    mv4y = np.zeros((u4h, u4w), np.int16)
    # left neighbor CU (0..7, 8..15) inter with mv (-16, -4) qpel
    pred4[2:4, 0:2] = 0
    mv4x[2:4, 0:2] = -64
    mv4y[2:4, 0:2] = -16
    mrg, amvp = native.probe_merge_amvp(w, h, 5, 3, 13, pred4, mv4x, mv4y,
                                        8, 8, 8)
    assert list(mrg[0]) == [-64, -16, 0]         # A1 = left (ref 0 = SS)
    # MI-left candidate: -ceil(8/13)*13 = -13 full-pel -> -52 qpel
    assert [-52, 0, 0] in mrg.tolist()
    assert list(amvp[0]) == [-64, -16]           # left AMVP
    # MI co-located candidate fills the free AMVP slot when the target is
    # the SS ref (fillMvpCand MI chain, TComDataCU.cpp:3783-3800)
    assert list(amvp[1]) == [-52, 0]
