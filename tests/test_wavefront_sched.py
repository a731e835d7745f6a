"""Wavefront schedule causality: every causally-valid SS displacement must
point at blocks finished in earlier topological levels, so the scan order can
reproduce the reference's sequential z-order SS semantics
(TEncCu.cpp:870-880 per-CU SS-ref update)."""
import numpy as np

from hevc_hop_tpu.entropy import native
from hevc_hop_tpu.models import wavefront


def _valid_mask(x, y, zcur, zplane, n, r, w, h):
    """Brute-force causal validity: displacement (dy, dx) is valid iff the
    whole n x n target window is in-frame and every 4x4 unit it covers is
    z-earlier than the current block (isValidPattern analog)."""
    mask = np.zeros((2 * r + 1, 2 * r + 1), bool)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            tx, ty = x + dx, y + dy
            if tx < 0 or ty < 0 or tx + n > w or ty + n > h:
                continue
            zwin = zplane[ty // 4:(ty + n + 3) // 4, tx // 4:(tx + n + 3) // 4]
            mask[r + dy, r + dx] = zwin.max() < zcur
    return mask


def test_wavefront_consistency():
    w = h = 64
    ctb_log2 = 5
    zplane = wavefront.zaddr4_plane(w, h, ctb_log2)
    depth8 = np.full((h // 8, w // 8), 2, np.uint8)
    blocks = wavefront.leaves_from_depth(depth8, w, h, ctb_log2)
    arr = np.array(blocks, np.int32)
    levels = native.wavefront_levels(arr[:, 0], arr[:, 1], arr[:, 2],
                                     w, h, ctb_log2, ss_range=16)
    level_px = np.zeros((h, w), np.int32)
    for (x, y, log2), lv in zip(blocks, levels):
        level_px[y:y + 8, x:x + 8] = lv
    n, r = 8, 16
    for (x, y, _), lv in list(zip(blocks, levels))[::7]:
        zcur = zplane[y // 4, x // 4]
        mask = _valid_mask(x, y, zcur, zplane, n, r, w, h)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if mask[r + dy, r + dx]:
                    tgt = level_px[y + dy:y + dy + n, x + dx:x + dx + n]
                    assert tgt.max() < lv, (x, y, dx, dy)
