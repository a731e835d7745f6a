"""MC interpolation filter unit tests vs a direct numpy model of the
reference's two-stage path (TComInterpolationFilter.cpp:174 filter<N>)."""
import numpy as np
import jax.numpy as jnp

from hevc_hop_tpu.ops import interp


def ref_filter_2d(window, ch, cv, out_n, bit_depth=8):
    """Scalar model of HM's hor-then-ver filtering."""
    t = len(ch)
    headroom = interp.IF_INTERNAL_PREC - bit_depth
    shift1 = interp.IF_FILTER_PREC - headroom
    off1 = -(interp.IF_INTERNAL_OFFS << shift1)
    shift2 = interp.IF_FILTER_PREC + headroom
    off2 = ((interp.IF_INTERNAL_OFFS << interp.IF_FILTER_PREC)
            + (1 << (shift2 - 1)))
    hh, ww = window.shape
    mid = np.zeros((hh, out_n), np.int64)
    for r in range(hh):
        for c in range(out_n):
            s = sum(int(ch[k]) * int(window[r, c + k]) for k in range(t))
            mid[r, c] = (s + off1) >> shift1
    out = np.zeros((out_n, out_n), np.int64)
    for r in range(out_n):
        for c in range(out_n):
            s = sum(int(cv[k]) * int(mid[r + k, c]) for k in range(t))
            out[r, c] = (s + off2) >> shift2
    return np.clip(out, 0, (1 << bit_depth) - 1)


def test_two_stage_identity_is_copy():
    rng = np.random.default_rng(0)
    n = 8
    win = rng.integers(0, 256, (4, n + 3, n + 3)).astype(np.int32)
    wh = np.tile(interp.CHROMA_FILTER[0], (4, 1))
    out = np.asarray(interp.filter_2d(jnp.asarray(win), jnp.asarray(wh),
                                      jnp.asarray(wh), n))
    np.testing.assert_array_equal(out, win[:, 1:1 + n, 1:1 + n])


def test_chroma_phases_vs_scalar_model():
    rng = np.random.default_rng(1)
    n = 8
    win = rng.integers(0, 256, (n + 3, n + 3)).astype(np.int32)
    for ph in range(8):
        for pv in range(8):
            ch = interp.CHROMA_FILTER[ph]
            cv = interp.CHROMA_FILTER[pv]
            got = np.asarray(interp.filter_2d(
                jnp.asarray(win[None]), jnp.asarray(ch[None]),
                jnp.asarray(cv[None]), n))[0]
            want = ref_filter_2d(win, ch, cv, n)
            np.testing.assert_array_equal(got, want, err_msg=f"{ph},{pv}")


def test_luma_quarter_phases_vs_scalar_model():
    rng = np.random.default_rng(2)
    n = 8
    win = rng.integers(0, 256, (n + 7, n + 7)).astype(np.int32)
    for ph in range(4):
        for pv in range(4):
            ch = interp.LUMA_FILTER[ph]
            cv = interp.LUMA_FILTER[pv]
            got = np.asarray(interp.filter_2d(
                jnp.asarray(win[None]), jnp.asarray(ch[None]),
                jnp.asarray(cv[None]), n))[0]
            want = ref_filter_2d(win, ch, cv, n)
            np.testing.assert_array_equal(got, want, err_msg=f"{ph},{pv}")


def test_main10_shifts():
    rng = np.random.default_rng(3)
    n = 4
    win = rng.integers(0, 1024, (n + 7, n + 7)).astype(np.int32)
    ch = interp.LUMA_FILTER[2]
    got = np.asarray(interp.filter_2d(
        jnp.asarray(win[None]), jnp.asarray(ch[None]),
        jnp.asarray(ch[None]), n, bit_depth=10))[0]
    want = ref_filter_2d(win, ch, ch, n, bit_depth=10)
    np.testing.assert_array_equal(got, want)
