"""Filter family: JAX implementation vs NumPy golden, plus hand-computed
edge/corner spot checks of the renormalization rules."""

import numpy as np
import pytest

from vvc_mip_gpu_tpu.constants import AVAILABLE_FILTERS
from vvc_mip_gpu_tpu.golden import filters_golden as fg
from vvc_mip_gpu_tpu.ops import filters as jf

RNG = np.random.default_rng(21)
FRAME = RNG.integers(0, 1024, size=(96, 160), dtype=np.int64)


@pytest.mark.parametrize("ftype", AVAILABLE_FILTERS)
def test_jax_matches_golden(ftype):
    n_kernels = 3 if "5x5" in ftype else 5
    for kidx in range(n_kernels):
        exp = fg.filter_frame(FRAME, ftype, kidx)
        got = np.asarray(jf.filter_frame(FRAME, ftype, kidx), np.int64)
        np.testing.assert_array_equal(got, exp, err_msg=f"{ftype}[{kidx}]")


def test_2d_int_interior_and_corner_by_hand():
    f = FRAME
    k = fg.CONV_KERNELS_3x3[1]  # [[1,2,1],[2,3,2],[1,2,1]], sum 15
    out = fg.filter_frame(f, "filterFrame_2d_int_quarterCtu", 1)
    # Interior pixel (5, 7)
    acc = sum(int(k[1 + dy, 1 + dx]) * int(f[5 + dy, 7 + dx])
              for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    assert out[5, 7] == (acc + 15 // 2) // 15
    # Top-left corner: only the 2x2 lower-right quadrant is valid
    acc = (int(k[1, 1]) * int(f[0, 0]) + int(k[1, 2]) * int(f[0, 1])
           + int(k[2, 1]) * int(f[1, 0]) + int(k[2, 2]) * int(f[1, 1]))
    scale = int(k[1, 1] + k[1, 2] + k[2, 1] + k[2, 2])  # 3+2+2+1 = 8
    assert out[0, 0] == (acc + scale // 2) // scale


def test_1d_int_corner_by_hand():
    f = FRAME
    k = fg.CONV_KERNELS_3x3[1][0]  # row 0: [1, 2, 1]
    out = fg.filter_frame(f, "filterFrame_1d_int", 1)
    # Top-left corner: separable accumulate with zero padding,
    # cornerScale = k0 + 2*k1 + k1^2 = 1 + 4 + 4 = 9
    h0 = 2 * int(f[0, 0]) + int(f[0, 1])   # horizontal at (0,0)
    h1 = 2 * int(f[1, 0]) + int(f[1, 1])   # horizontal at (1,0)
    acc = 2 * h0 + h1                      # vertical at (0,0)
    assert out[0, 0] == (acc + 9 // 2) // 9


def test_1d_5x5_uses_2d_scale():
    """The 5x5 separable variant divides by the 2D kernel's valid sum —
    e.g. kernel V1 sums to 29 in the interior while the separable
    accumulation weighs 25 (reference: intra.cl:3516-3552)."""
    f = FRAME
    out = fg.filter_frame(f, "filterFrame_1d_int_5x5", 1)
    y, x = 10, 10
    hrows = [sum(int(f[y + dy, x + dx]) for dx in range(-2, 3))
             for dy in range(-2, 3)]
    acc = sum(hrows)  # row-0 coefficients are all 1 for V1
    assert out[y, x] == (acc + 29 // 2) // 29


def test_float_round_half_away():
    # Constant frame: every filter must return the same constant
    # (acc/scale == value exactly, round() is exact).
    f = np.full((64, 64), 700, np.int64)
    for ftype in AVAILABLE_FILTERS:
        got = fg.filter_frame(f, ftype, 0)
        assert (got == 700).all(), ftype


def test_invalid_args():
    with pytest.raises(ValueError):
        jf.filter_frame(FRAME, "no_such_filter")
    with pytest.raises(ValueError):
        jf.filter_frame(FRAME, "filterFrame_1d_int_5x5", 4)


def test_filter_frames_batched_matches_single():
    """The batched device path (cli production path) must equal the
    per-frame reference path for every filter family."""
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 1024, size=(3, 32, 48), dtype=np.int64)
    for ftype in ("filterFrame_2d_int_quarterCtu",
                  "filterFrame_1d_float_5x5"):
        got = np.asarray(jf.filter_frames(frames, ftype, 1))
        exp = np.stack([np.asarray(jf.filter_frame(f, ftype, 1))
                        for f in frames])
        np.testing.assert_array_equal(got, exp)
