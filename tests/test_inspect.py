"""Inspection API sanity: intermediates agree with the scalar oracle."""

import io

import numpy as np

from vvc_mip_gpu_tpu.constants import GROUPS
from vvc_mip_gpu_tpu.golden import scalar_oracle as so
from vvc_mip_gpu_tpu.models.inspect import inspect_ctu, report_target_ctu

RNG = np.random.default_rng(9)
FRAME = RNG.integers(0, 1024, size=(256, 256), dtype=np.int64)


def test_inspect_boundaries_and_prediction():
    out = inspect_ctu(FRAME, ctu_idx=3, group_idx=6)  # AL_16x16
    g = GROUPS[6]
    assert out["reduced_prediction"].shape == (
        g.cus_per_ctu, g.total_modes, 8, 8)
    x, y = out["positions"][5]
    np.testing.assert_array_equal(
        out["ref_t"][5], so.top_boundary(FRAME, int(x), int(y), 16))
    np.testing.assert_array_equal(
        out["red_l"][5], so.reduce_boundary(
            so.left_boundary(FRAME, int(x), int(y), 16), 4))
    pred = so.reduced_prediction(
        so.reduce_boundary(so.top_boundary(FRAME, int(x), int(y), 16), 4),
        so.reduce_boundary(so.left_boundary(FRAME, int(x), int(y), 16), 4),
        2, 3, False)
    np.testing.assert_array_equal(out["reduced_prediction"][5, 3], pred)


def test_report_target_ctu():
    msh = np.arange(2 * 97840).reshape(2, 97840)
    buf = io.StringIO()
    report_target_ctu(msh, 256, 1, file=buf)
    text = buf.getvalue()
    assert "CTU 1 @ (128,0)" in text
    assert text.count("\n") == 2 + 97840
    assert "ALL_AL_64x64,0,0,-,-,97840" in text
