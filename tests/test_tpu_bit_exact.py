"""TPU-hardware bit-exactness regression test.

The CPU suite cannot catch TPU-only numerics: the TPU's default matmul
precision silently truncates f32 operands to bf16, which once broke the
(exact-integer-in-f32) reduced-prediction einsum on real hardware while
every CPU test stayed green.  This test runs the full engine on the real
TPU backend against the golden model with SMOOTH synthetic frames (the
bf16 truncation bug only shows on correlated content, not noise).

Deselected by default (pytest.ini); run in a TPU-attached environment:

    VVC_TPU_TESTS=1 pytest tests/test_tpu_bit_exact.py -m tpu
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    # Must not import jax before checking: conftest.py pins the regular
    # session to CPU.  This test only makes sense in a TPU session.
    import jax

    if jax.default_backend() in ("cpu",):
        pytest.skip("no TPU backend attached")
    return jax.default_backend()


def test_engine_bit_exact_on_tpu(tpu_backend):
    from vvc_mip_gpu_tpu.golden import reference_model as gm
    from vvc_mip_gpu_tpu.io import frames as fio
    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

    w, h = 416, 240
    frame = fio.synthetic_frames(1, w, h)[0].astype(np.int64)
    engine = MipCostEngine(w, h)
    got = engine(frame.astype(np.int32))
    exp = gm.frame_costs(frame)
    valid = np.asarray(got.valid)
    for field in ("sad", "satd", "min_sad_had"):
        e = gm.flatten_strided(exp, field)
        a = np.asarray(getattr(got, field), np.int64)
        mism = (e != a) & valid
        assert not mism.any(), (
            f"{field}: {int(mism.sum())} TPU mismatches vs golden")


def test_engine_max_performance_bit_exact_on_tpu(tpu_backend):
    # The max-performance regime takes a different kernel epilogue
    # (emit="msh_t": in-kernel min + transpose) and a different reorder.
    from vvc_mip_gpu_tpu.golden import reference_model as gm
    from vvc_mip_gpu_tpu.io import frames as fio
    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

    w, h = 416, 240
    frame = fio.synthetic_frames(1, w, h)[0].astype(np.int64)
    engine = MipCostEngine(w, h, max_performance=True)
    got = engine(frame.astype(np.int32))
    exp = gm.frame_costs(frame)
    valid = np.asarray(got.valid)
    e = gm.flatten_strided(exp, "min_sad_had")
    a = np.asarray(got.min_sad_had, np.int64)
    mism = (e != a) & valid
    assert not mism.any(), (
        f"min_sad_had: {int(mism.sum())} TPU mismatches vs golden")
