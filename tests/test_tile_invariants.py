"""Static invariants of the kernel tiling and phase-gather planning."""

import numpy as np
import pytest

from vvc_mip_gpu_tpu.constants import PRED_MODES
from vvc_mip_gpu_tpu.models.cost_engine import (
    _group_stride, gather_strides)
from vvc_mip_gpu_tpu.ops.geometry import class_plans, padded_extent
from vvc_mip_gpu_tpu.ops.pallas.distortion import (
    _grouped_unrolled, default_cu_tile, fused_cu_tile)

RESOLUTIONS = [(416, 240), (832, 480), (1280, 720), (1920, 1080),
               (3840, 2160), (256, 128)]


@pytest.mark.parametrize("w,h", RESOLUTIONS)
def test_fused_tiles_are_lane_multiples_and_unroll_in_budget(w, h):
    for cplan in class_plans(w, h):
        s = cplan.shape
        two_m = 2 * PRED_MODES[s.size_id]
        tile = fused_cu_tile(s.width, s.height, two_m)
        assert tile % 128 == 0 and 128 <= tile <= 1024
        assert tile <= default_cu_tile(s.height, s.width) or tile == 128
        if _grouped_unrolled(s.height, s.width, two_m, True, tile):
            # unrolled footprint estimate stays inside the byte bound
            assert s.height * s.width * tile * 4 * two_m <= (8 << 20)


@pytest.mark.parametrize("w,h", RESOLUTIONS)
def test_phase_gather_plans_never_wrap(w, h):
    """Every phase-split group satisfies x0 + width <= stride (the
    no-wrap precondition of gather_*_phase) and the padded slab width
    divides every stride."""
    strides = gather_strides(w, h)
    hp, wp = padded_extent(w, h)
    wp += (-wp) % max(strides, default=1)
    n_phase = n_fallback = 0
    for cplan in class_plans(w, h):
        for gp in cplan.groups:
            stride = _group_stride(gp)
            if stride is None:
                n_fallback += 1
                continue
            n_phase += 1
            assert stride in strides
            assert gp.x_prog[0] + gp.width <= stride
            assert wp % stride == 0
            # lattice columns fit inside the phase-split minor axis
            assert gp.n_cols <= wp // stride
    # the phase path must carry the overwhelming majority of groups
    assert n_phase >= 4 * max(n_fallback, 1)


@pytest.mark.parametrize("w,h", [(416, 240), (608, 192), (1920, 1080)])
def test_pallas_engine_traces_all_resolutions(w, h):
    """The full pallas engine branch (fetch_rows plans, augmented
    matrices) must TRACE at partial-CTU and production resolutions —
    catches lattice shape mismatches without executing kernels."""
    import jax
    import jax.numpy as jnp

    from vvc_mip_gpu_tpu.models import cost_engine as ce

    old = ce._PALLAS_OVERRIDE
    ce._PALLAS_OVERRIDE = True
    try:
        for mp in (True, False):
            jax.eval_shape(
                lambda f, _mp=mp: ce._compute(f, f, width=w, height=h,
                                              max_performance=_mp),
                jax.ShapeDtypeStruct((h, w), jnp.int32))
    finally:
        ce._PALLAS_OVERRIDE = old
