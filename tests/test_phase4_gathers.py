"""The %4-major phase pipeline (phase_split4 + phase4 gathers + the
fetch_rows Pallas relayout kernel) must reproduce the raster XLA gathers
exactly, for every uniform group of every class."""

import numpy as np
import pytest

import jax.numpy as jnp

from vvc_mip_gpu_tpu.constants import num_ctus
from vvc_mip_gpu_tpu.models.cost_engine import (
    _gather_group_phase4,
    _group_stride,
    _pad_edge,
    gather_strides,
)
from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
from vvc_mip_gpu_tpu.ops.geometry import class_plans, padded_extent
from vvc_mip_gpu_tpu.ops.pallas.distortion import _mod4_major

W, H = 256, 192  # partial bottom CTU row
RNG = np.random.default_rng(17)
FRAME = RNG.integers(0, 1024, size=(H, W), dtype=np.int16)


def _setup():
    frame = jnp.asarray(FRAME)
    hp, wp = padded_extent(W, H)
    w_eff = num_ctus(W, H)[0] * 128
    frame_pad = _pad_edge(frame, hp, wp)
    halo_pad = _pad_edge(frame[:1], 1, wp)
    ref_ext_pad = jnp.concatenate([halo_pad, frame_pad], axis=0)
    ref_pad = jnp.concatenate([ref_ext_pad[:, :1], ref_ext_pad], axis=1)
    strides = gather_strides(W, H)
    f_frame = {s: soa.phase_split4(frame_pad[:, :w_eff], s,
                                   pad_lanes=True, pad_rows=8)
               for s in strides}
    f_slab = {s: soa.phase_split4(ref_ext_pad[:, :w_eff], s)
              for s in strides}
    return frame_pad, ref_pad, f_frame, f_slab


def test_phase_split4_semantics():
    a = jnp.asarray(RNG.integers(0, 1024, (8, 64)), jnp.int16)
    for s in (4, 8, 16):
        f4 = np.asarray(soa.phase_split4(a, s))
        an = np.asarray(a)
        for p in range(s):
            np.testing.assert_array_equal(
                f4[soa.phase4_pos(p, s)], an[:, p::s])


# The pallas variant runs fetch_rows in interpret mode over every
# uniform group — minutes on one core; tiered heavy, XLA path is smoke.
@pytest.mark.parametrize("use_pallas", [
    False,
    pytest.param(True, marks=pytest.mark.heavy),
])
def test_phase4_groups_match_raster(use_pallas):
    """Every uniform group: phase4 (ref_t, ref_l, orig) == the raster
    XLA gathers, modulo the documented static sample orders.  With
    use_pallas the ref_l/orig come from fetch_rows in interpret mode."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    frame_pad, ref_pad, f_frame, f_ref = _setup()
    old = ce._PALLAS_INTERPRET
    ce._PALLAS_INTERPRET = use_pallas
    try:
        for cplan in class_plans(W, H):
            shape = cplan.shape
            w, h = shape.width, shape.height
            mode_minor = use_pallas and shape.size_id < 2
            for gp in cplan.groups:
                if _group_stride(gp) is None:
                    continue
                st = _group_stride(gp)
                rt, rl, og = _gather_group_phase4(
                    f_frame[st], f_ref[st], f_frame[st],
                    gp, True, use_pallas=use_pallas,
                    mode_minor=mode_minor, row_perm=None)
                # raster truth from the padded-frame gathers
                rt0, rl0 = soa.gather_boundaries(ref_pad, gp, True)
                og0 = soa.gather_originals(frame_pad, gp)
                if use_pallas and w > 4:
                    rt0 = rt0[np.asarray(_mod4_major(w))]
                np.testing.assert_array_equal(
                    np.asarray(rt), np.asarray(rt0),
                    err_msg=f"{w}x{h} g{gp.group_index} ref_t")
                np.testing.assert_array_equal(
                    np.asarray(rl), np.asarray(rl0),
                    err_msg=f"{w}x{h} g{gp.group_index} ref_l")
                og0 = np.asarray(og0).reshape(h, w, -1)
                if mode_minor:
                    exp = og0.transpose(1, 0, 2)  # x-major
                    if w > 4:
                        exp = exp[np.asarray(_mod4_major(w))]
                    exp = exp.reshape(h * w, -1)
                elif use_pallas:
                    exp = og0[:, np.asarray(_mod4_major(w))].reshape(
                        h * w, -1)
                else:
                    exp = og0.reshape(h * w, -1)
                np.testing.assert_array_equal(
                    np.asarray(og), exp,
                    err_msg=f"{w}x{h} g{gp.group_index} orig")
    finally:
        ce._PALLAS_INTERPRET = old


def test_fetch_rows_over_budget_raises_valueerror():
    """The single-buffer fallback must ALSO be budget-checked: an
    over-VMEM geometry has to surface as ValueError (which lets
    _gather_group_phase4 fall back to the XLA gather) instead of a
    Mosaic compile failure (ADVICE r2)."""
    import jax
    import numpy as np
    import pytest

    from vvc_mip_gpu_tpu.ops.pallas.gather import _rows_per_step, fetch_rows

    # Directly: a geometry whose k = n_r fallback scratch exceeds 6 MB.
    with pytest.raises(ValueError, match="VMEM budget"):
        # p=4 phases, n_r=1001 rows (not divisible by 8 -> no k fits),
        # sy=64, c=128 lanes: 4*1001*64*128*2 B = 62 MB >> budget.
        _rows_per_step(1001, 4, 64, 8, 128)

    # And end-to-end through fetch_rows' eager validation.
    f4 = jax.ShapeDtypeStruct((4, 70000, 128), np.int16)
    with pytest.raises(ValueError):
        fetch_rows(jax.numpy.zeros(f4.shape, f4.dtype),
                   runs=((0, 4),), oy=0, sy=64, h=8, n_r=1001,
                   c_log=100, interpret=True)
