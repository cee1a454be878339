"""Inspection API: readbacks of pipeline intermediates for debugging.

Analog of the reference's debug/report switches and readback helpers
(reference: main.cpp:620-628 enableTerminalReport/reportReducedBoundaries/
reportCompleteBoundaries/reportReducedPrediction/reportDistortion with
targetCTU; main_aux_functions.h:405-688 readMemobjsIntoArray_*).  The TPU
engine never materializes these intermediates in HBM (they live inside the
fused kernels), so inspection recomputes them with the NumPy golden model —
bit-identical by the test suite — for the requested CTU only.
"""

from __future__ import annotations

import numpy as np

from vvc_mip_gpu_tpu.constants import (
    CTU_SIZE,
    GROUPS,
    STRIDED_DISTORTIONS_PER_CTU,
    num_ctus,
)
from vvc_mip_gpu_tpu.golden import reference_model as gm


def inspect_ctu(frame: np.ndarray, ctu_idx: int, group_idx: int,
                ref_frame: np.ndarray | None = None,
                from_engine: bool = False) -> dict:
    """All intermediates of one (CTU, size group): complete and reduced
    boundaries, reduced predictions for every mode, and (for SizeId > 0)
    the upsampled predictions.

    ``from_engine=False`` (default) recomputes with the NumPy golden
    model.  ``from_engine=True`` returns ACTUAL device intermediates: the
    engine's SoA pipeline (same gathers, limb-split bf16 MXU prediction
    and interpolation algebra as the fused kernels) jitted on the active
    backend — so a device-only numeric divergence (e.g. the bf16
    truncation class of bug, tests/test_tpu_bit_exact.py:1-13) is
    localizable per stage by diffing the two modes.  Analog of the
    reference's readMemobjsIntoArray_* device readbacks
    (main_aux_functions.h:405-688).
    """
    if from_engine:
        return _inspect_ctu_engine(frame, ctu_idx, group_idx, ref_frame)
    if ref_frame is None:
        ref_frame = frame
    g = GROUPS[group_idx]
    fh, fw = frame.shape
    xs, ys = gm.global_positions(group_idx, fw, fh)
    xs, ys = xs[ctu_idx], ys[ctu_idx]
    ref_t, ref_l = gm.extract_boundaries(
        np.asarray(ref_frame, np.int64), xs, ys, g.width, g.height)
    red_t = gm.reduce_boundary(ref_t, g.boundary_size)
    red_l = gm.reduce_boundary(ref_l, g.boundary_size)
    pred = gm.reduced_prediction_all_modes(red_t, red_l, g.size_id)
    out = {
        "group": g.name,
        "positions": np.stack([xs, ys], axis=1),
        "ref_t": ref_t, "ref_l": ref_l,
        "red_t": red_t, "red_l": red_l,
        "reduced_prediction": pred,
    }
    if g.size_id > 0:
        out["upsampled_prediction"] = gm.upsample_all(
            pred, ref_t, ref_l, g.width, g.height)
    return out


def _inspect_ctu_engine(frame, ctu_idx: int, group_idx: int,
                        ref_frame=None) -> dict:
    """Device-side intermediates: runs the engine's jitted SoA pipeline
    (gathers, boundary reduce, two-limb bf16 MXU prediction, exact
    interpolation upsample) on the ACTIVE backend and returns the
    requested CTU's tensors, keys matching the golden-mode dict."""
    import functools

    import jax
    import jax.numpy as jnp

    from vvc_mip_gpu_tpu.models.cost_engine import _pad_edge
    from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
    from vvc_mip_gpu_tpu.ops.geometry import _group_plan, padded_extent

    if ref_frame is None:
        ref_frame = frame
    frame = np.asarray(frame)
    fh, fw = frame.shape
    g = GROUPS[group_idx]
    gp = _group_plan(group_idx, fw, fh)

    @functools.partial(jax.jit, static_argnums=())
    def stages(fr, ref):
        fr = fr.astype(jnp.int16)
        ref = ref.astype(jnp.int16)
        hp, wp = padded_extent(fw, fh)
        frame_pad = _pad_edge(fr, hp, wp)
        ref_ext = jnp.concatenate([ref[:1], ref], axis=0)
        ref_ext_pad = _pad_edge(ref_ext.astype(jnp.int16), hp + 1, wp)
        ref_pad = jnp.concatenate([ref_ext_pad[:, :1], ref_ext_pad],
                                  axis=1)
        ref_t, ref_l = soa.gather_boundaries(ref_pad, gp, True)
        orig = soa.gather_originals(frame_pad, gp)
        red_t = soa.reduce_boundary(ref_t, g.boundary_size)
        red_l = soa.reduce_boundary(ref_l, g.boundary_size)
        pred = soa.reduced_prediction_all_modes(red_t, red_l, g.size_id)
        out = {"ref_t": ref_t, "ref_l": ref_l, "red_t": red_t,
               "red_l": red_l, "reduced_prediction": pred, "orig": orig}
        if g.size_id > 0:
            out["upsampled_prediction"] = soa.upsample_all(
                pred, ref_t, ref_l, g.width, g.height,
                g.reduced_pred_size)
        return out

    vals = jax.device_get(stages(jnp.asarray(frame, jnp.int32),
                                 jnp.asarray(ref_frame, jnp.int32)))

    def _ctu_rows(a, sample_shape):
        """[..., nCU] lattice tensor -> [cusPerCtu, *sample_shape] of the
        requested CTU (reference CTU-layout CU order)."""
        a = np.moveaxis(np.asarray(a, np.int64), -1, 0)
        a = a.reshape(gp.n_rows, gp.n_cols, *a.shape[1:])
        a = gp.to_ctu_layout(a)[ctu_idx]
        lead = a.shape[1:-1] if a.ndim > 2 else ()
        return a.reshape(a.shape[0], *lead, *sample_shape)

    from vvc_mip_gpu_tpu.constants import PRED_MODES

    r = g.reduced_pred_size
    two_m = 2 * PRED_MODES[g.size_id]
    out = {
        "group": g.name,
        "ref_t": _ctu_rows(vals["ref_t"], (g.width,)),
        "ref_l": _ctu_rows(vals["ref_l"], (g.height,)),
        "red_t": _ctu_rows(vals["red_t"], (g.boundary_size,)),
        "red_l": _ctu_rows(vals["red_l"], (g.boundary_size,)),
        "reduced_prediction": _ctu_rows(
            vals["reduced_prediction"], (r, r)),
    }
    if "upsampled_prediction" in vals:
        up = vals["upsampled_prediction"]  # [2M, h, w, nCU]
        up = np.moveaxis(np.asarray(up, np.int64), -1, 0)
        up = up.reshape(gp.n_rows, gp.n_cols, two_m, g.height, g.width)
        out["upsampled_prediction"] = gp.to_ctu_layout(up)[ctu_idx]
    return out


def report_target_ctu(min_sad_had: np.ndarray, frame_width: int,
                      ctu_idx: int, sad: np.ndarray | None = None,
                      satd: np.ndarray | None = None, file=None) -> None:
    """Print the distortion table of one CTU (analog of the reference's
    reportTargetDistortionValues_ALL, main_aux_functions.h:690-733)."""
    import sys

    file = file or sys.stdout
    ctu_cols = -(-frame_width // CTU_SIZE)
    ctu_x = (ctu_idx % ctu_cols) * CTU_SIZE
    ctu_y = (ctu_idx // ctu_cols) * CTU_SIZE
    print(f"=== DISTORTION, CTU {ctu_idx} @ ({ctu_x},{ctu_y}) ===", file=file)
    print("cuSizeName,CU,Mode,SAD,SATD,minSadHad", file=file)
    slab = np.asarray(min_sad_had[ctu_idx])
    sad_slab = None if sad is None else np.asarray(sad[ctu_idx])
    satd_slab = None if satd is None else np.asarray(satd[ctu_idx])
    for g in GROUPS:
        start = int(STRIDED_DISTORTIONS_PER_CTU[g.index])
        m = g.total_modes
        for cu in range(g.cus_per_ctu):
            for mode in range(m):
                i = start + cu * m + mode
                s = "-" if sad_slab is None else sad_slab[i]
                t = "-" if satd_slab is None else satd_slab[i]
                print(f"ALL_{g.name},{cu},{mode},{s},{t},{slab[i]}",
                      file=file)
