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
                ref_frame: np.ndarray | None = None) -> dict:
    """All intermediates of one (CTU, size group): complete and reduced
    boundaries, reduced predictions for every mode, and (for SizeId > 0)
    the upsampled predictions."""
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
