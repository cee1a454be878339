"""Decisions-log CSV export in the reference engine's exact schema.

Schema (reference: main_aux_functions.h:735-798):
    CTU,cuSizeName,W,H,CU,X,Y,Mode,SAD,SATD,minSadHad
rows ordered CTU-major, then size group (SizeId2 groups, SizeId1, SizeId0),
then CU raster index, then mode (non-transposed first).  cuSizeName is
"ALL_" + the group name (main_aux_functions.h:296-399).

At 1080p this is ~13.2M rows per frame; the row-invariant columns are
prebuilt once as numpy arrays and the file is written with pandas' C writer
(or the native C extension when built).  With ``max_performance`` (the
reference's MAX_PERFORMANCE_DIST=1 default) SAD/SATD columns are emitted as
zeros, mirroring the reference's never-read-back buffers
(main_aux_functions.h:591-619).
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

from vvc_mip_gpu_tpu.constants import (
    CTU_SIZE,
    GROUPS,
    STRIDED_DISTORTIONS_PER_CTU,
    num_ctus,
)

DIST_PER_CTU = int(STRIDED_DISTORTIONS_PER_CTU[-1])


@functools.cache
def _per_ctu_columns():
    """Row-invariant per-CTU-slab columns, each [DIST_PER_CTU]."""
    names = np.empty(DIST_PER_CTU, object)
    w = np.empty(DIST_PER_CTU, np.int32)
    h = np.empty(DIST_PER_CTU, np.int32)
    cu = np.empty(DIST_PER_CTU, np.int32)
    x_in_ctu = np.empty(DIST_PER_CTU, np.int32)
    y_in_ctu = np.empty(DIST_PER_CTU, np.int32)
    mode = np.empty(DIST_PER_CTU, np.int32)
    for g in GROUPS:
        start = int(STRIDED_DISTORTIONS_PER_CTU[g.index])
        n, m = g.cus_per_ctu, g.total_modes
        sl = slice(start, start + n * m)
        names[sl] = "ALL_" + g.name
        w[sl] = g.width
        h[sl] = g.height
        cu[sl] = np.repeat(np.arange(n), m)
        pos = g.positions()
        x_in_ctu[sl] = np.repeat(pos[:, 0], m)
        y_in_ctu[sl] = np.repeat(pos[:, 1], m)
        mode[sl] = np.tile(np.arange(m), n)
    return names, w, h, cu, x_in_ctu, y_in_ctu, mode


@functools.cache
def _prefix_table() -> bytes:
    """Per-slab-row "<name>,<W>,<H>,<cu>\\t<mode>" strings for the native
    writer, newline-separated."""
    names, w, h, cu, _, _, mode = _per_ctu_columns()
    rows = [f"{names[i]},{w[i]},{h[i]},{cu[i]}\t{mode[i]}"
            for i in range(DIST_PER_CTU)]
    return ("\n".join(rows) + "\n").encode()


def export_decisions_csv(path: str | Path, min_sad_had: np.ndarray,
                         frame_width: int, sad: np.ndarray | None = None,
                         satd: np.ndarray | None = None,
                         poc: int | None = None) -> None:
    """Write the decisions log for one frame.

    min_sad_had / sad / satd: [nCTU, DIST_PER_CTU] in the strided layout
    (FrameCosts fields).  ``poc`` adds the multi-frame POC column variant
    (reference: main_aux_functions.h:843-906).  Uses the native C writer
    when built (native/io_ext.c); otherwise pandas.
    """
    import pandas as pd

    min_sad_had = np.asarray(min_sad_had)
    n_ctu = min_sad_had.shape[0]
    ctu_cols = -(-frame_width // CTU_SIZE)
    names, w, h, cu, x_in, y_in, mode = _per_ctu_columns()

    try:
        from vvc_mip_gpu_tpu.io import native

        zero_costs = sad is None and satd is None
        hdr = "CTU,cuSizeName,W,H,CU,X,Y,Mode,SAD,SATD,minSadHad\n"
        if poc is not None:
            hdr = "POC," + hdr
        # zero_costs: the writer never reads the SAD/SATD buffers (emits
        # literal 0,0) — min_sad_had stands in as placeholder.  When
        # exactly ONE of sad/satd is provided, the missing column must
        # be real zeros (matching the pandas fallback), NOT the
        # placeholder.
        zeros = (None if zero_costs or (sad is not None
                                        and satd is not None)
                 else np.zeros_like(min_sad_had, np.int64))
        native.write_decisions_csv(
            str(path), hdr, _prefix_table(), x_in, y_in,
            min_sad_had if zero_costs else (zeros if sad is None
                                            else sad),
            min_sad_had if zero_costs else (zeros if satd is None
                                            else satd),
            min_sad_had, n_ctu, ctu_cols, CTU_SIZE,
            zero_costs=zero_costs, poc=-1 if poc is None else int(poc))
        return
    except ImportError:
        pass

    ctu = np.repeat(np.arange(n_ctu, dtype=np.int32), DIST_PER_CTU)
    ctu_x = (np.arange(n_ctu, dtype=np.int32) % ctu_cols) * CTU_SIZE
    ctu_y = (np.arange(n_ctu, dtype=np.int32) // ctu_cols) * CTU_SIZE
    cols = {
        "CTU": ctu,
        "cuSizeName": np.tile(names, n_ctu),
        "W": np.tile(w, n_ctu),
        "H": np.tile(h, n_ctu),
        "CU": np.tile(cu, n_ctu),
        "X": (ctu_x[:, None] + x_in[None, :]).ravel(),
        "Y": (ctu_y[:, None] + y_in[None, :]).ravel(),
        "Mode": np.tile(mode, n_ctu),
        "SAD": (np.zeros(n_ctu * DIST_PER_CTU, np.int64) if sad is None
                else np.asarray(sad, np.int64).ravel()),
        "SATD": (np.zeros(n_ctu * DIST_PER_CTU, np.int64) if satd is None
                 else np.asarray(satd, np.int64).ravel()),
        "minSadHad": np.asarray(min_sad_had, np.int64).ravel(),
    }
    if poc is not None:
        cols = {"POC": np.full(n_ctu * DIST_PER_CTU, poc, np.int32), **cols}
    pd.DataFrame(cols).to_csv(path, index=False)


def export_target_ctu_csv(path: str | Path,
                          msh_per_frame: list[np.ndarray],
                          frame_width: int, target_ctu: int,
                          sad_per_frame: list[np.ndarray] | None = None,
                          satd_per_frame: list[np.ndarray] | None = None,
                          pocs: list[int] | None = None) -> None:
    """One TARGET CTU across ALL frames in a single POC-columned CSV —
    the reference's reportTargetDistortionValues_File
    (main_aux_functions.h:843-906): header
    POC,CTU,cuSizeName,W,H,CU,X,Y,Mode,SAD,SATD,minSadHad, frames outer,
    then the same group/CU/mode row order as the per-frame decisions log,
    with absolute CU positions (CTU base + in-CTU offset).

    ``msh_per_frame``: one [DIST_PER_CTU] slab (the target CTU's row of
    FrameCosts.min_sad_had) per frame.  SAD/SATD default to zeros,
    mirroring the reference's MAX_PERFORMANCE_DIST never-read-back
    buffers (main_aux_functions.h:591-619).
    """
    import pandas as pd

    n_frames = len(msh_per_frame)
    if pocs is None:
        pocs = list(range(n_frames))
    names, w, h, cu, x_in, y_in, mode = _per_ctu_columns()
    ctu_cols = -(-frame_width // CTU_SIZE)
    ctu_x = (target_ctu % ctu_cols) * CTU_SIZE
    ctu_y = (target_ctu // ctu_cols) * CTU_SIZE
    zeros = np.zeros(DIST_PER_CTU, np.int64)

    def _slab(per_frame, f):
        if per_frame is None or per_frame[f] is None:
            return zeros
        return np.asarray(per_frame[f], np.int64).ravel()

    frames = []
    for f in range(n_frames):
        frames.append(pd.DataFrame({
            "POC": np.full(DIST_PER_CTU, pocs[f], np.int32),
            "CTU": np.full(DIST_PER_CTU, target_ctu, np.int32),
            "cuSizeName": names,
            "W": w, "H": h, "CU": cu,
            "X": ctu_x + x_in,
            "Y": ctu_y + y_in,
            "Mode": mode,
            "SAD": _slab(sad_per_frame, f),
            "SATD": _slab(satd_per_frame, f),
            "minSadHad": _slab(msh_per_frame, f),
        }))
    pd.concat(frames, ignore_index=True).to_csv(path, index=False)


def decide_best_modes(min_sad_had: np.ndarray):
    """Per-CU argmin over modes — the decision the reference leaves to the
    log consumer (SURVEY.md §0).  Returns {group_index: (best_mode, best
    cost)} arrays of shape [nCTU, cusPerCtu]."""
    out = {}
    n_ctu = min_sad_had.shape[0]
    for g in GROUPS:
        start = int(STRIDED_DISTORTIONS_PER_CTU[g.index])
        n, m = g.cus_per_ctu, g.total_modes
        block = np.asarray(
            min_sad_had[:, start:start + n * m]).reshape(n_ctu, n, m)
        out[g.index] = (block.argmin(-1), block.min(-1))
    return out
