"""SoA (structure-of-arrays) MIP pipeline: the TPU-optimized compute path.

Same exact integer semantics as ops/mip_ops.py (validated against the golden
model by the same tests), but every tensor keeps the *CU axis last*.  On TPU
the last dimension maps to the 128-wide vector lanes and the second-to-last
to sublanes; the AoS layout's trailing sample dims (4/8/16 wide) forced up
to 8x tile-padding waste in both HBM and compute.  Here the lane axis is the
tens-of-thousands-wide batch of CUs, samples/modes live on sublanes, and all
interpolation/transform index arithmetic is static.

CU ordering inside these ops is *lattice order* (CTU-row-major x CU-row x
CTU-col x CU-col, per group, groups of a class concatenated); the engine
reorders final per-group cost blocks to the reference's [nCTU, cuIdx] layout
at the end (cheap: costs are 3 orders of magnitude smaller than samples).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vvc_mip_gpu_tpu import mip_weights
from vvc_mip_gpu_tpu.constants import (
    MIP_OFFSET_MATRIX,
    MIP_SHIFT_MATRIX,
    PRED_MODES,
    REDUCED_PRED_SIZE,
    SAMPLE_MAX,
    VALUE_DC,
)
from vvc_mip_gpu_tpu.ops.geometry import GroupPlan

_H4 = np.array(
    [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]], np.int32)
_H16 = np.kron(_H4, _H4)  # flattened two-sided 4x4 Hadamard; index 0 = DC


def _shift(prog, by: int):
    return None if prog is None else (prog[0] + by, prog[1])


def _row_strided(a, prog, idx, n: int):
    """Rows {idx_k} of [R, C] -> [n, C] (strided slice when uniform)."""
    if prog is not None:
        o, s = prog
        return jax.lax.slice(a, (o, 0), (o + (n - 1) * s + 1, a.shape[1]),
                             (s, 1))
    return jnp.take(a, idx, axis=0)


def _col_strided(a, prog, idx, n: int):
    """Columns {idx_k} of [R, C] -> [R, n]."""
    if prog is not None:
        o, s = prog
        return jax.lax.slice(a, (0, o), (a.shape[0], o + (n - 1) * s + 1),
                             (1, s))
    return jnp.take(a, idx, axis=1)


def _row_blocks(a, prog, idx, n: int, h: int):
    """Row windows {idx_k .. idx_k+h-1} of [R, C] -> [n, h, C].

    With a uniform lattice this is a contiguous slice + reshape (+ a trim
    when the lattice step exceeds the window); only the two interleaved
    8x8 groups fall back to a gather.
    """
    if prog is not None:
        o, s = prog
        if s == h or n == 1:
            blk = jax.lax.slice_in_dim(a, o, o + n * h, axis=0)
            return blk.reshape(n, h, a.shape[1])
        assert s >= h, f"overlapping lattice (stride {s} < window {h})"
        blk = jax.lax.slice_in_dim(a, o, o + n * s, axis=0)
        return blk.reshape(n, s, a.shape[1])[:, :h]
    ridx = (idx[:, None] + np.arange(h)[None, :]).ravel()
    return jnp.take(a, ridx, axis=0).reshape(n, h, a.shape[1])


def _col_blocks(a, prog, idx, n: int, w: int):
    """Column windows of [..., C] -> [..., n, w]."""
    lead = a.shape[:-1]
    if prog is not None:
        o, s = prog
        if s == w or n == 1:
            blk = jax.lax.slice_in_dim(a, o, o + n * w, axis=-1)
            return blk.reshape(*lead, n, w)
        assert s >= w, f"overlapping lattice (stride {s} < window {w})"
        blk = jax.lax.slice_in_dim(a, o, o + n * s, axis=-1)
        return blk.reshape(*lead, n, s)[..., :w]
    cidx = (idx[:, None] + np.arange(w)[None, :]).ravel()
    return jnp.take(a, cidx, axis=-1).reshape(*lead, n, w)


def phase_split(a, stride: int):
    """[R, C] -> [stride, R, C//stride] with F[p, y, j] = a[y, j*stride+p].

    The one deliberately lane-hostile relayout of the gather pipeline:
    every per-group gather below becomes minor-axis-preserving slices of
    these F tensors (built once per frame per distinct lattice stride),
    instead of 17 classes' worth of lane-crossing SoA transposes.
    """
    r, c = a.shape
    return jnp.transpose(a.reshape(r, c // stride, stride), (2, 0, 1))


def phase4_pos(p: int, stride: int) -> int:
    """Position of phase ``p`` in the %4-MAJOR phase order (see
    phase_split4)."""
    if stride <= 4:
        return p
    return (p % 4) * (stride // 4) + p // 4


def phase_split4(a, stride: int, pad_lanes: bool = False,
                 pad_rows: int = 0):
    """phase_split with the phase axis in %4-MAJOR order:
    F4[phase4_pos(p), y, j] = a[y, j*stride + p].

    Why: any CU window [x0, x0+w) with 4 | x0 and 4 | w then occupies
    exactly FOUR CONTIGUOUS RUNS of the phase axis (one per x%4 class,
    run q at phase4_pos(q*? ) = q*(stride//4) + x0//4, length w//4) — so
    the %4-grouped column order the fused distortion kernels want is a
    plain concat of slices (and a plain DMA box quartet in the Pallas
    relayout kernel), never a gather or in-register shuffle.

    ``pad_lanes``/``pad_rows``: edge padding for the fetch_rows DMA
    consumer — its HBM slices need a 128-multiple lane width and 8-row
    alignment slack.  XLA consumers slice the logical extents back out.
    """
    f = phase_split(a, stride)
    if stride > 4:
        f = f[np.asarray(_MOD4[stride])]
    c = f.shape[2]
    pc = (-c) % 128 if pad_lanes else 0
    if pc or pad_rows:
        f = jnp.pad(f, ((0, 0), (0, pad_rows), (0, pc)))
    return f


_MOD4 = {s: np.concatenate([np.arange(q, s, 4) for q in range(4)])
         for s in (8, 16, 32, 64, 128)}


def window_runs(x0: int, w: int, stride: int) -> list[tuple[int, int]]:
    """Contiguous (start, length) runs of the %4-major phase axis covering
    window phases [x0, x0+w) in %4-grouped column order."""
    if stride <= 4:
        return [(x0, w)]
    return [(q * (stride // 4) + x0 // 4, w // 4) for q in range(4)]


def _window_phases4(f4, x0: int, w: int, raster: bool = False):
    """[w, ...] slab of the %4-major F covering window [x0, x0+w).

    Default: %4-grouped phase order (a concat of contiguous slices —
    free).  ``raster=True`` restores raster phase order via a leading-axis
    take (CPU/XLA-fallback paths that want raster samples)."""
    s = f4.shape[0]
    if raster:
        pos = np.asarray([phase4_pos(x0 + k, s) for k in range(w)])
        return jnp.take(f4, pos, axis=0)
    runs = window_runs(x0, w, s)
    parts = [jax.lax.slice_in_dim(f4, st, st + ln, axis=0)
             for st, ln in runs]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _f_row_blocks(f, prog, idx, n: int, h: int):
    """Row windows of [P, R, C] phase planes -> [P, n, h, C]."""
    p, _, c = f.shape
    if prog is not None:
        o, s = prog
        if s == h or n == 1:
            blk = jax.lax.slice_in_dim(f, o, o + n * h, axis=1)
            return blk.reshape(p, n, h, c)
        assert s >= h, f"overlapping lattice (stride {s} < window {h})"
        blk = jax.lax.slice_in_dim(f, o, o + n * s, axis=1)
        return blk.reshape(p, n, s, c)[:, :, :h]
    ridx = (np.asarray(idx)[:, None] + np.arange(h)[None, :]).ravel()
    return jnp.take(f, ridx, axis=1).reshape(p, n, h, c)


def gather_originals_phase4(f4_frame, plan: GroupPlan,
                            row_perm=None, order: str = "yx"):
    """gather_originals via the %4-MAJOR phase-split frame F4.

    ``order``:
      * "yx" — sample rows (y, x): y raster (optionally ``row_perm``-ed),
        x %4-grouped (free: the window is 4 contiguous phase runs).
      * "xy" — sample rows (x, y): x %4-grouped major, y raster minor —
        the layout the mode-on-sublanes kernels index statically and the
        Pallas fetch_rows relayout kernel emits.
      * "raster" — plain raster both axes (CPU/test path; phase take).
    """
    w, h = plan.width, plan.height
    x0, _ = plan.x_prog
    fw = _window_phases4(f4_frame, x0, w, raster=order == "raster")
    tile = _f_row_blocks(fw, plan.y_prog, plan.ys, plan.n_rows, h)
    # [w, n_r, h, C]; C == n_cols up to DMA-alignment lane padding
    if tile.shape[-1] != plan.n_cols:
        tile = jax.lax.slice_in_dim(tile, 0, plan.n_cols, axis=3)
    n_cu = plan.n_rows * plan.n_cols
    if order == "xy":
        tile = jnp.transpose(tile, (0, 2, 1, 3))  # [w, h, n_r, C]
        return tile.reshape(h * w, n_cu)
    tile = jnp.transpose(tile, (2, 0, 1, 3))  # [h, w, n_r, C]
    if row_perm is not None:
        tile = tile[np.asarray(row_perm)]
    return tile.reshape(h * w, n_cu)


def gather_boundaries_phase4(f4_ref, plan: GroupPlan, is_top,
                             t_mod4: bool = True):
    """gather_boundaries via the %4-major phase-split reference slab.

    Same contract as gather_boundaries (VVC edge rules via static masks)
    except ref_t's sample rows come out %4-GROUPED when ``t_mod4``
    (free — exactly the order the fused kernels consume; raster with
    ``t_mod4=False`` for the CPU path).  ref_l rows stay raster.
    """
    ref_t = gather_top_phase4(f4_ref, plan, is_top, t_mod4=t_mod4)
    ref_l = gather_left_phase4(f4_ref, plan)
    ref_l = left_fixups4(ref_l, f4_ref, plan, is_top)
    return ref_t, ref_l


def gather_top_phase4(f4_ref, plan: GroupPlan, is_top,
                      t_mod4: bool = True):
    """Top boundaries [w, nCU] from the %4-major ref slab; sample rows
    %4-grouped when ``t_mod4``.  Frame-top VVC edge rule applied."""
    w, h = plan.width, plan.height
    n_rows, n_cols = plan.n_rows, plan.n_cols
    s = f4_ref.shape[0]
    x0 = plan.x_prog[0]

    # the row above each CU row (F row y == frame row y-1 because of the
    # slab's +1 halo row)
    fw = _window_phases4(f4_ref, x0, w, raster=not t_mod4)
    if plan.y_prog is not None:
        o, st = plan.y_prog
        rows = jax.lax.slice(fw, (0, o, 0),
                             (w, o + (n_rows - 1) * st + 1, fw.shape[2]),
                             (1, st, 1))
    else:
        rows = jnp.take(fw, np.asarray(plan.ys), axis=1)
    ref_t = rows.reshape(w, n_rows * n_cols)
    # frame-top fixup: all samples <- frame row 0 sample left of the CU
    # (ref slab row 1), DC at the frame-left corner
    if x0 > 0:
        pad_cols = f4_ref[phase4_pos(x0 - 1, s), 1, :n_cols]
    else:
        left = f4_ref[phase4_pos(s - 1, s), 1, :]
        pad_cols = jnp.concatenate(
            [jnp.full((1,), VALUE_DC, left.dtype), left[:n_cols - 1]])
    pad_t = jnp.tile(pad_cols, n_rows)
    fix_t = jnp.logical_and(
        jnp.asarray(np.repeat(plan.ys == 0, n_cols)), is_top)
    return jnp.where(fix_t[None, :], pad_t[None, :], ref_t)


def gather_left_phase4(f4_ref, plan: GroupPlan):
    """XLA left-boundary gather from the %4-major ref slab: [h, nCU],
    rows raster (edge fixups NOT applied — see left_fixups4)."""
    w, h = plan.width, plan.height
    n_rows, n_cols = plan.n_rows, plan.n_cols
    s = f4_ref.shape[0]
    x0 = plan.x_prog[0]
    if x0 > 0:
        p = phase4_pos(x0 - 1, s)
        fl = jax.lax.slice_in_dim(f4_ref, p, p + 1, axis=0)
        left_cols = _f_row_blocks(fl, _shift(plan.y_prog, 1), plan.ys + 1,
                                  n_rows, h)[0]  # [n_rows, h, C]
    else:
        p = phase4_pos(s - 1, s)
        fl = jax.lax.slice_in_dim(f4_ref, p, p + 1, axis=0)
        blk = _f_row_blocks(fl, _shift(plan.y_prog, 1), plan.ys + 1,
                            n_rows, h)[0]
        # columns j-1: duplicate column 0 in front (j == 0 overwritten)
        left_cols = jnp.concatenate(
            [blk[:, :, :1], jax.lax.slice_in_dim(blk, 0, n_cols - 1,
                                                 axis=2)], axis=2)
    return jnp.moveaxis(left_cols, 1, 0).reshape(h, n_rows * n_cols)


def left_fixups4(ref_l, f4_ref, plan: GroupPlan, is_top):
    """VVC frame-left/corner edge rules on a raw [h, nCU] left-boundary
    tensor (reference: intra.cl:232-243): frame-left CUs take the sample
    above the CU (via the halo row), DC at the frame corner.

    The pad rows (slab rows ``ys`` at frame column 0) come from a
    STRIDED SLICE of the slab's column 0 when the lattice is uniform —
    a take-gather here measured ~0.65 ms of hidden relayout per 4-wide
    group once fused with the select (evidence/tpu_tune_r4a.log:
    rl+fix 0.76 ms vs 0.12 with the slice); the interleaved-lattice
    groups keep the take fallback."""
    n_cols = plan.n_cols
    col0 = f4_ref[0, :, 0]  # slab column 0, [R]
    if plan.y_prog is not None:
        o, st = plan.y_prog
        n = plan.n_rows
        rows = jax.lax.slice(col0, (o,), (o + (n - 1) * st + 1,), (st,))
    else:
        rows = jnp.take(col0, np.asarray(plan.ys), axis=0)
    pad_rows = jnp.where(
        jnp.logical_and(jnp.asarray(plan.ys == 0), is_top),
        jnp.asarray(VALUE_DC, col0.dtype), rows)
    pad_l = jnp.repeat(pad_rows, n_cols)
    fix_l = jnp.asarray(np.tile(plan.xs == 0, plan.n_rows))
    return jnp.where(fix_l[None, :], pad_l[None, :], ref_l)


def gather_boundaries(ref_pad, plan: GroupPlan, is_top):
    """Top/left boundaries in SoA layout: ([w, nCU], [h, nCU]).

    ``ref_pad``: [1+Hp, 1+Wp] padded reference slab — row 0 is the halo row
    above the slab, column 0 duplicates the slab's first column (read only
    by frame-left CUs, whose values the VVC edge rule overwrites), and the
    bottom/right edges are replication-padded to the `padded_extent`.
    VVC edge-padding rules applied via static lattice masks
    (reference: intra.cl:96-107, 232-243).
    """
    w, h = plan.width, plan.height
    n_rows, n_cols = plan.n_rows, plan.n_cols

    # ---- top: the row above each CU row (ref_pad row y == frame row y-1),
    # sliced per CU column window
    top_rows = _row_strided(ref_pad, plan.y_prog, plan.ys, n_rows)
    ref_t = _col_blocks(top_rows, _shift(plan.x_prog, 1), plan.xs + 1,
                        n_cols, w)  # [n_rows, n_cols, w]
    ref_t = jnp.moveaxis(ref_t, 2, 0).reshape(w, n_rows * n_cols)
    # frame-top fixup: all samples <- frame row 0 sample left of the CU
    pad_cols = jnp.where(jnp.asarray(plan.xs > 0),
                         ref_pad[1, plan.xs], VALUE_DC)
    pad_t = jnp.tile(pad_cols, n_rows)  # [nCU], varies by column only
    fix_t = jnp.logical_and(
        jnp.asarray(np.repeat(plan.ys == 0, n_cols)), is_top)
    ref_t = jnp.where(fix_t[None, :], pad_t[None, :], ref_t)

    # ---- left: the column left of each CU column (ref_pad col x == frame
    # col x-1), sliced per CU row window
    left_cols = _col_strided(ref_pad, plan.x_prog, plan.xs, n_cols)
    ref_l = _row_blocks(left_cols, _shift(plan.y_prog, 1), plan.ys + 1,
                        n_rows, h)  # [n_rows, h, n_cols]
    ref_l = jnp.moveaxis(ref_l, 1, 0).reshape(h, n_rows * n_cols)
    # frame-left fixup: all samples <- sample above the CU (via halo), DC
    # at the frame corner
    pad_rows = jnp.where(
        jnp.logical_and(jnp.asarray(plan.ys == 0), is_top),
        VALUE_DC, ref_pad[plan.ys, 1])
    pad_l = jnp.repeat(pad_rows, n_cols)  # [nCU], varies by row only
    fix_l = jnp.asarray(np.tile(plan.xs == 0, n_rows))
    ref_l = jnp.where(fix_l[None, :], pad_l[None, :], ref_l)
    return ref_t, ref_l


def gather_originals(frame_pad, plan: GroupPlan,
                     row_perm=None, col_perm=None, order: str = "yx"):
    """Original CU samples in SoA layout: [h*w, nCU], sample axis raster
    (rows/columns optionally reordered by static perms, folded into the
    SoA transpose copy); ``order="xy"`` emits x-major sample rows
    (col_perm-ed x outer, raster y inner — the fetch_rows kernel layout).

    ``frame_pad``: [Hp, Wp] distortion-target frame, edge-replication
    padded to the `padded_extent`.
    """
    w, h = plan.width, plan.height
    rows = _row_blocks(frame_pad, plan.y_prog, plan.ys, plan.n_rows, h)
    tile = _col_blocks(rows, plan.x_prog, plan.xs, plan.n_cols, w)
    tile = jnp.moveaxis(tile, (1, 3), (0, 1))  # [h, w, n_rows, n_cols]
    if row_perm is not None:
        tile = tile[np.asarray(row_perm)]
    if col_perm is not None:
        tile = tile[:, np.asarray(col_perm)]
    if order == "xy":
        tile = jnp.swapaxes(tile, 0, 1)  # [w, h, n_rows, n_cols]
    return tile.reshape(h * w, plan.n_rows * plan.n_cols)


def rowband_boxes(f4_frame, f4_slab, plan: GroupPlan, is_top,
                  pack: int = 1):
    """Phase-space input boxes for the row-band kernel
    (ops/pallas/rowband.py): og [w, n_r, h, C], ref_t [w, n_r, C] and
    ref_l [n_r, h, C], VVC edge rules pre-applied to the boundaries and
    the lane axis padded to a 128 multiple.  Everything here is
    contiguity-preserving slices/reshapes of the %4-major phase tensors
    — for the aligned stride==w, sy==h groups the og box is a pure view
    — replacing the lane/sublane-crossing SoA transposes of
    gather_originals_phase4 / gather_boundaries_phase4.

    ``pack``: lane-pack factor for coarse-stride lattices whose column
    count fills < ~half the 128-lane tile (e.g. the 60-column stride-32
    groups at 1080p): ``pack`` consecutive lattice ROWS are placed
    side-by-side along the lane axis (packed row t, lane block q =
    lattice row t*pack + q), raising fill from 60/128 to 120/128.  The
    kernels are lane-independent, so they run unchanged; callers unpack
    the cost rows (see cost_engine._class_costs_rowband).
    """
    w, h = plan.width, plan.height
    s = f4_frame.shape[0]
    x0 = plan.x_prog[0]
    oy = int(plan.ys[0])
    sy = plan.y_prog[1] if plan.n_rows > 1 else h
    n_r, n_c = plan.n_rows, plan.n_cols
    # pack>1 builds at the exact column count and lane-pads after the
    # row packing below; pack==1 pads straight to the 128 multiple.
    c_pad = n_c if pack > 1 else -(-n_c // 128) * 128

    def _lanes(a):
        """Slice/pad the minor axis to the 128-padded column count."""
        if a.shape[-1] == c_pad:
            return a
        if a.shape[-1] > c_pad:
            return jax.lax.slice_in_dim(a, 0, c_pad, axis=a.ndim - 1)
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                       + [(0, c_pad - a.shape[-1])])

    # ---- original samples: [w, n_r, h, C]
    fw = _window_phases4(f4_frame, x0, w)
    og = _lanes(_f_row_blocks(fw, (oy, sy), None, n_r, h))

    # ---- top boundaries: [w, n_r, C] (slab row y == frame row y-1)
    fwt = _window_phases4(f4_slab, x0, w)
    rt = _lanes(jax.lax.slice(
        fwt, (0, oy, 0),
        (w, oy + (n_r - 1) * sy + 1, fwt.shape[2]), (1, sy, 1)))
    if x0 > 0:
        pad_cols = _lanes(f4_slab[phase4_pos(x0 - 1, s), 1:2])[0]
    else:
        left = f4_slab[phase4_pos(s - 1, s), 1, :]
        pad_cols = _lanes(jnp.concatenate(
            [jnp.full((1,), VALUE_DC, left.dtype), left[:-1]])[None])[0]
    fix_t = jnp.logical_and(jnp.asarray(plan.ys == 0), is_top)
    rt = jnp.where(fix_t[None, :, None], pad_cols[None, None, :], rt)

    # ---- left boundaries: [n_r, h, C] (phase x0-1; frame-left wrap
    # shifts one lattice column right, garbage column 0 overwritten by
    # the edge fixup)
    p = phase4_pos((x0 - 1) % s, s)
    fl = jax.lax.slice_in_dim(f4_slab, p, p + 1, axis=0)
    rl = _f_row_blocks(fl, (oy + 1, sy), None, n_r, h)[0]
    rl = _lanes(rl)
    if x0 == 0:
        rl = jnp.concatenate([rl[..., :1], rl[..., :-1]], axis=-1)
    col0 = f4_slab[0, :, 0]
    rows = jax.lax.slice(col0, (oy,), (oy + (n_r - 1) * sy + 1,), (sy,))
    pad_rows = jnp.where(
        jnp.logical_and(jnp.asarray(plan.ys == 0), is_top),
        jnp.asarray(VALUE_DC, col0.dtype), rows)
    fix_l = np.zeros(c_pad, bool)
    fix_l[:n_c] = plan.xs[:n_c] == 0
    rl = jnp.where(jnp.asarray(fix_l)[None, None, :],
                   pad_rows[:, None, None], rl)
    if pack > 1:
        # Zero-pad the row axis to a pack multiple (padded rows compute
        # garbage the caller slices off), then place each residue-q row
        # subsequence in lane block q and pad lanes to a 128 multiple.
        rp = (-n_r) % pack
        if rp:
            og = jnp.pad(og, [(0, 0), (0, rp), (0, 0), (0, 0)])
            rt = jnp.pad(rt, [(0, 0), (0, rp), (0, 0)])
            rl = jnp.pad(rl, [(0, rp), (0, 0), (0, 0)])
        og = jnp.concatenate([og[:, q::pack] for q in range(pack)], -1)
        rt = jnp.concatenate([rt[:, q::pack] for q in range(pack)], -1)
        rl = jnp.concatenate([rl[q::pack] for q in range(pack)], -1)
        lp = (-og.shape[-1]) % 128
        if lp:
            og = jnp.pad(og, [(0, 0), (0, 0), (0, 0), (0, lp)])
            rt = jnp.pad(rt, [(0, 0), (0, 0), (0, lp)])
            rl = jnp.pad(rl, [(0, 0), (0, 0), (0, lp)])
    return og, rt, rl


def reduce_boundary(samples, bnd_size: int):
    """Downsample-average along the sample (leading) axis."""
    n = samples.shape[0]
    ds = n // bnd_size
    if ds == 1:
        return samples
    log2 = ds.bit_length() - 1
    off = 1 << (log2 - 1)
    grouped = samples.reshape(bnd_size, ds, -1)
    return (grouped.sum(1, dtype=jnp.int32) + off) >> log2


import functools as _functools


@_functools.cache
def _wing_matrices(size_id: int, sample_perm: tuple | None = None,
                   mode_minor: bool = False):
    """([M*S, C] normal, [M*S, C] transposed) bf16 weight matrices.

    The transposed wing's output-sample permutation (the r x r grid
    transposition, reference: intra.cl:485-539) is baked into its row
    order so both wings are plain matmuls with fusable epilogues; an
    optional extra ``sample_perm`` (e.g. the distortion kernel's
    %4-grouped sample order) is baked the same way, making the permuted
    prediction FREE instead of a post-matmul gather pass.
    bf16 storage is exact: the weights are 8-bit (<= 255 <= 2^8, within
    bf16's 8 significand bits)."""
    import numpy as np

    import ml_dtypes

    r = REDUCED_PRED_SIZE[size_id]
    mat = mip_weights.padded_matrix(size_id)  # [M, S, C]
    m, s, c = mat.shape
    tperm = np.arange(s).reshape(r, r).T.ravel()
    extra = (np.arange(s) if sample_perm is None
             else np.asarray(sample_perm, np.int64))

    def limbed(mm):
        # [M*S, 2C]: columns [32*w | w] pair with the stacked [hi; lo]
        # offset limbs, folding the two-limb contraction into ONE matmul.
        # 32*w stays exact in bf16 (a power-of-two scale of 8-bit weights).
        mm = mm[:, extra, :]
        if mode_minor:  # rows (s, m) instead of (m, s)
            mm = mm.transpose(1, 0, 2)
        flat = mm.reshape(m * s, c)
        return np.concatenate([32 * flat, flat],
                              axis=1).astype(ml_dtypes.bfloat16)

    return limbed(mat), limbed(mat[:, tperm, :])


def _wing_prediction(mat_rows, b_first, b_second, size_id: int):
    """One wing's all-mode prediction [M*S, nCU] int16.

    The contraction runs on the MXU in bf16 at DEFAULT precision via a
    two-limb split folded into one matmul: off = 32*hi + lo with
    |hi| <= 32 and 0 <= lo < 32, both (and the weights and their 32x
    power-of-two scale) exactly representable in bf16, contracted against
    [32*w | w]; every product <= 255*32*32 and every f32 accumulator
    <= 8*255*1023 < 2^24, so the result is exact.  (f32 HIGHEST-precision
    dots were ~3x slower; int32 dots don't reach the MXU at all.)
    """
    bnd = jnp.concatenate([b_first, b_second], 0).astype(jnp.int32)
    first = bnd[:1]  # [1, nCU]
    row0 = (jnp.zeros_like(first) if size_id == 2
            else (1 << 9) - first)
    off = jnp.concatenate([row0, bnd[1:] - first], 0)  # [C, nCU]
    offset_term = ((1 << (MIP_SHIFT_MATRIX - 1))
                   - MIP_OFFSET_MATRIX * off.sum(0))  # [nCU]
    mat = jnp.asarray(mat_rows)  # [M*S, 2C]: [32*w | w]
    limbs = jnp.concatenate([off >> 5, off & 31], 0).astype(jnp.bfloat16)
    acc = jax.lax.dot(mat, limbs,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    pred = ((acc + offset_term[None]) >> MIP_SHIFT_MATRIX) + first
    return jnp.clip(pred, 0, SAMPLE_MAX).astype(jnp.int16)


def reduced_prediction_all_modes(red_t, red_l, size_id: int,
                                 sample_perm: tuple | None = None,
                                 mode_minor: bool = False):
    """All-mode reduced prediction, int16; modes 0..M-1 are the normal
    wing, M..2M-1 the transposed wing.  Shape [2M, S, nCU] (S = R*R
    raster, optionally reordered by ``sample_perm`` baked into the
    weights), or [S, 2M, nCU] with ``mode_minor`` (the layout the SizeId0
    kernel wants — baked into the weight row order, no transpose op)."""
    r = REDUCED_PRED_SIZE[size_id]
    m = PRED_MODES[size_id]
    mat_n, mat_t = _wing_matrices(size_id, sample_perm, mode_minor)
    pred_n = _wing_prediction(mat_n, red_t, red_l, size_id)
    pred_t = _wing_prediction(mat_t, red_l, red_t, size_id)
    n = pred_n.shape[-1]
    if mode_minor:
        return jnp.concatenate(
            [pred_n.reshape(r * r, m, n), pred_t.reshape(r * r, m, n)],
            axis=1)
    return jnp.concatenate([pred_n, pred_t]).reshape(2 * m, r * r, n)


def _interp(before, after, up: int, pos):
    """Linear interpolation tap, exact reference rounding, int16-safe:
    |(up-pos)*before + pos*after + rnd| <= 8*1023 + 8*1023 + 4 < 2^15."""
    if up == 1:
        return after
    log2 = up.bit_length() - 1
    rnd = jnp.int16(1 << (log2 - 1))
    up16 = jnp.int16(up)
    return ((up16 - pos) * before + pos * after + rnd) >> log2


def upsample_all(pred, ref_t, ref_l, w: int, h: int, r: int):
    """Upsample [2M, R*R, nCU] int16 -> [2M, h, w, nCU] int16.

    Exact reference rounding (intra.cl:815-895).  The before/after operand
    selections are repeats of static slices (each reduced sample serves
    up_h/up_v consecutive outputs), which lower to broadcasts — no gathers.
    """
    two_m, _, n = pred.shape
    up_h = w // r
    up_v = h // r
    pred = pred.reshape(two_m, r, r, n)
    # horizontal: anchor rows against the left boundary
    if up_h == 1:
        anchors = pred
    else:
        lead = jnp.broadcast_to(ref_l[up_v - 1::up_v][None, :, None, :],
                                (two_m, r, 1, n)).astype(pred.dtype)
        ext = jnp.concatenate([lead, pred], axis=2)  # [2M, R, R+1, nCU]
        before = jnp.repeat(ext[:, :, :-1], up_h, axis=2)
        after = jnp.repeat(ext[:, :, 1:], up_h, axis=2)
        o = jnp.asarray((np.arange(w) % up_h + 1)[None, None, :, None],
                        jnp.int16)
        anchors = _interp(before, after, up_h, o)
    # vertical: all rows against the top boundary
    if up_v == 1:
        return anchors
    top = jnp.broadcast_to(ref_t[None, None, :, :],
                           (two_m, 1, w, n)).astype(pred.dtype)
    ext2 = jnp.concatenate([top, anchors], axis=1)  # [2M, R+1, w, nCU]
    before = jnp.repeat(ext2[:, :-1], up_v, axis=1)
    after = jnp.repeat(ext2[:, 1:], up_v, axis=1)
    ov = jnp.asarray((np.arange(h) % up_v + 1)[None, :, None, None],
                     jnp.int16)
    return _interp(before, after, up_v, ov)


def distortion(orig, pred, h: int, w: int):
    """(SAD, SATD): [2M, nCU] each.

    ``orig``: [h*w, nCU], sample axis raster.  ``pred``: upsampled
    [2M, h, w, nCU] raster, or reduced [2M, 16, nCU] for SizeId 0 (4x4:
    raster == 4x4-block order).
    """
    two_m = pred.shape[0]
    n = pred.shape[-1]
    if pred.ndim == 3:
        pred = pred.reshape(two_m, h, w, n)
    diff = (orig.reshape(h, w, n)[None] - pred).astype(jnp.int16)
    sad = jnp.abs(diff.astype(jnp.int32)).sum((1, 2), dtype=jnp.int32)
    # SATD over 4x4 blocks: regroup via reshape/transpose (a plain copy,
    # not a gather), then one +/-1 matrix transform.  |t| <= 16*1023 < 2^15
    # so the transform is exact in int16; reductions accumulate in int32.
    nb = (h * w) // 16
    blocks = diff.reshape(two_m, h // 4, 4, w // 4, 4, n)
    blocks = jnp.transpose(blocks, (0, 1, 3, 2, 4, 5))
    blocks = blocks.reshape(two_m, nb, 16, n)
    t = jnp.einsum("kj,mbjn->mbkn", jnp.asarray(_H16, np.int16), blocks,
                   preferred_element_type=jnp.int16)
    dc = jnp.abs(t[:, :, 0].astype(jnp.int32))
    block_satd = (jnp.abs(t.astype(jnp.int32)).sum(2, dtype=jnp.int32)
                  - dc + (dc >> 2))
    block_satd = (block_satd + 1) >> 1
    return sad, block_satd.sum(1, dtype=jnp.int32)
