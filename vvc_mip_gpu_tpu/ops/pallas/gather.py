"""Pallas row-fetch relayout: SoA gathers at HBM-DMA speed.

The XLA formulations of the per-group SoA gathers (ref_l left boundaries
and the mode-minor classes' original samples) lower to strided-slice +
mid-axis-transpose chains that measured far off the bandwidth roofline on
TPU (the round-1 profile's dominant "gather" cost).  This kernel replaces
them with pure copies: the lattice-row grid + BlockSpec index maps realize
the (lattice row, sample row) -> (sample row, CU column block) transpose,
so the kernel body never shuffles sublanes — each grid step is a handful
of double-buffered DMA boxes from the %4-major phase-split frame
(soa.phase_split4) followed by contiguous VMEM stores.

Output layout: out[p*h + y, i*C + j] = f4[run_phase(p), oy + i*sy + y, j]

* ref_l of a group: one run (the single phase left of the CU window),
  rows oy = ys[0]+1 (the ref slab's +1 halo offset) -> out [h, nCU],
  raster rows — exactly gather_boundaries' left output.
* x-major orig of a group: the window's four %4 phase runs, oy = ys[0]
  -> out [w*h, nCU] with rows (x %4-grouped major, y raster minor) — the
  order the mode-on-sublanes kernels index statically.

The frame-left wrap (x0 == 0; the left neighbor of CU column j is column
j-1 of the LAST phase) is NOT handled here: the caller shifts the output
one lattice column right in XLA (a single lane-shift over the small
[h, nCU] tensor; the j == 0 garbage column is overwritten by the VVC
edge-rule fixup, reference: intra.cl:232-243).

Each grid step covers ``k`` lattice rows (one DMA box spans them, k
output column blocks) so short-CU classes don't pay hundreds of tiny
grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rows_per_step(n_r: int, p: int, sy: int, h: int, c: int) -> int:
    """Lattice rows per grid step.  Pallas blocks need the 2nd-minor dim
    to be a multiple of 8 or the whole array dim, so k is the largest
    multiple of 8 dividing n_r whose double-buffered scratch fits — or
    n_r itself (single step, single buffer) when no such k exists."""
    budget = 6 << 20
    for k in (64, 32, 16, 8):
        if n_r % k == 0 and p * k * sy * c * 2 * 2 <= budget:
            return k
    # Single-buffer fallback (k = n_r) must ALSO fit: its scratch
    # (p * n_r * sy * c) is generally larger than the rejected
    # double-buffered options, and over-budget VMEM surfaces as a Mosaic
    # compile failure instead of the ValueError that lets the caller fall
    # back to the XLA gather.
    if p * n_r * sy * c * 2 > budget:
        raise ValueError(
            f"fetch_rows scratch over VMEM budget: p={p} n_r={n_r} "
            f"sy={sy} c={c}")
    return n_r


def _kernel(f_ref, out_ref, scr, sems, *, runs, offs, oy, sy, h, cl, cp,
            k, r0, n_buf):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    n = pl.num_programs(1)
    p = sum(ln for _, ln in runs)
    span = -(-((k - 1) * sy + h + r0) // 8) * 8  # 8-aligned slice shape

    def dmas(slot, bb, step):
        # HBM row offsets and slice shapes must be 8-aligned (tiled
        # memref): DMA from the aligned row oy - r0 with an aligned span
        # and shift the in-scratch sample index by the STATIC remainder
        # r0 (requires r0 + h <= sy slack, checked by the wrapper; k*sy
        # is a multiple of 8, so every step stays aligned).  The full
        # (128-padded) lane width cp is always copied.
        row0 = (oy - r0) + step * (k * sy)
        out = []
        for (st, ln), off in zip(runs, offs):
            src = f_ref.at[bb, pl.ds(st, ln), pl.ds(row0, span)]
            dst = scr.at[pl.ds(slot * p + off, ln), pl.ds(0, span)]
            out.append(pltpu.make_async_copy(src, dst, sems.at[slot]))
        return out

    if n_buf == 1:
        for d in dmas(0, b, i):
            d.start()
        for d in dmas(0, b, i):
            d.wait()
        slot = 0
    else:
        t = b * n + i  # flat step index across the (batch, rows) grid

        @pl.when(t == 0)
        def _():
            for d in dmas(0, 0, 0):
                d.start()

        @pl.when(t + 1 < nb * n)
        def _():
            t1 = t + 1
            for d in dmas((t1) % 2, t1 // n, t1 % n):
                d.start()

        slot = t % 2
        for d in dmas(slot, b, i):
            d.wait()

    # Stores: view the scratch rows as (k, sy) so the per-sample-row slab
    # v4[pi, :, r0 + y] is a [k, cp] STATIC slice — out rows are written
    # one (phase, y) at a time as [1, k, cl] full-sublane blocks, with no
    # reshape that moves a dim across a unit axis (Mosaic rejects those)
    # and no strided slicing.
    v = scr[pl.ds(slot * p, p)]  # [p, k*sy, cp]
    v4 = v.reshape(p, k, sy, cp)
    for pi in range(p):
        for y in range(h):
            slab = v4[pi, :, r0 + y, :]  # [k, cp]
            out_ref[:, pl.ds(pi * h + y, 1)] = slab[:, :cl][None, None]


def _fetch_rows_batched(f4b, *, runs, oy, sy, h, n_r, c_log, interpret):
    """[B, P*h, n_r, c_log] from batched phase planes [B, s, R, Cp];
    the batch rides a leading grid dimension (the ANY-space input takes
    no BlockSpec blocking, so vmap must become an explicit grid axis)."""
    nb, _, f_rows, cp = f4b.shape
    if cp % 128:
        raise ValueError(f"f4 lane width {cp} not 128-aligned")
    p = sum(ln for _, ln in runs)
    offs = []
    acc = 0
    for _, ln in runs:
        offs.append(acc)
        acc += ln
    k = _rows_per_step(n_r, p, sy, h, cp)
    n_buf = 1 if k == n_r else 2
    r0 = oy % 8
    if r0 and r0 + h > sy:
        # The static sub-tile row shift has no slack inside the (k, sy)
        # scratch view; the caller must fall back to the XLA gather.
        raise ValueError(f"unsupported row offset {oy} (r0={r0}, h={h}, "
                         f"sy={sy})")
    span = -(-((k - 1) * sy + h + r0) // 8) * 8
    if span > k * sy:
        raise ValueError(f"aligned span {span} exceeds the (k={k}, "
                         f"sy={sy}) scratch view")
    if (oy - r0) + (n_r // k - 1) * k * sy + span > f_rows:
        raise ValueError("f4 lacks tail row slack for the aligned span")
    kernel = functools.partial(
        _kernel, runs=tuple(runs), offs=tuple(offs), oy=oy, sy=sy, h=h,
        cl=c_log, cp=cp, k=k, r0=r0, n_buf=n_buf)
    return pl.pallas_call(
        kernel,
        grid=(nb, n_r // k),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, p * h, k, c_log),
                               lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, p * h, n_r, c_log),
                                       f4b.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_buf * p, k * sy, cp), f4b.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(f4b)


def fetch_rows(f4, *, runs: tuple[tuple[int, int], ...], oy: int, sy: int,
               h: int, n_r: int, c_log: int,
               interpret: bool = False):
    """[P*h, n_r*c_log] relayout of the [s, R, Cp] phase planes (see
    module docstring); P = total phases across ``runs``.  ``f4`` must be
    lane-padded to a 128-multiple Cp with >= 8 rows of tail slack
    (soa.phase_split4 pad_lanes/pad_rows); ``c_log`` is the logical
    lattice-column count.  vmap-compatible (one batch level): the batch
    becomes the kernel's leading grid dimension.
    """
    p = sum(ln for _, ln in runs)
    impl = functools.partial(
        _fetch_rows_batched, runs=tuple(runs), oy=oy, sy=sy, h=h,
        n_r=n_r, c_log=c_log, interpret=interpret)
    # Validate eagerly so callers can fall back on ValueError before any
    # custom_vmap machinery is involved.
    jax.eval_shape(impl, jax.ShapeDtypeStruct((1,) + f4.shape, f4.dtype))

    @jax.custom_batching.custom_vmap
    def call(x):
        return impl(x[None])[0].reshape(p * h, n_r * c_log)

    @call.def_vmap
    def _rule(axis_size, in_batched, x):  # noqa: ANN001
        assert in_batched[0], "fetch_rows: unbatched operand under vmap"
        out = impl(x).reshape(axis_size, p * h, n_r * c_log)
        return out, True

    return call(f4)
