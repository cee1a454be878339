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

``col_shift`` serves the frame-left wrap (x0 == 0): the left neighbor of
CU column j is column j-1 of the LAST phase; the DMA lands shifted one
column right and column 0 (frame-left CUs) is left undefined — the VVC
edge-rule fixup overwrites it (reference: intra.cl:232-243).

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


def _rows_per_step(n_r: int, span_bytes_per_row: int) -> int:
    """Largest k in {8, 4, 2, 1} dividing n_r with the double-buffered
    scratch comfortably inside VMEM."""
    for k in (8, 4, 2, 1):
        if n_r % k == 0 and k * span_bytes_per_row * 2 <= (4 << 20):
            return k
    return 1


def _kernel(f_ref, out_ref, scr, sems, *, runs, offs, oy, sy, h, c, k,
            col_shift):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    span = (k - 1) * sy + h

    def dmas(slot, step):
        row0 = oy + step * (k * sy)
        out = []
        for (st, ln), off in zip(runs, offs):
            if col_shift:
                src = f_ref.at[pl.ds(st, ln), pl.ds(row0, span),
                               pl.ds(0, c - 1)]
                dst = scr.at[slot, pl.ds(off, ln), :, pl.ds(1, c - 1)]
            else:
                src = f_ref.at[pl.ds(st, ln), pl.ds(row0, span)]
                dst = scr.at[slot, pl.ds(off, ln)]
            out.append(pltpu.make_async_copy(src, dst, sems.at[slot]))
        return out

    @pl.when(i == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(i + 1 < n)
    def _():
        for d in dmas((i + 1) % 2, i + 1):
            d.start()

    slot = i % 2
    for d in dmas(slot, i):
        d.wait()
    p = sum(ln for _, ln in runs)
    v = scr[pl.ds(slot, 1)]  # [1, p, span, c]
    for kk in range(k):
        slab = v[:, :, kk * sy:kk * sy + h]  # [1, p, h, c]
        out_ref[:, pl.ds(kk, 1)] = slab.reshape(p * h, 1, c)


@functools.partial(jax.jit, static_argnames=(
    "runs", "oy", "sy", "h", "n_r", "col_shift", "interpret"))
def fetch_rows(f4, *, runs: tuple[tuple[int, int], ...], oy: int, sy: int,
               h: int, n_r: int, col_shift: bool = False,
               interpret: bool = False):
    """[P*h, n_r*C] relayout of the [s, R, C] phase planes (see module
    docstring); P = total phases across ``runs``."""
    _, f_rows, c = f4.shape
    p = sum(ln for _, ln in runs)
    offs = []
    acc = 0
    for _, ln in runs:
        offs.append(acc)
        acc += ln
    k = _rows_per_step(n_r, p * sy * c * 2)
    span = (k - 1) * sy + h
    assert oy + (n_r - 1) * sy + h <= f_rows, (oy, sy, n_r, h, f_rows)
    kernel = functools.partial(
        _kernel, runs=tuple(runs), offs=tuple(offs), oy=oy, sy=sy, h=h,
        c=c, k=k, col_shift=col_shift)
    out = pl.pallas_call(
        kernel,
        grid=(n_r // k,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((p * h, k, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p * h, n_r, c), f4.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, p, span, c), f4.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(f4)
    return out.reshape(p * h, n_r * c)
