"""Fused Pallas kernel: upsample + SAD + SATD for one shape class.

This is the engine's hottest path (reference equivalent: the
upsampleDistortion kernel family, intra.cl:545-1171).  The XLA-only SoA
path materializes the upsampled prediction, the diff, and the Hadamard
blocks in HBM for every mode; this kernel keeps the whole per-mode pipeline
in VMEM:

  grid: CU tiles (the lane axis).  Per tile, the reduced predictions of all
  modes, the CU's boundary anchor samples, and the original samples are
  DMA'd to VMEM once; a fori_loop over the 2M modes then upsamples (exact
  VVC integer interpolation, delta form), computes SAD, and computes the
  VTM mean-scaled 4x4-Hadamard SATD with an 8-op-per-axis butterfly —
  writing only the [2M, tile] cost rows back to HBM.

HBM traffic per class: pred + orig + boundaries in, 2x[2M, nCU] int32 out —
no intermediate tensors.  All arithmetic int16 (upsample products bounded by
8*1023 + rounding < 2^15; Hadamard coefficients bounded by 16*1023 < 2^15)
with int32 reductions, bit-identical to the golden model.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_down_pow2(x: int) -> int:
    return 1 << (x.bit_length() - 1)


def default_cu_tile(h: int, w: int) -> int:
    """Pick the CU-tile width so the per-tile working set fits VMEM."""
    budget = 1 << 20  # ~1 MB for the largest [h, w, tile] int16 temp
    tile = budget // (h * w * 2)
    tile = max(128, min(1024, _round_down_pow2(max(tile, 1)) * 128 // 128))
    # keep it a multiple of 128 lanes
    return max(128, (tile // 128) * 128)


def _hadamard4(parts):
    """4-point Hadamard butterfly (rows [1111, 11-1-1, 1-1-11, 1-11-1])."""
    x0, x1, x2, x3 = parts
    s0, s1 = x0 + x1, x2 + x3
    d0, d1 = x0 - x1, x2 - x3
    return s0 + s1, s0 - s1, d0 - d1, d0 + d1


def _kernel(pred_ref, orig_ref, reft_ref, refl_ref, sad_ref, satd_ref, *,
            h: int, w: int, r: int, two_m: int):
    # One CU tile per grid step; a fori_loop over the 2M modes amortizes
    # the per-step overhead (a mode-per-grid-step variant measured ~2x
    # slower on small classes).  int16 is storage-only: the v5e VPU has no
    # i16 arithmetic (Mosaic rejects i16 shifts/subtracts), so compute runs
    # in int32 after the VMEM loads; inputs stay int16 in HBM to halve DMA
    # traffic.  Everything mode-invariant is hoisted out of the loop.
    up_h = w // r
    up_v = h // r
    c = pred_ref.shape[-1]
    og = orig_ref[...].astype(jnp.int32).reshape(h, w, c)
    if up_h > 1:
        lead = refl_ref[...].astype(jnp.int32).reshape(r, 1, c)
    if up_v > 1:
        top = reft_ref[...].astype(jnp.int32).reshape(1, w, c)

    def _interp_axis(base, delta, up: int, axis: int):
        """Strength-reduced linear interpolation along a new phase axis:
        out_o = (base*up + o*delta + rnd) >> log2 computed incrementally
        (one add + one shift per output instead of shift+mul+2 adds)."""
        log2 = up.bit_length() - 1
        t = (base << log2) + (1 << (log2 - 1))
        phases = []
        for _ in range(up):
            t = t + delta
            phases.append(t >> log2)
        return jnp.stack(phases, axis=axis)

    def mode_body(m, _):
        p3 = (pred_ref[pl.ds(m, 1)].astype(jnp.int32).reshape(r, r, c))
        # ---- horizontal upsample (anchor rows).  Delta form:
        # (up-o)*before + o*after == base*up + o*(after-base).
        if up_h == 1:
            anch = p3
        else:
            base = jnp.concatenate([lead, p3[:, :-1, :]], axis=1)
            anch = _interp_axis(base, p3 - base, up_h,
                                axis=2).reshape(r, w, c)
        # ---- vertical upsample (all rows)
        if up_v == 1:
            up = anch
        else:
            base = jnp.concatenate([top, anch[:-1, :, :]], axis=0)
            up = _interp_axis(base, anch - base, up_v,
                              axis=1).reshape(h, w, c)
        # ---- SAD
        diff = og - up
        sad_ref[pl.ds(m, 1), :] = (
            jnp.abs(diff).sum((0, 1), dtype=jnp.int32).reshape(1, c))
        # ---- SATD: two-sided 4x4 Hadamard butterflies per block,
        # accumulating |t| inline to keep the VMEM working set small.
        blk = diff.reshape(h // 4, 4, w // 4, 4, c)
        v = _hadamard4([blk[:, i] for i in range(4)])  # over in-block rows
        acc = None
        dc = None
        for ky, t in enumerate(v):
            for kx, out in enumerate(_hadamard4(
                    [t[:, :, j] for j in range(4)])):
                a = jnp.abs(out)  # [h/4, w/4, c]
                acc = a if acc is None else acc + a
                if ky == 0 and kx == 0:
                    dc = a
        bsatd = acc - dc + (dc >> 2)
        bsatd = (bsatd + 1) >> 1
        satd_ref[pl.ds(m, 1), :] = (
            bsatd.sum((0, 1), dtype=jnp.int32).reshape(1, c))
        return 0

    if h * w <= 64:
        # Small classes: per-iteration work is tiny, so unroll statically —
        # bigger basic blocks for the Mosaic scheduler, no loop overhead.
        for m in range(two_m):
            mode_body(m, 0)
    else:
        jax.lax.fori_loop(0, two_m, mode_body, 0)

@functools.partial(jax.jit,
                   static_argnames=("h", "w", "r", "cu_tile", "interpret"))
def upsample_distortion(pred, orig, ref_t, refl_anchor, *, h, w, r,
                        cu_tile=None, interpret=False):
    """Fused upsample+SAD+SATD for one class.

    pred: [2M, R*R, nCU] int16 reduced predictions (raster sample order).
    orig: [h*w, nCU] int16 original samples (raster).
    ref_t: [w, nCU] int16 complete top boundaries.
    refl_anchor: [R, nCU] int16 left-boundary anchor samples
        (ref_l[up_v-1::up_v]).
    Returns (sad, satd): [2M, nCU] int32 each.  nCU must be a multiple of
    the CU tile (pad and slice at the call site).
    """
    two_m, s, n_cu = pred.shape
    tile = cu_tile or default_cu_tile(h, w)
    assert n_cu % tile == 0, (n_cu, tile)
    grid = (n_cu // tile,)
    kernel = functools.partial(_kernel, h=h, w=w, r=r, two_m=two_m)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((two_m, s, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h * w, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((two_m, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((two_m, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((two_m, n_cu), jnp.int32),
            jax.ShapeDtypeStruct((two_m, n_cu), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * two_m * n_cu * h * w * 4,
            bytes_accessed=(pred.size + orig.size + ref_t.size
                            + refl_anchor.size) * 2 + two_m * n_cu * 8,
            transcendentals=0,
        ),
    )(pred, orig, ref_t, refl_anchor)
