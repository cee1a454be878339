"""Fused Pallas kernel: all-mode MIP reduced prediction for one class.

The XLA formulation (mip_ops_soa.reduced_prediction_all_modes) is exact but
leaves ~7x the necessary HBM traffic on the table: the f32 dot output is
materialized before the int16 epilogue fusion, and the two wings are then
concatenated — three full passes over a ~600 MB/frame tensor family.  Here
the whole computation is ONE bf16 MXU matmul per CU tile with the epilogue
(shift, clamp, int16 cast) applied in VMEM, writing only the final int16
prediction to HBM.

Everything affine is folded into an augmented block-diagonal matrix
(reference algebra: intra.cl:443-482):

    pred = clip((acc_aug >> 6), 0, 1023)
    acc_aug = sum_c (w_rc - 32) * off_c  + 32 + 64 * first
            = [32*(w-32) | (w-32) | 2048 | 64 | 32] . [hi; lo; fh; fl; 1]

using off = 32*hi + lo (hi = off >> 5, lo = off & 31) and
first = 32*fh + fl.  The -32 fold absorbs the reference's offset term
32 - 32*sum(off) (MIP_OFFSET_MATRIX, constants.cl:22-23); the 64*first
fold absorbs the final "+ first" because adding a multiple of 64 commutes
with the >> 6.  Both wings (normal and transposed, intra.cl:430-441) are
block-diagonal columns of one matrix, so the mode axis concatenation —
and any static output-row order such as the SizeId0 kernel's mode-minor
layout — is free.

Exactness (same argument as mip_ops_soa._wing_prediction): every matrix
entry is an exactly-representable bf16 integer (|w-32| <= 223 < 256, the
rest powers of two), every input limb is in [-32, 31], every product is
< 2^18 and every f32 partial sum < 2^23, so default-precision bf16 MXU
accumulation in f32 is bit-exact.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vvc_mip_gpu_tpu import mip_weights
from vvc_mip_gpu_tpu.constants import (
    PRED_MODES,
    REDUCED_PRED_SIZE,
    SAMPLE_MAX,
    VALUE_DC,
)

MIP_SHIFT = 6  # MIP_SHIFT_MATRIX (constants.cl:22)


@functools.cache
def _augmented_matrix(size_id: int, sample_perm: tuple | None,
                      mode_minor: bool) -> np.ndarray:
    """[R, K] bf16: R = 2M*S output rows, K = 4C + 5 (+ zero pad to %8).

    Row order: (mode-major, sample-minor) per wing, normal wing then
    transposed — matching reduced_prediction_all_modes — or the
    interleaved (sample-major, wing-mode-minor) order with ``mode_minor``.
    ``sample_perm`` reorders the output-sample axis (baked in, free).
    """
    import ml_dtypes

    mat = mip_weights.padded_matrix(size_id).astype(np.int64)  # [M, S, C]
    m, s, c = mat.shape
    r = REDUCED_PRED_SIZE[size_id]
    tperm = np.arange(s).reshape(r, r).T.ravel()
    extra = (np.arange(s) if sample_perm is None
             else np.asarray(sample_perm, np.int64))

    def rows(mm):
        mm = mm[:, extra, :] - 32  # fold the offset term (w - MIP_OFFSET)
        if mode_minor:
            mm = mm.transpose(1, 0, 2)  # (s, m) row order
        return mm.reshape(m * s, c)

    rn, rt = rows(mat), rows(mat[:, tperm, :])
    if mode_minor:
        idx_n = (np.arange(s)[:, None] * 2 * m + np.arange(m)).ravel()
    else:
        idx_n = np.arange(m * s)
    idx_t = idx_n + (m if mode_minor else m * s)

    k = 4 * c + 5
    out = np.zeros((2 * m * s, k + (-k) % 8), np.float64)
    out[idx_n, 0 * c:1 * c] = 32 * rn
    out[idx_n, 1 * c:2 * c] = rn
    out[idx_t, 2 * c:3 * c] = 32 * rt
    out[idx_t, 3 * c:4 * c] = rt
    out[idx_n, 4 * c + 0] = 64 * 32  # first, hi limb (normal wing)
    out[idx_n, 4 * c + 1] = 64      # first, lo limb
    out[idx_t, 4 * c + 2] = 64 * 32
    out[idx_t, 4 * c + 3] = 64
    out[:, 4 * c + 4] = 32          # rounding constant
    return out.astype(ml_dtypes.bfloat16)


def _augmented_inputs(red_t, red_l, size_id: int):
    """[K, nCU] bf16 limb stack matching _augmented_matrix's columns."""

    def wing(b_first, b_second):
        bnd = jnp.concatenate([b_first, b_second], 0).astype(jnp.int32)
        first = bnd[:1]
        row0 = (jnp.zeros_like(first) if size_id == 2
                else VALUE_DC - first)
        off = jnp.concatenate([row0, bnd[1:] - first], 0)
        return off >> 5, off & 31, first >> 5, first & 31

    hn, ln, fhn, fln = wing(red_t, red_l)
    ht, lt, fht, flt = wing(red_l, red_t)
    ones = jnp.ones_like(fhn)
    k = 4 * hn.shape[0] + 5
    parts = [hn, ln, ht, lt, fhn, fln, fht, flt, ones]
    if (-k) % 8:
        parts.append(jnp.zeros(((-k) % 8, hn.shape[1]), jnp.int32))
    return jnp.concatenate(parts, 0).astype(jnp.bfloat16)


def _kernel(mat_ref, x_ref, out_ref):
    acc = jnp.dot(mat_ref[...], x_ref[...],
                  preferred_element_type=jnp.float32)
    p = acc.astype(jnp.int32) >> MIP_SHIFT
    out_ref[...] = jnp.clip(p, 0, SAMPLE_MAX).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=(
    "size_id", "sample_perm", "mode_minor", "cu_tile", "interpret"))
def reduced_prediction(red_t, red_l, size_id: int, *,
                       sample_perm: tuple | None = None,
                       mode_minor: bool = False, cu_tile: int = 1024,
                       interpret: bool = False):
    """All-mode reduced prediction, int16, CU axis PADDED to ``cu_tile``.

    Same contract as soa.reduced_prediction_all_modes — [2M, S, nP]
    ([S, 2M, nP] with ``mode_minor``) — except the returned CU axis keeps
    the tile padding (callers slice, or pass the padded tensors straight
    to the distortion kernel with the same ``cu_tile``).
    """
    m = PRED_MODES[size_id]
    r = REDUCED_PRED_SIZE[size_id]
    s = r * r
    x = _augmented_inputs(red_t, red_l, size_id)
    n = x.shape[-1]
    pad = (-n) % cu_tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    n_cu = n + pad
    mat = jnp.asarray(_augmented_matrix(size_id, sample_perm, mode_minor))
    rows, k = mat.shape
    out = pl.pallas_call(
        _kernel,
        grid=(n_cu // cu_tile,),
        in_specs=[
            pl.BlockSpec((rows, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cu_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cu_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n_cu), jnp.int16),
        interpret=interpret,
    )(mat, x)
    if mode_minor:
        return out.reshape(s, 2 * m, n_cu)
    return out.reshape(2 * m, s, n_cu)
