"""JAX/XLA ops for the MIP pipeline (boundary gather, prediction, upsample,
distortion).

All arithmetic is exact integer (int32 accumulators, arithmetic shifts) so
results are bit-identical to the golden model / reference semantics.  The
hot compute is expressed as dense batched tensor algebra over the shape-class
layout (see ops/geometry.py): prediction is one integer einsum against the
MIP weight matrix per class (reference equivalent: the per-work-item dot
products at intra.cl:457-479), upsampling is vectorized gather-free
interpolation (intra.cl:815-895), SATD is a pair of constant 4x4 matmuls
(kernel_aux_functions.cl:142-249).
"""

from __future__ import annotations

import numpy as np

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

_HADAMARD4 = np.array(
    [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]], np.int32)


# ---------------------------------------------------------------------------
# Gathers (structured two-axis takes with static indices)
# ---------------------------------------------------------------------------

def gather_boundaries(ref, plan: GroupPlan):
    """Complete top/left boundaries for every CU of a group.

    Returns (ref_t [n_rows, n_cols, w], ref_l [n_rows, n_cols, h]) in the
    lattice layout, implementing the VVC edge-padding rules
    (reference: intra.cl:96-107, 232-243).
    """
    ref_ext = jnp.concatenate([ref[:1], ref], axis=0)  # dummy halo row
    return gather_boundaries_halo(ref_ext, plan, is_top=True)


def gather_boundaries_halo(ref_ext, plan: GroupPlan, is_top):
    """Boundary gather against a halo-extended reference slab.

    ``ref_ext`` is [H_local + 1, W]: row 0 is the sample row directly above
    this slab (exchanged from the neighbor shard in the spatially-sharded
    engine; a dummy for a whole frame).  ``is_top`` says whether local row 0
    is the frame's global row 0; it may be a traced bool scalar, in which
    case the frame-top padding rules are applied via a select — the
    TPU-native equivalent of the reference's per-work-item edge branches
    (intra.cl:96-107).
    """
    w, h = plan.width, plan.height
    # Row directly above each CU row lives at ref_ext[yc] (halo offset +1).
    top_rows = jnp.take(ref_ext, plan.yc, axis=0)
    col_idx = (plan.xc[:, None] + np.arange(w)[None, :]).ravel()
    ref_t = jnp.take(top_rows, col_idx, axis=1).reshape(
        plan.n_rows, plan.n_cols, w)
    # Frame-top padding: every sample <- sample left of the CU's first
    # sample in frame row 0 (= local row 0 = ref_ext[1] when is_top).
    top_pad = jnp.where(plan.xc > 0,
                        ref_ext[1, np.maximum(plan.xc - 1, 0)], VALUE_DC)
    top_fix = jnp.logical_and(jnp.asarray(plan.yc == 0), is_top)
    ref_t = jnp.where(top_fix[:, None, None], top_pad[None, :, None], ref_t)

    # Left: the column left of each CU column, sliced per CU row window.
    left_cols = jnp.take(ref_ext, np.maximum(plan.xc - 1, 0), axis=1)
    row_idx = (plan.yc[:, None] + 1 + np.arange(h)[None, :]).ravel()
    ref_l = jnp.take(left_cols, row_idx, axis=0).reshape(
        plan.n_rows, h, plan.n_cols)
    ref_l = jnp.moveaxis(ref_l, 1, 2)  # [n_rows, n_cols, h]
    # Frame-left padding: sample above the CU's first sample (ref_ext[yc, 0]
    # is the row above, including via the halo); DC at the frame corner.
    left_pad = jnp.where(jnp.logical_and(jnp.asarray(plan.yc == 0), is_top),
                         VALUE_DC, ref_ext[plan.yc, 0])
    ref_l = jnp.where((plan.xc > 0)[None, :, None], ref_l,
                      left_pad[:, None, None])
    return ref_t, ref_l


def gather_originals(frame, plan: GroupPlan):
    """Original samples of every CU of a group; [n_rows, n_cols, h, w]."""
    w, h = plan.width, plan.height
    row_idx = (plan.yc[:, None] + np.arange(h)[None, :]).ravel()
    col_idx = (plan.xc[:, None] + np.arange(w)[None, :]).ravel()
    tile = jnp.take(jnp.take(frame, row_idx, axis=0), col_idx, axis=1)
    tile = tile.reshape(plan.n_rows, h, plan.n_cols, w)
    return jnp.moveaxis(tile, 1, 2)  # [n_rows, n_cols, h, w]


# ---------------------------------------------------------------------------
# Reduced boundaries and prediction
# ---------------------------------------------------------------------------

def reduce_boundary(samples, bnd_size: int):
    """Downsample-average along the last axis; reference: intra.cl:127-140."""
    n = samples.shape[-1]
    ds = n // bnd_size
    if ds == 1:
        return samples
    log2 = ds.bit_length() - 1
    off = 1 << (log2 - 1)
    grouped = samples.reshape(samples.shape[:-1] + (bnd_size, ds))
    return (grouped.sum(-1, dtype=jnp.int32) + off) >> log2


def reduced_prediction_all_modes(red_t, red_l, size_id: int):
    """Reduced prediction for all 2M modes: [..., 2M, R, R] int32.

    One integer einsum against the (padded) MIP weight matrix; the
    input-offset / matrix-offset algebra follows intra.cl:443-482.  Mode
    axis: non-transposed modes first, then transposed.
    """
    r = REDUCED_PRED_SIZE[size_id]
    m = PRED_MODES[size_id]
    mat = jnp.asarray(mip_weights.padded_matrix(size_id), jnp.int32)
    bnd = jnp.stack([
        jnp.concatenate([red_t, red_l], -1),
        jnp.concatenate([red_l, red_t], -1),
    ], axis=-2).astype(jnp.int32)  # [..., 2, C]
    first = bnd[..., :1]
    off = bnd - first
    s0 = jnp.zeros_like(first[..., 0]) if size_id == 2 else (1 << 9) - first[..., 0]
    off = off.at[..., 0].set(s0)
    offset_term = ((1 << (MIP_SHIFT_MATRIX - 1))
                   - MIP_OFFSET_MATRIX * off.sum(-1))
    acc = jnp.einsum("...tc,msc->...tms", off, mat,
                     preferred_element_type=jnp.int32)
    pred = (((acc + offset_term[..., None, None]) >> MIP_SHIFT_MATRIX)
            + first[..., None])
    pred = jnp.clip(pred, 0, SAMPLE_MAX)
    pred = pred.reshape(pred.shape[:-1] + (r, r))  # [..., 2, M, R, R]
    pred = jnp.concatenate(
        [pred[..., 0, :, :, :], jnp.swapaxes(pred[..., 1, :, :, :], -1, -2)],
        axis=-3)  # [..., 2M, R, R]
    return pred


# ---------------------------------------------------------------------------
# Upsampling
# ---------------------------------------------------------------------------

def _interp(before, after, up: int, pos):
    if up == 1:
        return after
    log2 = up.bit_length() - 1
    rnd = 1 << (log2 - 1)
    return ((up - pos) * before + pos * after + rnd) >> log2


def upsample_all(pred, ref_t, ref_l, w: int, h: int):
    """Upsample [..., 2M, R, R] reduced predictions to [..., 2M, h, w].

    Horizontal pass against the left boundary on anchor rows, then vertical
    against the top boundary (reference: intra.cl:815-895).  Interpolation
    positions/windows are static, so this lowers to shifts/multiplies plus
    static gathers on the last axes.
    """
    r = pred.shape[-1]
    up_h = w // r
    up_v = h // r
    ref_l_anchor = ref_l[..., None, up_v - 1::up_v]  # [..., 1, R]
    lead = jnp.broadcast_to(ref_l_anchor, pred.shape[:-2] + (r,))[..., None]
    ext = jnp.concatenate([lead.astype(pred.dtype), pred], axis=-1)
    x = np.arange(w)
    j = x // up_h
    o = jnp.asarray(x % up_h + 1, jnp.int32)
    anchors = _interp(ext[..., j], ext[..., j + 1], up_h, o)
    top = jnp.broadcast_to(ref_t[..., None, None, :].astype(pred.dtype),
                           anchors.shape[:-2] + (1, w))
    ext2 = jnp.concatenate([top, anchors], axis=-2)  # [..., 2M, R+1, w]
    y = np.arange(h)
    k = y // up_v
    ov = jnp.asarray((y % up_v + 1)[:, None], jnp.int32)
    return _interp(ext2[..., k, :], ext2[..., k + 1, :], up_v, ov)


# ---------------------------------------------------------------------------
# Distortion
# ---------------------------------------------------------------------------

def distortion(orig, pred):
    """(SAD, SATD) over trailing [h, w]; VTM mean-scaled 4x4 Hadamard SATD."""
    diff = (orig - pred).astype(jnp.int32)
    sad = jnp.abs(diff).sum((-1, -2))
    h, w = diff.shape[-2:]
    blocks = diff.reshape(diff.shape[:-2] + (h // 4, 4, w // 4, 4))
    blocks = jnp.swapaxes(blocks, -2, -3)  # [..., h/4, w/4, 4, 4]
    hmat = jnp.asarray(_HADAMARD4)
    t = jnp.einsum("ik,...kl,jl->...ij", hmat, blocks, hmat,
                   preferred_element_type=jnp.int32)
    dc = jnp.abs(t[..., 0, 0])
    block_satd = jnp.abs(t).sum((-1, -2)) - dc + (dc >> 2)
    block_satd = (block_satd + 1) >> 1
    return sad, block_satd.sum((-1, -2))
