"""JAX implementation of the 8-variant low-pass filter family.

Semantics documented in golden/filters_golden.py (bit-identical to it by
construction: same accumulation order, dtypes, and divisor rules).  The
whole-frame filter is expressed as shift-and-accumulate over statically
padded slabs — XLA fuses the taps into a single VPU pass; the per-pixel
divisor planes are compile-time constants except the 2D variants' dropped-tap
scale, which is itself a tiny conv over a constant validity plane folded at
compile time.

TPU-native equivalent of reference kernels filterFrame_* (intra.cl:1175-3824
and the Mali-tiled intra_arm.cl variants — tiling is a GPU work-group
concern with no TPU counterpart, so there is no separate "_arm" family here).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from vvc_mip_gpu_tpu.constants import AVAILABLE_FILTERS
from vvc_mip_gpu_tpu.golden import filters_golden as fg


def _shifted(slab, dy: int, dx: int):
    """slab sample at (y+dy, x+dx), zero outside; same shape."""
    h, w = slab.shape
    padded = jnp.pad(slab, ((max(0, -dy), max(0, dy)),
                            (max(0, -dx), max(0, dx))))
    y0, x0 = max(0, dy), max(0, dx)
    return padded[y0:y0 + h, x0:x0 + w]


def _filter_jnp(frame, filter_type: str, kernel_idx: int):
    h, w = frame.shape
    is5 = "5x5" in filter_type
    as_float = "float" in filter_type
    lib = fg.CONV_KERNELS_5x5 if is5 else fg.CONV_KERNELS_3x3
    kernel = lib[kernel_idx]
    k = kernel.shape[0]
    r = k // 2
    dtype = jnp.float32 if as_float else jnp.int32
    frame = frame.astype(dtype)

    if "2d" in filter_type:
        acc = jnp.zeros((h, w), dtype)
        for i in range(k):
            for j in range(k):
                acc = acc + dtype(kernel[i, j]) * _shifted(frame, i - r, j - r)
        # Valid-coefficient divisor: constant plane, computed with numpy.
        ones = np.ones((h, w), np.int64)
        scale_np = np.zeros((h, w), np.int64)
        for i in range(k):
            for j in range(k):
                scale_np += int(kernel[i, j]) * fg._shifted(ones, i - r, j - r)
        scale = jnp.asarray(scale_np.astype(
            np.float32 if as_float else np.int32))
    else:
        if is5:
            k1d = kernel[0]
            scale_np = fg._scale_1d_5x5(kernel, h, w, as_float)
        else:
            scale_np, (k0, k1) = fg._scale_1d_3x3(kernel[0], h, w, as_float)
            k1d = np.array([k0, k1, k0])
        acc_h = jnp.zeros((h, w), dtype)
        for j, c in enumerate(k1d):
            acc_h = acc_h + dtype(c) * _shifted(frame, 0, j - r)
        acc = jnp.zeros((h, w), dtype)
        for i, c in enumerate(k1d):
            acc = acc + dtype(c) * _shifted(acc_h, i - r, 0)
        scale = jnp.asarray(np.asarray(scale_np).astype(
            np.float32 if as_float else np.int32))

    if as_float:
        return jnp.floor(acc / scale + jnp.float32(0.5)).astype(jnp.int32)
    return (acc + scale // 2) // scale


@functools.cache
def _compiled(filter_type: str, kernel_idx: int, h: int, w: int):
    return jax.jit(functools.partial(
        _filter_jnp, filter_type=filter_type, kernel_idx=kernel_idx))


@functools.cache
def _compiled_batch(filter_type: str, kernel_idx: int, h: int, w: int):
    return jax.jit(jax.vmap(functools.partial(
        _filter_jnp, filter_type=filter_type, kernel_idx=kernel_idx)))


def _check_args(filter_type: str, kernel_idx: int) -> None:
    if filter_type not in AVAILABLE_FILTERS:
        raise ValueError(f"unknown filter {filter_type!r}; "
                         f"available: {list(AVAILABLE_FILTERS)}")
    n_kernels = 3 if "5x5" in filter_type else 5
    if not 0 <= kernel_idx < n_kernels:
        raise ValueError(f"kernel_idx {kernel_idx} out of range for "
                         f"{filter_type} (0..{n_kernels - 1})")


def filter_frame(frame, filter_type: str, kernel_idx: int = 0):
    """Apply one of the 8 filter variants to an [H, W] frame (10-bit)."""
    _check_args(filter_type, kernel_idx)
    frame = jnp.asarray(frame)
    return _compiled(filter_type, kernel_idx, *frame.shape)(frame)


def filter_frames(frames, filter_type: str, kernel_idx: int = 0):
    """Batched filter: [N, H, W] -> [N, H, W] int32 on DEVICE in one
    vmapped jit — the production alternative-samples path (no per-frame
    dispatch, no host round trip; the engine consumes the device array
    directly).  Reference equivalent: the filterFrame_* enqueue loop,
    main.cpp:684-791."""
    _check_args(filter_type, kernel_idx)
    frames = jnp.asarray(frames)
    return _compiled_batch(filter_type, kernel_idx,
                           *frames.shape[1:])(frames)
