"""Latency-mode engine: ONE frame across N devices by shape-class sharding.

The spatial (CTU-row band) engine pays intrinsic geometry costs in
latency mode: frame heights must pad to ``space * 128`` (a 1080p frame is
9 CTU rows — 8-way banding computes 16, a 1.78x blowup), plus a halo
``ppermute``.  This engine shards the OTHER embarrassingly-parallel axis
the cost search exposes: the 17 CU shape classes are mutually independent
given the frame, and their per-group cost blocks concatenate into the
strided layout (reference: intra.cl dispatches each class as separate
kernel enqueues too, main.cpp:886-992 — but serially on one GPU).

Design: the frame is replicated (a 1080p int32 frame is ~8 MB; the COST
tensors are the big arrays, and those stay class-sharded until export),
each device runs one jitted program computing only its class subset
(phase splits restricted to the strides those classes need —
cost_engine.compute_blocks), and dispatches run concurrently because JAX
dispatch is async per device.  No collective, no halo, no geometry
padding: the only imbalance is the static class partition, bounded by
max-class-weight / total (the 8x8 class, ~18% of frame ops at 1080p).

Partition weights default to the analytic per-class element-op counts of
tools/roofline.py (the VPU-bound workload model); pass measured
per-class milliseconds via ``weights`` to repartition on profile data.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from vvc_mip_gpu_tpu.constants import (
    GROUPS,
    num_ctus,
    shape_classes,
)
from vvc_mip_gpu_tpu.models.cost_engine import (
    FrameCosts,
    _validity_mask,
    compute_blocks,
)


def class_weights(width: int, height: int) -> list[float]:
    """Analytic per-class element-op weights (tools/roofline.py op model:
    diff + SAD + butterflies + SATD accumulate per sample per mode, plus
    the upsample interpolation and prediction epilogue)."""
    _, _, n_ctus = num_ctus(width, height)
    out = []
    for cl in shape_classes():
        h, w, r = cl.height, cl.width, cl.reduced_pred_size
        n_cu = cl.cus_per_ctu * n_ctus
        up = (4 * r * w if r < w else 0) + (4 * h * w if (r < h or r < w)
                                            else 0)
        ops_mode = 9 * h * w + up + 4 * r * r + 6
        out.append(float(n_cu * cl.total_modes * ops_mode))
    return out


def partition_classes(n_parts: int,
                      weights: list[float]) -> list[tuple[int, ...]]:
    """Greedy LPT partition of class indices into ``n_parts`` subsets;
    parts beyond the class count come back empty."""
    order = sorted(range(len(weights)), key=lambda i: -weights[i])
    loads = [0.0] * n_parts
    parts: list[list[int]] = [[] for _ in range(n_parts)]
    for i in order:
        j = int(np.argmin(loads))
        loads[j] += weights[i]
        parts[j].append(i)
    return [tuple(sorted(p)) for p in parts]


def _subset_fn(frame, ref, *, width, height, classes, max_performance,
               share_ref):
    r = frame if share_ref else ref
    sad, satd, msh = compute_blocks(
        frame, r, r[0], True, width, height,
        max_performance=max_performance, classes=classes)
    if max_performance:
        return {str(k): v for k, v in msh.items()}
    return {str(k): (sad[k], satd[k]) for k in sad}


class LatencyMipCostEngine:
    """Single-frame, multi-device cost search (latency mode).

    >>> eng = LatencyMipCostEngine(1920, 1080, jax.devices())
    >>> costs = eng(frame)          # frame: [H, W]
    """

    def __init__(self, width: int, height: int, devices=None,
                 max_performance: bool = True,
                 weights: list[float] | None = None):
        self.width = width
        self.height = height
        self.max_performance = max_performance
        # Host-local default: this engine places per-device programs with
        # device_put (no collectives), which requires addressable
        # devices — jax.devices() would include remote hosts' chips in a
        # multi-process runtime.
        devices = list(devices if devices is not None
                       else jax.local_devices())
        weights = weights if weights is not None else class_weights(
            width, height)
        parts = partition_classes(len(devices), weights)
        self._parts = [(d, p) for d, p in zip(devices, parts) if p]
        self._fns = [
            jax.jit(functools.partial(
                _subset_fn, width=width, height=height, classes=p,
                max_performance=max_performance, share_ref=share))
            for share in (True, False)
            for _, p in self._parts
        ]
        n = len(self._parts)
        self._fns_shared, self._fns_ref = self._fns[:n], self._fns[n:]

    def dispatch(self, frame, ref_frame=None) -> list:
        """Enqueue every device's class-subset program (async) and
        return the raw per-device output dicts — still device arrays.
        Pair with :meth:`assemble`; callers that want stage-accurate
        timing (e.g. the CLI's ENQUEUE/READ split) use the pair."""
        share = ref_frame is None
        # ONE host-side conversion, then a direct per-device put of the
        # numpy buffer (an in-loop jnp.asarray would upload the frame to
        # the default device N times plus a D2D hop — measurable on the
        # latency-critical path this engine exists for).
        frame = np.asarray(frame)
        if not share:
            ref_frame = np.asarray(ref_frame)
        outs = []
        for (dev, _), fn in zip(self._parts,
                                self._fns_shared if share
                                else self._fns_ref):
            fd = jax.device_put(frame, dev)
            rd = fd if share else jax.device_put(ref_frame, dev)
            outs.append(fn(fd, rd))  # async: devices run concurrently
        return outs

    def assemble(self, outs) -> FrameCosts:
        """Read back and concatenate the per-device blocks (blocks until
        every device finishes)."""
        blocks: dict[int, object] = {}
        for out in outs:
            for k, v in out.items():
                blocks[int(k)] = v
        if self.max_performance:
            msh = np.concatenate(
                [np.asarray(blocks[g.index]) for g in GROUPS], axis=1)
            sad = satd = None
        else:
            sad = np.concatenate(
                [np.asarray(blocks[g.index][0]) for g in GROUPS], axis=1)
            satd = np.concatenate(
                [np.asarray(blocks[g.index][1]) for g in GROUPS], axis=1)
            msh = np.minimum(2 * sad, satd)
        return FrameCosts(
            sad=sad, satd=satd, min_sad_had=msh,
            valid=_validity_mask(self.width, self.height))

    def __call__(self, frame, ref_frame=None) -> FrameCosts:
        return self.assemble(self.dispatch(frame, ref_frame))
