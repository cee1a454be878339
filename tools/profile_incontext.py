"""In-context per-class cost attribution for the 1080p pipeline.

The r3 stage isolates (tools/profile_stages.py) double-counted: their sum
(~14.5 ms) exceeded the measured e2e (8.6 ms) by >40%, so they could not
rank optimization targets (VERDICT r3 weak #2).  This harness instead
times each shape class through the REAL engine path —
``compute_blocks(classes=(i,))`` — so a class's number includes exactly
what the e2e pays for it: its phase splits, gathers, fused kernel, and
cost reorder, scheduled by XLA the same way the full pipeline schedules
them.  Additivity is checkable: sum(per-class) minus the shared
phase-split overcount should land near the measured e2e.

Usage:
  python tools/profile_incontext.py            # only-class-i sweep + e2e
  python tools/profile_incontext.py --loo      # leave-one-out deltas too
  python tools/profile_incontext.py --ablate   # e2e with orig/bnd gathers
                                               # replaced by broadcasts
  python tools/profile_incontext.py --batch N  # vmapped N-frame pipeline,
                                               # per-frame ms (grid-batching
                                               # amortization: vmap of
                                               # pallas_call prepends a grid
                                               # axis, so per-launch fixed
                                               # cost is paid once per class
                                               # per BATCH, not per frame)
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

import tools.profile_stages as ps
from vvc_mip_gpu_tpu.models.cost_engine import _compute, compute_blocks
from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
from vvc_mip_gpu_tpu.ops.geometry import class_plans


def main() -> None:
    from vvc_mip_gpu_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    W, H = ps.W, ps.H
    rng = np.random.default_rng(0)
    frame = jax.device_put(jnp.asarray(
        rng.integers(0, 1024, size=(H, W), dtype=np.int32)))
    plans = class_plans(W, H)
    n = len(plans)

    def subset(fr, cls):
        _, _, msh = compute_blocks(fr, fr, fr[0], True, W, H,
                                   max_performance=True, classes=cls)
        return list(msh.values())

    if "--batch" in sys.argv:
        # Per-frame ms of the vmapped B-frame pipeline (the CLI's
        # compute_batch path).  Compared against the single-frame e2e,
        # the delta is exactly the per-launch/per-dispatch fixed cost
        # the small-CU classes pay 17x per frame (VERDICT r4 item 1's
        # 'batch multiple frames into one kernel grid').  With --class,
        # measures one class's vmapped in-context cost per frame.
        b = int(sys.argv[sys.argv.index("--batch") + 1])
        frames_b = jax.device_put(jnp.asarray(
            rng.integers(0, 1024, size=(b, H, W), dtype=np.int32)))

        if "--class" in sys.argv:
            want = sys.argv[sys.argv.index("--class") + 1]
            ww, hh = (int(v) for v in want.split("x"))
            i = next(i for i, cp in enumerate(plans)
                     if cp.shape.width == ww and cp.shape.height == hh)
            ms = ps.device_ms(
                lambda fr: jax.vmap(lambda x: subset(x, (i,)))(fr),
                frames_b)
            print(f"only class {want} vmapped batch {b}: {ms:8.2f} ms "
                  f"= {ms / b:6.2f} ms/frame", flush=True)
            return

        def run_b(fr):
            return jax.vmap(
                lambda x: _compute(x, x, width=W, height=H,
                                   max_performance=True).min_sad_had)(fr)

        ms = ps.device_ms(run_b, frames_b)
        print(f"e2e vmapped batch {b} (max-perf): {ms:8.2f} ms "
              f"= {ms / b:6.2f} ms/frame", flush=True)
        return

    if "--class" in sys.argv:
        # Single-class in-context measurement (for VVC_CU_TILES A/Bs).
        # With --ablate: repeat with the orig gathers, boundary gathers,
        # and both replaced by broadcasts — the deltas are THIS class's
        # in-context gather costs (the family-level ablation can't say
        # which classes pay them).
        want = sys.argv[sys.argv.index("--class") + 1]
        ww, hh = (int(v) for v in want.split("x"))
        i = next(i for i, cp in enumerate(plans)
                 if cp.shape.width == ww and cp.shape.height == hh)
        import os
        ms = ps.device_ms(lambda fr: subset(fr, (i,)), frame)
        print(f"only class {want} "
              f"[VVC_CU_TILES={os.environ.get('VVC_CU_TILES', '')}]: "
              f"{ms:6.2f} ms", flush=True)
        if "--ablate" in sys.argv:
            # In only-class mode the jit compiles only this class's
            # strides' phase splits, so the splits delta is class-own.
            for label, patch in (("orig", _patch_orig),
                                 ("bnd", _patch_bnd),
                                 ("both", _patch_both),
                                 ("splits", _patch_splits)):
                with patch():
                    ab = ps.device_ms(lambda fr: subset(fr, (i,)), frame)
                print(f"  {label} gathers -> broadcast: {ab:6.2f} ms "
                      f"(in-context cost {ms - ab:+5.2f})", flush=True)
        return

    e2e = ps.device_ms(
        lambda fr: _compute(fr, fr, width=W, height=H,
                            max_performance=True).min_sad_had, frame)
    print(f"e2e (max-perf): {e2e:8.2f} ms", flush=True)

    if "--ablate" in sys.argv:
        _ablate(frame, e2e, W, H)
        return

    total = 0.0
    per_class = []
    for i, cp in enumerate(plans):
        s = cp.shape
        ms = ps.device_ms(lambda fr, _i=i: subset(fr, (_i,)), frame)
        total += ms
        per_class.append(ms)
        print(f"  only class {i:2d} {s.width:3d}x{s.height:<3d} "
              f"sid{s.size_id}: {ms:6.2f} ms", flush=True)
    print(f"sum(only-class): {total:8.2f} ms "
          f"(vs e2e {e2e:.2f}; excess = shared splits counted "
          f"{n}x + assembly)", flush=True)

    if "--loo" in sys.argv:
        for i, cp in enumerate(plans):
            s = cp.shape
            cls = tuple(j for j in range(n) if j != i)
            ms = ps.device_ms(lambda fr, _c=cls: subset(fr, _c), frame)
            print(f"  without class {i:2d} {s.width:3d}x{s.height:<3d} "
                  f"sid{s.size_id}: {ms:6.2f} ms (delta "
                  f"{e2e - ms:+6.2f})", flush=True)


import contextlib


@contextlib.contextmanager
def _patch_orig():
    """Replace the original-sample gathers with same-shape BROADCASTS of
    an input-derived scalar (not foldable, not DCE-able; the Pallas
    inputs still materialize, so only the relayout work is removed)."""
    orig_o4 = soa.gather_originals_phase4
    orig_og = soa.gather_originals

    def dummy_o4(f4, plan, row_perm=None, order="yx"):
        n = plan.n_rows * plan.n_cols
        return jnp.broadcast_to(f4[0, 0, 0],
                                (plan.height * plan.width, n))

    def dummy_og(frame_pad, plan, row_perm=None, col_perm=None,
                 order="raster"):
        n = plan.n_rows * plan.n_cols
        return jnp.broadcast_to(frame_pad[0, 0],
                                (plan.height * plan.width, n))

    soa.gather_originals_phase4 = dummy_o4
    soa.gather_originals = dummy_og
    try:
        yield
    finally:
        soa.gather_originals_phase4 = orig_o4
        soa.gather_originals = orig_og


@contextlib.contextmanager
def _patch_bnd():
    """Replace the boundary gathers (top, left, fixups, fetch_rows) with
    same-shape broadcasts."""
    from vvc_mip_gpu_tpu.ops.pallas import gather as pg

    saved = (soa.gather_top_phase4, soa.gather_left_phase4,
             soa.left_fixups4, soa.gather_boundaries, pg.fetch_rows)

    def dummy_top(f4, plan, is_top, t_mod4=True):
        n = plan.n_rows * plan.n_cols
        return jnp.broadcast_to(f4[0, 0, 0], (plan.width, n))

    def dummy_left(f4, plan):
        n = plan.n_rows * plan.n_cols
        return jnp.broadcast_to(f4[0, 0, 0], (plan.height, n))

    def dummy_fix(ref_l, f4, plan, is_top):
        return ref_l

    def dummy_bnd(ref_pad, plan, is_top):
        n = plan.n_rows * plan.n_cols
        return (jnp.broadcast_to(ref_pad[0, 0], (plan.width, n)),
                jnp.broadcast_to(ref_pad[0, 0], (plan.height, n)))

    def dummy_fetch(f4, *, runs, oy, sy, h, n_r, c_log, interpret=False):
        p = sum(ln for _, ln in runs)
        return jnp.broadcast_to(f4[0, 0, 0], (p * h, n_r * c_log))

    soa.gather_top_phase4 = dummy_top
    soa.gather_left_phase4 = dummy_left
    soa.left_fixups4 = dummy_fix
    soa.gather_boundaries = dummy_bnd
    pg.fetch_rows = dummy_fetch
    try:
        yield
    finally:
        (soa.gather_top_phase4, soa.gather_left_phase4, soa.left_fixups4,
         soa.gather_boundaries, pg.fetch_rows) = saved


@contextlib.contextmanager
def _patch_both():
    with _patch_orig(), _patch_bnd():
        yield


@contextlib.contextmanager
def _patch_splits():
    """Replace the per-stride phase splits with broadcasts (keeps
    gathers, removes the frame relayouts)."""
    split0 = soa.phase_split4

    def dummy_split(a, stride, pad_lanes=False, pad_rows=0):
        f = split0(a[:1, :stride], stride)
        out = jnp.broadcast_to(
            a[0, 0], (stride, a.shape[0] + pad_rows,
                      a.shape[1] // stride)).astype(f.dtype)
        if pad_lanes:
            pc = (-out.shape[2]) % 128
            out = jnp.pad(out, ((0, 0), (0, 0), (0, pc)))
        return out

    soa.phase_split4 = dummy_split
    try:
        yield
    finally:
        soa.phase_split4 = split0


def _ablate(frame, e2e: float, W: int, H: int) -> None:
    """e2e with each gather family replaced by broadcasts.  The delta vs
    the true e2e is the family's real in-context cost — what the
    pipeline would gain if that data movement were free."""

    def run(fr):
        return _compute(fr, fr, width=W, height=H,
                        max_performance=True).min_sad_had

    with _patch_orig():
        ms = ps.device_ms(run, frame)
        print(f"e2e, orig gathers -> broadcast: {ms:8.2f} ms "
              f"(orig in-context cost {e2e - ms:+5.2f})", flush=True)

    with _patch_bnd():
        ms = ps.device_ms(run, frame)
        print(f"e2e, boundary gathers -> broadcast: {ms:8.2f} ms "
              f"(bnd in-context cost {e2e - ms:+5.2f})", flush=True)

    # Both families at once (the residue is splits + kernels + reorder +
    # assembly).
    with _patch_both():
        ms = ps.device_ms(run, frame)
        print(f"e2e, ALL gathers -> broadcast: {ms:8.2f} ms "
              f"(gathers in-context cost {e2e - ms:+5.2f})", flush=True)

    # Phase splits -> broadcast (keeps gathers, removes the per-stride
    # frame relayouts).
    with _patch_splits():
        ms = ps.device_ms(run, frame)
        print(f"e2e, phase splits -> broadcast: {ms:8.2f} ms "
              f"(splits in-context cost {e2e - ms:+5.2f})", flush=True)

if __name__ == "__main__":
    main()
