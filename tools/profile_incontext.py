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
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

import tools.profile_stages as ps
from vvc_mip_gpu_tpu.models.cost_engine import _compute, compute_blocks
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

    e2e = ps.device_ms(
        lambda fr: _compute(fr, fr, width=W, height=H,
                            max_performance=True).min_sad_had, frame)
    print(f"e2e (max-perf): {e2e:8.2f} ms", flush=True)

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


if __name__ == "__main__":
    main()
