"""Multi-chip scaling report: frames/s and efficiency across mesh shapes.

Measurement harness for the multi-device targets (BASELINE.md: >=80%
frames/s scaling efficiency from 1 to N chips).  Sweeps (data, space) mesh
factorizations of the available device count, runs the sharded engine on a
frame batch per shape, and reports throughput and efficiency vs the
single-device run scaled by device count.

On real hardware run it plainly; without a pod, exercise the mechanics on a
virtual CPU mesh (numbers then measure the harness, not the hardware):

    python tools/scaling_report.py -s 1920x1080 --batch 8
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_report.py -s 512x384 --batch 8 --virtual
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def factorizations(n: int):
    out = []
    d = 1
    while d <= n:
        if n % d == 0:
            out.append((d, n // d))
        d *= 2
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-s", "--resolution", default="1920x1080")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--virtual", action="store_true",
                   help="force a CPU host-device mesh before importing jax")
    args = p.parse_args()
    if args.virtual:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine
    from vvc_mip_gpu_tpu.parallel import ShardedMipCostEngine, make_mesh

    w, h = (int(v) for v in args.resolution.lower().split("x"))
    n_dev = jax.device_count()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 1024, size=(args.batch, h, w), dtype=np.int32)

    def timed(run):
        run(0)  # compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            run(i + 1)
        return args.iters * args.batch / (time.perf_counter() - t0)

    # single-device baseline (max-performance path, like bench.py)
    eng1 = MipCostEngine(w, h, max_performance=True)

    def run_single(i):
        outs = [eng1(f ^ (i + 1)) for f in frames]
        return int(np.asarray(outs[-1].min_sad_had)[0, 0])

    fps1 = timed(run_single)
    rows = [{"mesh": "1 device", "fps": round(fps1, 3), "efficiency": 1.0}]

    for n_data, n_space in factorizations(n_dev):
        if n_data * n_space == 1:
            continue
        if args.batch % n_data:
            continue
        mesh = make_mesh(n_data, n_space)
        eng = ShardedMipCostEngine(w, h, mesh, max_performance=True)

        def run_shard(i, eng=eng):
            out = eng(frames ^ (i + 1))
            return int(np.asarray(out.min_sad_had)[0, 0, 0])

        fps = timed(run_shard)
        rows.append({
            "mesh": f"data={n_data} space={n_space}",
            "fps": round(fps, 3),
            "efficiency": round(fps / (fps1 * n_data * n_space), 3),
        })
    print(json.dumps({"resolution": args.resolution,
                      "devices": n_dev, "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
