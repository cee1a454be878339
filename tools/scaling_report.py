"""Multi-chip scaling report: frames/s and efficiency across mesh shapes.

Measurement harness for the multi-device targets (BASELINE.md: >=80%
frames/s scaling efficiency from 1 to N chips/hosts).  Sweeps (data, space)
mesh factorizations of the available device count, runs the sharded engine
on a frame batch per shape, and reports throughput and efficiency vs the
single-device run scaled by device count.

``--processes N`` measures the MULTI-HOST runtime instead: N real
processes (jax.distributed, local coordinator), frames sharded across
processes over DCN, per-process ingest, one global GSPMD dispatch —
efficiency is fps(N processes) / (N * fps(1 process)).

On real hardware run it plainly; without a pod, exercise the mechanics on a
virtual CPU mesh (numbers then measure the harness, not the hardware):

    python tools/scaling_report.py -s 1920x1080 --batch 8
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_report.py -s 512x384 --batch 8 --virtual
    python tools/scaling_report.py -s 512x384 --batch 8 --virtual \
        --processes 2 --local-devices 2
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


def _worker(args) -> None:
    """One process of the --processes run: init jax.distributed, time the
    globally-sharded dispatch, print fps from process 0."""
    import os

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    from vvc_mip_gpu_tpu.parallel import distributed as dist

    dist.initialize(args.coordinator, args.processes, args.process_id)
    mesh = dist.make_global_mesh(args.space)
    w, h = (int(v) for v in args.resolution.lower().split("x"))
    runner = dist.DistributedRunner(w, h, mesh, max_performance=True)
    n_total = args.batch * args.processes
    sl = runner.frame_slice(n_total)
    rng = np.random.default_rng(0)
    local = rng.integers(0, 1024, size=(len(sl), h, w), dtype=np.int32)

    def run(i):
        costs = runner.compute(local ^ (i + 1), n_total)
        # sync: read one addressable shard's scalar
        shard = costs.min_sad_had.addressable_shards[0]
        return int(np.asarray(shard.data).ravel()[0])

    run(0)  # compile
    t0 = time.perf_counter()
    for i in range(args.iters):
        run(i + 1)
    fps = args.iters * n_total / (time.perf_counter() - t0)
    if args.process_id == 0:
        print(json.dumps({"worker_fps": round(fps, 3)}), flush=True)


def _multiprocess_report(args) -> None:
    """Parent of the --processes run: measure 1-process fps, then spawn N
    workers and report aggregate fps + scaling efficiency."""
    import os
    import socket
    import subprocess
    import sys as _sys

    repo = str(Path(__file__).resolve().parent.parent)

    def spawn(n_proc: int) -> float:
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        env = dict(os.environ, JAX_PLATFORMS="cpu" if args.virtual else
                   os.environ.get("JAX_PLATFORMS", ""),
                   PYTHONPATH=repo + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        procs = [subprocess.Popen(
            [_sys.executable, __file__, "-s", args.resolution,
             "--batch", str(args.batch), "--iters", str(args.iters),
             "--space", str(args.space),
             "--local-devices", str(args.local_devices)]
            + (["--virtual"] if args.virtual else [])
            + ["--worker", "--coordinator", f"localhost:{port}",
               "--processes", str(n_proc), "--process-id", str(pid)],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
            for pid in range(n_proc)]
        outs = [p.communicate(timeout=1800)[0] for p in procs]
        for p, out in zip(procs, outs):
            if p.returncode:
                raise RuntimeError(f"worker failed:\n{out[-3000:]}")
        for out in outs:
            for line in out.splitlines():
                if line.startswith('{"worker_fps"'):
                    return float(json.loads(line)["worker_fps"])
        raise RuntimeError(f"no worker_fps line in:\n{outs[0][-2000:]}")

    fps1 = spawn(1)
    fps_n = spawn(args.processes)
    print(json.dumps({
        "resolution": args.resolution,
        "processes": args.processes,
        "local_devices": args.local_devices,
        "fps_1proc": fps1,
        "fps_nproc": fps_n,
        "efficiency": round(fps_n / (fps1 * args.processes), 3),
    }, indent=1))


def _latency_report(args) -> None:
    """Single-frame time-to-result: 1 device vs N devices, class-sharded
    (latency_engine) and space-banded (sharded engine, data=1 space=N).
    On the virtual CPU mesh N devices timeshare one core, so the ideal
    N-device time EQUALS the 1-device time; `overhead` (t_N / t_1) is
    the partitioning + imbalance + assembly cost the design adds, and
    the hardware speedup ceiling is N / overhead."""
    import jax

    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine
    from vvc_mip_gpu_tpu.parallel import ShardedMipCostEngine, make_mesh
    from vvc_mip_gpu_tpu.parallel.latency_engine import LatencyMipCostEngine

    w, h = (int(v) for v in args.resolution.lower().split("x"))
    n_dev = jax.device_count()
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 1024, size=(h, w), dtype=np.int32)

    def timed_ms(run):
        run(0)  # compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            run(i + 1)
        return (time.perf_counter() - t0) / args.iters * 1e3

    eng1 = MipCostEngine(w, h, max_performance=True)
    t1 = timed_ms(lambda i: np.asarray(
        eng1(frame ^ (i + 1)).min_sad_had))
    rows = [{"engine": "single-device", "devices": 1,
             "ms": round(t1, 2), "overhead": 1.0}]

    for n in (2, 4, 8):
        if n > n_dev:
            break
        lat = LatencyMipCostEngine(w, h, jax.devices()[:n])
        t = timed_ms(lambda i, e=lat: e(frame ^ (i + 1)).min_sad_had)
        rows.append({"engine": "class-sharded", "devices": n,
                     "ms": round(t, 2), "overhead": round(t / t1, 3)})
        sp = ShardedMipCostEngine(w, h, make_mesh(1, n),
                                  max_performance=True)
        t = timed_ms(lambda i, e=sp: np.asarray(
            e((frame ^ (i + 1))[None]).min_sad_had))
        rows.append({"engine": "space-banded", "devices": n,
                     "ms": round(t, 2), "overhead": round(t / t1, 3)})
    print(json.dumps({"resolution": args.resolution, "mode": "latency",
                      "devices": n_dev, "rows": rows}, indent=1))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-s", "--resolution", default="1920x1080")
    p.add_argument("--batch", type=int, default=8,
                   help="frames per process per iteration")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--virtual", action="store_true",
                   help="force a CPU host-device mesh before importing jax")
    p.add_argument("--processes", type=int, default=0,
                   help="multi-host mode: total process count")
    p.add_argument("--local-devices", type=int, default=1,
                   help="multi-host mode: devices per process (virtual)")
    p.add_argument("--space", type=int, default=1,
                   help="multi-host mode: spatial mesh axis per host")
    p.add_argument("--latency", action="store_true",
                   help="latency mode: ONE frame over N devices — "
                        "class-sharded vs space-banded time-to-result")
    p.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--coordinator", default=None, help=argparse.SUPPRESS)
    p.add_argument("--process-id", type=int, default=0,
                   help=argparse.SUPPRESS)
    args = p.parse_args()
    if args.worker:
        _worker(args)
        return
    if args.processes:
        _multiprocess_report(args)
        return
    if args.virtual:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    if args.latency:
        _latency_report(args)
        return

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
