"""Power tracer: run the engine while polling an external power meter.

TPU-native analog of the reference's powerTracer_{NVIDIA,AMD}.py: those fork
the engine binary and poll nvidia-smi/rocm-smi at ~1 ms
(powerTracer_NVIDIA.py:9-25).  TPUs expose no vendor SMI in this container,
so the meter command is pluggable (--power-cmd): anything printing one watt
value per invocation (e.g. a host PDU query, `cat /sys/...`, or a cloud
monitoring probe).  The trace CSV (timestamp_s,power_w) pairs with the
engine's --TracePower stdout markers, consumed by tools/compute_energy.py.

Like the reference, sweeps the frame count (1..16 at 1080p, 1..4 at 4K;
powerTracer_NVIDIA.py:32-80).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import threading
import time


def poll_power(cmd: str, out_path: str, stop: threading.Event,
               interval_s: float) -> None:
    with open(out_path, "w") as f:
        f.write("timestamp_s,power_w\n")
        while not stop.is_set():
            try:
                val = subprocess.run(
                    cmd, shell=True, capture_output=True, text=True,
                    timeout=5).stdout.strip().split()[0]
                f.write(f"{time.time():.6f},{val}\n")
            except Exception:
                pass
            stop.wait(interval_s)


def run_once(engine_args: list[str], power_cmd: str, trace_prefix: str,
             interval_s: float) -> None:
    stop = threading.Event()
    poller = threading.Thread(
        target=poll_power,
        args=(power_cmd, f"{trace_prefix}power.csv", stop, interval_s))
    poller.start()
    try:
        with open(f"{trace_prefix}stdout.log", "w") as log:
            subprocess.run(
                [sys.executable, "-m", "vvc_mip_gpu_tpu.cli", "--TracePower",
                 *engine_args],
                stdout=log, check=True)
    finally:
        stop.set()
        poller.join()


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--power-cmd", required=True,
                   help="shell command printing instantaneous power (W)")
    p.add_argument("--resolution", default="1920x1080")
    p.add_argument("--interval-ms", type=float, default=50.0)
    p.add_argument("--max-frames", type=int, default=None,
                   help="sweep 1..N frames (default 16 @1080p, 4 @4K)")
    p.add_argument("--prefix", default="power_")
    p.add_argument("engine_args", nargs="*",
                   help="extra args forwarded to the engine CLI")
    args = p.parse_args()

    max_frames = args.max_frames or (4 if "2160" in args.resolution else 16)
    for n in range(1, max_frames + 1):
        prefix = f"{args.prefix}{args.resolution}_f{n}_"
        run_once(["-s", args.resolution, "-f", str(n), "--Synthetic",
                  "-l", prefix, *args.engine_args],
                 args.power_cmd, prefix, args.interval_ms / 1e3)
        print(f"completed nFrames={n}")


if __name__ == "__main__":
    main()
