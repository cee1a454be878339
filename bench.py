"""Benchmark harness: 1080p full MIP mode-search throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement protocol mirrors the reference's write->compute->read window
(reference: main_aux_functions.h:908-914): each iteration feeds a *distinct*
frame (defeating any backend memoization) and forces a device-side checksum
readback so asynchronous dispatch cannot hide execution time.  The headline
window loops frames on device (see run_window) so the test harness's
network-relay dispatch cost amortizes the way the reference's microsecond
PCIe enqueues do; `--window reference` keeps every host<->device transfer
inside the timed region.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); we use
60 frames/s as the assumed OpenCL-engine 1080p baseline (a generous desktop
GPU estimate for the same workload) so the ratio is comparable across rounds.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

ASSUMED_BASELINE_FPS = 60.0
PROBE_TIMEOUT_S = 40.0   # a healthy relay answers jax.devices() in <10 s
MAX_WALL_S = 900.0       # hard bound on total retry time (driver safety)
_T_START = time.monotonic()


def _probe_backend() -> bool:
    """Fast liveness probe for the remote-TPU relay, in a subprocess so a
    hung backend handshake cannot wedge this process (a relay outage once
    cost a whole round an artifact: the in-process retry loop burned the
    driver's window and timed out with rc=124)."""
    env = dict(os.environ)
    code = "import jax; assert len(jax.devices()) > 0"
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           timeout=PROBE_TIMEOUT_S,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _metric_from_argv() -> str:
    """Best-effort metric name for error artifacts (mirrors main()'s
    naming) so a failed 4K/filtered side run isn't mislabeled as the
    1080p headline."""
    argv = sys.argv[1:]
    tag = "1080p"
    if "--resolution" in argv:
        try:
            tag = argv[argv.index("--resolution") + 1]
        except IndexError:
            pass
    name = f"mip_search_{tag}"
    if "--filtered" in argv:
        name += "_filtered"
    if "--window" in argv and "reference" in argv:
        name += "_refwindow"
    if "--with-export" in argv:
        name += "_with_export"
    return name + "_frames_per_second"


def _emit_error(reason: str) -> None:
    print(json.dumps({
        "metric": _metric_from_argv(),
        "value": None,
        "unit": "frames/s",
        "vs_baseline": None,
        "error": reason,
    }))

import jax
import jax.numpy as jnp
W, H = 1920, 1080
BATCH = 8  # frames per dispatch (the analog of the reference's
           # BUFFER_SLOTS pipelining, main_aux_functions.h:5)
WARMUP = 1
ITERS = 6


def main() -> None:
    import functools
    import os

    if os.environ.get("VVC_MIP_PLATFORM"):
        # CPU smoke runs (tiny --resolution): same env override as the
        # CLI — the sitecustomize snapshots JAX_PLATFORMS, so the
        # override must go through jax.config.
        jax.config.update("jax_platforms", os.environ["VVC_MIP_PLATFORM"])

    from vvc_mip_gpu_tpu.models.cost_engine import _compute
    from vvc_mip_gpu_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # The headline metric stays fixed at 1080p x batch 8 (first JSON line);
    # --resolution/--batch mirror the reference harness's 4K sweep
    # (powerTracer_NVIDIA.py:33-80) for side measurements.
    global W, H, BATCH
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", default=None,
                   help="WxH (default 1920x1080; e.g. 3840x2160)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--iters", type=int, default=None,
                   help="timed iterations (default 6; the reference "
                        "window reads the FULL cost tensor per "
                        "iteration — through a slow relay link use 2)")
    p.add_argument("--filtered", action="store_true",
                   help="Alternative-samples regime: low-pass filter each "
                        "frame on device, then search against it "
                        "(reference --FilterType timing, main.cpp:684-791)")
    p.add_argument("--with-export", action="store_true",
                   help="Time compute PLUS the per-frame decisions-CSV "
                        "export (native writer, ~13.2M rows/frame at "
                        "1080p) with export overlapping the next "
                        "dispatch — the reference runs its export inside "
                        "the processing loop (main_aux_functions.h:"
                        "735-798)")
    p.add_argument("--window", choices=["compute", "reference"],
                   default="compute",
                   help="'compute': steady-state dispatch window (the "
                        "headline). 'reference': the reference's "
                        "write->compute->read window — host->device frame "
                        "upload and the FULL cost-tensor readback are "
                        "inside the timed region "
                        "(main_aux_functions.h:908-914)")
    args = p.parse_args()
    tag = "1080p" if args.resolution is None else args.resolution
    metric = f"mip_search_{tag}_frames_per_second"
    if args.filtered:
        metric = f"mip_search_{tag}_filtered_frames_per_second"
    if args.window == "reference":
        metric = f"mip_search_{tag}_refwindow_frames_per_second"
    if args.resolution:
        w, h = args.resolution.lower().split("x")
        W, H = int(w), int(h)
    if args.batch:
        BATCH = args.batch
    global ITERS
    if args.iters:
        ITERS = args.iters

    rng = np.random.default_rng(0)
    frames_np = rng.integers(0, 1024, size=(BATCH, H, W), dtype=np.int32)
    frames = jax.device_put(jnp.asarray(frames_np))

    def one_frame(x):
        # max_performance mirrors the reference's default
        # MAX_PERFORMANCE_DIST=1 build (main_aux_functions.h:1): only
        # minSadHad is assembled/read, SAD/SATD columns are skipped.
        one = functools.partial(_compute, width=W, height=H,
                                max_performance=True)
        if args.filtered:
            from vvc_mip_gpu_tpu.ops.filters import _filter_jnp

            ref = _filter_jnp(x, "filterFrame_2d_int_quarterCtu", 2)
            return one(x, ref).min_sad_had
        return one(x, x).min_sad_had

    @jax.jit
    def run_batch(fr):
        # The sanity value is a nonzero-entry count (can't wrap: < 2^31
        # entries per batch), not an int32 sum that could wrap to 0.
        return jax.vmap(lambda x: jnp.count_nonzero(
            one_frame(x)).astype(jnp.int32))(fr).sum()

    @jax.jit
    def run_batch_full(fr):
        # reference-window variant: the whole [B, nCTU, 97840/3] cost
        # tensor leaves the device, as in the reference's readDistortion
        return jax.vmap(one_frame)(fr)

    if args.with_export:
        # Compose onto the already-qualified name so --filtered /
        # --window reference runs stay distinguishable.
        metric = metric.replace("_frames_per_second",
                                "_with_export_frames_per_second")
        _bench_with_export(one_frame, frames_np, metric)
        return

    if args.window == "reference":
        # write -> compute -> read, all inside the timed window
        # (main_aux_functions.h:908-914: WRITE_START .. READ_END).  The
        # loop is pipelined two-deep — upload/compute of batch i+1
        # overlap the readback of batch i — which is the reference's own
        # BUFFER_SLOTS async-queue structure (main.cpp:886-898), not a
        # departure from its accounting: the window still spans first
        # write to last read.
        np.asarray(run_batch_full(jax.device_put(frames_np)))  # compile
        t0 = time.perf_counter()
        acc = 0
        prev = None
        for i in range(ITERS):
            dev = jax.device_put(frames_np ^ (i + 1))   # write (async)
            out = run_batch_full(dev)                   # compute (async)
            if prev is not None:
                acc += int(np.asarray(prev).any())      # full read
            prev = out
        acc += int(np.asarray(prev).any())
        assert acc == ITERS
        dt = (time.perf_counter() - t0) / (ITERS * BATCH)
        fps = 1.0 / dt
        print(json.dumps({
            "metric": metric,
            "value": round(fps, 3),
            "unit": "frames/s",
            "vs_baseline": round(fps / ASSUMED_BASELINE_FPS, 3),
        }))
        return

    # Steady-state throughput.  The per-frame loop runs ON DEVICE
    # (lax.fori_loop over BATCH*ITERS distinct frames: resident frame
    # i%BATCH xor a per-iteration salt, every cost tensor consumed by a
    # count_nonzero) so host dispatch cost amortizes over the whole
    # window.  The reference's accounting amortizes identically: its
    # per-frame clEnqueue calls cost microseconds on local PCIe
    # (main.cpp:678-1241) while this harness reaches the TPU through a
    # network relay whose ~30 ms per-dispatch round-trip is an artifact
    # of the test environment, not of the engine (BASELINE.md).  Three
    # pipelined window dispatches + one scalar drain (the analog of the
    # reference's async queues + final clFinish, main.cpp:1222-1244).
    n_window = ITERS * BATCH

    @jax.jit
    def run_window(fr, salt):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(fr, i % BATCH, 0,
                                             keepdims=False)
            x = x ^ ((salt + i) & 1023)  # distinct 10-bit content
            return acc + jnp.count_nonzero(one_frame(x)).astype(jnp.int32)
        return jax.lax.fori_loop(0, n_window, body, jnp.int32(0))

    int(run_window(frames, jnp.int32(0)))  # compile + first run
    for i in range(WARMUP):
        # absorb the backend's one-off first-execution costs (lazy
        # allocation/autotuning measured at ~10x a steady-state window)
        int(run_window(frames, jnp.int32(i + 1)))
    reps = 3
    t0 = time.perf_counter()
    outs = [run_window(frames, jnp.int32(WARMUP + 1 + j))
            for j in range(reps)]
    checksum = int(jnp.stack(outs).sum())
    assert checksum != 0
    dt = (time.perf_counter() - t0) / (reps * n_window)
    fps = 1.0 / dt
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ASSUMED_BASELINE_FPS, 3),
    }))


def _bench_with_export(one_frame, frames_np, metric: str) -> None:
    """Steady-state fps with the decisions-CSV export IN the loop: each
    chunk's export (host-side native writer) overlaps the next chunk's
    device dispatch, mirroring the CLI's double-buffered drain.  Fewer
    iterations than the compute window — each 1080p frame writes a
    ~600 MB CSV."""
    import os
    import shutil
    import tempfile

    from vvc_mip_gpu_tpu.io import export as dexport

    from vvc_mip_gpu_tpu.utils.pipeline import pipelined

    iters = 3
    frames = jax.device_put(jnp.asarray(frames_np))
    run_batch_msh = jax.jit(lambda fr: jax.vmap(one_frame)(fr))
    np.asarray(run_batch_msh(frames))  # compile + warm
    outdir = tempfile.mkdtemp(prefix="benchx_")
    try:
        t0 = time.perf_counter()

        def drain(i, dev):
            msh = np.asarray(dev)
            for b in range(msh.shape[0]):
                dexport.export_decisions_csv(
                    os.path.join(outdir, f"dec_{i}_{b}.csv"), msh[b], W)

        pipelined(range(iters),
                  lambda i: run_batch_msh(frames ^ (i + 1)), drain)
        dt = (time.perf_counter() - t0) / (iters * BATCH)
        n_csv = len(os.listdir(outdir))
        assert n_csv == iters * BATCH, f"{n_csv} CSVs != {iters * BATCH}"
    finally:
        shutil.rmtree(outdir, ignore_errors=True)
    fps = 1.0 / dt
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ASSUMED_BASELINE_FPS, 3),
    }))


def _transient(exc: Exception) -> bool:
    """Known transient remote-TPU relay failures (retryable).  Anything
    else — including deterministic bugs — skips the retries and is
    reported as an error JSON artifact with exit code 1 (the driver
    records both the artifact and the rc; rc-based automation sees the
    failure, artifact-based automation sees the reason)."""
    msg = f"{type(exc).__name__}: {exc}"
    return any(s in msg for s in (
        "FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED",
        "INTERNAL: Connection", "Socket closed"))


if __name__ == "__main__":
    # Fail FAST when the relay is down: probe in a subprocess under a
    # 40 s timeout and emit a diagnostic JSON artifact (exit 0) instead
    # of hanging into the driver's rc=124 window.  VVC_MIP_SKIP_PROBE=1
    # skips it when the caller already probed (tools/tpu_batch_r2.sh
    # invokes bench ~8 times in a row).
    if (not os.environ.get("VVC_MIP_PLATFORM")
            and not os.environ.get("VVC_MIP_SKIP_PROBE")
            and not _probe_backend()):
        _emit_error(f"backend unavailable (probe timeout {PROBE_TIMEOUT_S}s)")
        sys.exit(0)
    # The remote-TPU relay occasionally throws transient backend errors
    # (FAILED_PRECONDITION); one retry must not cost the benchmark run,
    # but total retry time is hard-bounded.  Deterministic failures emit
    # the error artifact AND exit nonzero (see _transient).
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:
            if (attempt == 2 or not _transient(e)
                    or time.monotonic() - _T_START > MAX_WALL_S):
                _emit_error(f"{type(e).__name__}: {e}"[:300])
                sys.exit(0 if _transient(e) else 1)
            time.sleep(10)
