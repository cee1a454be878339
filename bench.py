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
    elif "--window" in argv and "r1" in argv:
        name += "_r1window"
    if "--with-export" in argv:
        name += "_with_export"
    if "--latency" in argv:
        return name + "_single_frame_latency_ms"
    return name + "_frames_per_second"


def _emit(record: dict) -> None:
    """Print the one-line JSON record, stamped with the round tag (env
    VVC_BENCH_ROUND, set by the batch scripts) and the UTC date so every
    BENCH_SIDE.json entry names the round that produced it (VERDICT r4
    weak #3: r3 numbers sat unlabeled in the r4 artifact)."""
    rnd = os.environ.get("VVC_BENCH_ROUND")
    if rnd:
        record["round"] = rnd
    record["date"] = time.strftime("%Y-%m-%d", time.gmtime())
    print(json.dumps(record))


def _emit_error(reason: str) -> None:
    _emit({
        "metric": _metric_from_argv(),
        "value": None,
        "unit": "frames/s",
        "vs_baseline": None,
        "error": reason,
    })

import jax
import jax.numpy as jnp
W, H = 1920, 1080
BATCH = 16  # frames per dispatch (the analog of the reference's
            # BUFFER_SLOTS pipelining, main_aux_functions.h:5).
            # batch 8 was the r1-window sweep winner and was never
            # re-swept after the r3 on-device fori_loop window; the r5
            # sweep on that window measures 8 -> 108.1 fps, 12 ->
            # 130.2, 16 -> 130.6-130.8 (repeated), 24 -> 131.1,
            # 32 -> 131.3 (evidence/batch_sweep_r5.log): per-window
            # dispatch overhead amortizes until a ~131 fps plateau
            # at >=16.  16 sits on the plateau at the lowest memory.
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
    p.add_argument("--latency", action="store_true",
                   help="Single-frame time-to-result through the "
                        "class-sharded latency engine (--LatencyMode's "
                        "engine; SURVEY §2.2's latency axis — the "
                        "reference has no analog).  Reports wall-clock "
                        "ms/frame with a dispatch/assemble/in-jit "
                        "decomposition")
    p.add_argument("--window", choices=["compute", "reference", "r1"],
                   default="compute",
                   help="'compute': steady-state dispatch window (the "
                        "headline). 'reference': the reference's "
                        "write->compute->read window — host->device frame "
                        "upload and the FULL cost-tensor readback are "
                        "inside the timed region "
                        "(main_aux_functions.h:908-914). 'r1': the "
                        "round-1 window (host-dispatched batch jits, "
                        "per-iteration scalar reads) kept so cross-round "
                        "numbers can be reconciled (BASELINE.md)")
    args = p.parse_args()
    tag = "1080p" if args.resolution is None else args.resolution
    metric = f"mip_search_{tag}_frames_per_second"
    if args.filtered:
        metric = f"mip_search_{tag}_filtered_frames_per_second"
    if args.window == "reference":
        metric = f"mip_search_{tag}_refwindow_frames_per_second"
    elif args.window == "r1":
        metric = f"mip_search_{tag}_r1window_frames_per_second"
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

    if args.latency:
        _bench_latency(tag)
        return

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
        # write to last read.  Samples upload as uint16 (the reference's
        # own 2-byte unsigned short transfer, main.cpp:580).
        frames_u16 = frames_np.astype(np.uint16)
        np.asarray(run_batch_full(jax.device_put(frames_u16)))  # compile
        t0 = time.perf_counter()
        acc = 0
        prev = None
        for i in range(ITERS):
            dev = jax.device_put(frames_u16 ^ (i + 1))  # write (async)
            out = run_batch_full(dev)                   # compute (async)
            if prev is not None:
                acc += int(np.asarray(prev).any())      # full read
            prev = out
        acc += int(np.asarray(prev).any())
        assert acc == ITERS
        dt = (time.perf_counter() - t0) / (ITERS * BATCH)
        fps = 1.0 / dt
        # Decomposition pass (unpipelined, one batch): where the window
        # time goes — host->device upload, device compute, full cost
        # readback — with bytes moved, so the recorded fps is explained
        # by the measured link bandwidth rather than left bare (the r3
        # 0.232 fps artifact had no decomposition; VERDICT.md item 5).
        t1 = time.perf_counter()
        dev = jax.device_put(frames_u16 ^ 99)
        jax.block_until_ready(dev)
        t2 = time.perf_counter()
        out = run_batch_full(dev)
        jax.block_until_ready(out)
        t3 = time.perf_counter()
        host = np.asarray(out)
        t4 = time.perf_counter()
        bytes_up = frames_u16.nbytes
        bytes_read = host.nbytes
        _emit({
            "metric": metric,
            "value": round(fps, 3),
            "unit": "frames/s",
            "vs_baseline": round(fps / ASSUMED_BASELINE_FPS, 3),
            "decomposition_per_batch": {
                "upload_s": round(t2 - t1, 3),
                "compute_s": round(t3 - t2, 3),
                "read_s": round(t4 - t3, 3),
                "upload_bytes": bytes_up,
                "read_bytes": bytes_read,
                "upload_mb_s": round(bytes_up / 1e6 / max(t2 - t1, 1e-9),
                                     1),
                "read_mb_s": round(bytes_read / 1e6 / max(t4 - t3, 1e-9),
                                   1),
            },
        })
        return

    if args.window == "r1":
        # The round-1 bench window, verbatim semantics (git 9de20ef):
        # ITERS host dispatches of the batch jit, per-iteration scalar
        # sums read after all dispatches.  Kept runnable so the recorded
        # r1 fps can be compared against current code under the SAME
        # accounting (separates window-change from code regression).
        int(run_batch(frames))  # compile + warm
        for i in range(WARMUP):
            int(run_batch(frames ^ (i + 1)))
        t0 = time.perf_counter()
        outs = [run_batch(frames ^ (WARMUP + i + 1)) for i in range(ITERS)]
        checksum = sum(int(o) for o in outs)
        assert checksum != 0
        dt = (time.perf_counter() - t0) / (ITERS * BATCH)
        fps = 1.0 / dt
        _emit({
            "metric": metric,
            "value": round(fps, 3),
            "unit": "frames/s",
            "vs_baseline": round(fps / ASSUMED_BASELINE_FPS, 3),
        })
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
    _emit({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ASSUMED_BASELINE_FPS, 3),
    })


def _bench_latency(tag: str) -> None:
    """Single-frame time-to-result (latency mode): wall-clock from a host
    frame to assembled host costs via LatencyMipCostEngine, plus a
    decomposition — dispatch (enqueue) vs assemble (readback) vs the
    in-jit device compute (the relay's ~8-30 ms dispatch round-trip is a
    harness artifact; the decomposition makes that visible instead of
    folding it silently into the latency claim)."""
    from vvc_mip_gpu_tpu.models.cost_engine import _compute
    from vvc_mip_gpu_tpu.parallel.latency_engine import LatencyMipCostEngine

    rng = np.random.default_rng(0)
    frame_np = rng.integers(0, 1024, size=(H, W), dtype=np.int32)
    eng = LatencyMipCostEngine(W, H, max_performance=True)
    eng(frame_np)  # compile + warm
    best_wall = best_disp = best_asm = float("inf")
    for i in range(8):
        fr = frame_np ^ (i + 1)
        t0 = time.perf_counter()
        outs = eng.dispatch(fr)
        t1 = time.perf_counter()
        costs = eng.assemble(outs)
        t2 = time.perf_counter()
        assert costs.min_sad_had.size
        best_wall = min(best_wall, t2 - t0)
        best_disp = min(best_disp, t1 - t0)
        best_asm = min(best_asm, t2 - t1)

    # In-jit device compute (profile_stages methodology: K in-jit reps,
    # scalar-readback sync, minus a trivial-dispatch baseline).
    k = 16

    @jax.jit
    def run(x):
        def it(i, acc):
            msh = _compute(x ^ i, x ^ i, width=W, height=H,
                           max_performance=True).min_sad_had
            return acc + msh.ravel()[-1]
        return jax.lax.fori_loop(0, k, it, jnp.int32(0))

    dev = jax.device_put(jnp.asarray(frame_np))
    int(run(dev).ravel()[-1])  # compile
    t_loop = min(_timed(lambda: int(run(dev ^ (j + 2)).ravel()[-1]))
                 for j in range(4))
    triv = jax.jit(lambda v: v + 1)
    x0 = jnp.int32(3)
    int(triv(x0))
    t_base = min(_timed(lambda: int(triv(x0 + j))) for j in range(8))
    in_jit_ms = (t_loop - t_base) / k * 1e3

    wall_ms = best_wall * 1e3
    ref_latency_ms = 1e3 / ASSUMED_BASELINE_FPS
    _emit({
        "metric": f"mip_search_{tag}_single_frame_latency_ms",
        "value": round(wall_ms, 2),
        "unit": "ms",
        "vs_baseline": round(ref_latency_ms / wall_ms, 3),
        "decomposition": {
            "dispatch_ms": round(best_disp * 1e3, 2),
            "assemble_ms": round(best_asm * 1e3, 2),
            "in_jit_compute_ms": round(in_jit_ms, 2),
            "n_devices": len(jax.local_devices()),
        },
    })


def _timed(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def _bench_with_export(one_frame, frames_np, metric: str) -> None:
    """Steady-state fps with the decisions-CSV export inside the window,
    scoped the way the reference scopes it: the run processes all its
    frames, then writes ONE decisions log (the reference exports a single
    CSV per run after its frame loop — main.cpp:1264-1269,
    main_aux_functions.h:735-798; it never writes one per frame).  The r3
    design wrote a ~600 MB CSV per frame per iteration (24 files) and hit
    the batch timeout — that measured a workload the reference does not
    have.  The JSON carries the export's own time and MB/s so the gap vs
    compute-only is explained, not bare."""
    import os
    import shutil
    import tempfile

    from vvc_mip_gpu_tpu.io import export as dexport

    frames = jax.device_put(jnp.asarray(frames_np))
    run_batch_msh = jax.jit(lambda fr: jax.vmap(one_frame)(fr))
    np.asarray(run_batch_msh(frames))  # compile + warm
    outdir = tempfile.mkdtemp(prefix="benchx_")
    try:
        t0 = time.perf_counter()
        last = None
        for i in range(ITERS):
            last = run_batch_msh(frames ^ (i + 1))  # async dispatch
        msh = np.asarray(last)                      # drain + readback
        t1 = time.perf_counter()
        path = os.path.join(outdir, "decisions.csv")
        dexport.export_decisions_csv(path, msh[-1], W)
        csv_bytes = os.path.getsize(path)
        t2 = time.perf_counter()
    finally:
        shutil.rmtree(outdir, ignore_errors=True)
    n_frames = ITERS * BATCH
    fps = n_frames / (t2 - t0)
    _emit({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ASSUMED_BASELINE_FPS, 3),
        "export": {
            "compute_and_read_s": round(t1 - t0, 3),
            "export_s": round(t2 - t1, 3),
            "csv_bytes": csv_bytes,
            "export_mb_s": round(csv_bytes / 1e6 / max(t2 - t1, 1e-9), 1),
            "frames": n_frames,
        },
    })


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
