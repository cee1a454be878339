"""Command-line interface — the analog of the reference `main` binary.

Flag names follow the reference CLI (reference: main.cpp:50-69, README.md:
28-50) with TPU-specific additions (mesh shape, batch size):

    python -m vvc_mip_gpu_tpu.cli -f 2 -s 1920x1080 -o frames.csv -l out_
        [--FilterType filterFrame_2d_int_quarterCtu --KernelIdx 2]
        [--OnlyFilter] [--TracePower] [--MeshData 1 --MeshSpace 1]
        [--Synthetic]

Pipeline per frame (reference: main.cpp:678-1241): optional low-pass filter
-> MIP cost search (boundaries + reduced prediction + upsample + distortion
fused in one jitted graph) -> decisions CSV export.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from vvc_mip_gpu_tpu.utils.config import EngineConfig
from vvc_mip_gpu_tpu.utils.pipeline import pipelined
from vvc_mip_gpu_tpu.utils.timing import StageTimer, print_timestamp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vvc-mip-tpu",
        description="TPU-native VVC MIP mode-search cost engine")
    p.add_argument("--FramesToBeEncoded", "-f", type=int, default=1,
                   help="Number of frames to be processed")
    p.add_argument("--Resolution", "-s", type=str, required=True,
                   help="Video resolution, e.g. 1920x1080")
    p.add_argument("--OriginalFrames", "-o", type=str, default=None,
                   help="Input CSV of original frame samples")
    p.add_argument("--OutputPreffix", "-l", type=str, default="",
                   help="Output file prefix for the decisions log")
    p.add_argument("--FilterType", type=str, default=None,
                   help="Smoothing filter for alternative reference samples")
    p.add_argument("--KernelIdx", type=int, default=0,
                   help="Filter coefficient set index")
    p.add_argument("--OnlyFilter", action="store_true",
                   help="Filter the frames, export them, and exit "
                        "(reference ONLY_FILTER_AND_EXIT)")
    p.add_argument("--FullDistortion", action="store_true",
                   help="Export SAD/SATD columns too (disables the "
                        "reference's MAX_PERFORMANCE_DIST fast path)")
    p.add_argument("--TracePower", action="store_true",
                   help="Print stage timestamps for the energy harness")
    p.add_argument("--Synthetic", action="store_true",
                   help="Use deterministic synthetic frames (no input file)")
    p.add_argument("--MeshData", type=int, default=1,
                   help="Data-parallel (frame) mesh axis size")
    p.add_argument("--MeshSpace", type=int, default=1,
                   help="Spatial (CTU-row) mesh axis size")
    p.add_argument("--Coordinator", type=str, default=None,
                   help="Multi-host: coordinator address host:port "
                        "(jax.distributed); one process per host")
    p.add_argument("--NumProcesses", type=int, default=1,
                   help="Multi-host: total number of processes")
    p.add_argument("--ProcessId", type=int, default=0,
                   help="Multi-host: this process's index")
    p.add_argument("--TargetCTU", type=int, default=None,
                   help="Print the distortion table of this CTU and write "
                        "a multi-frame POC-columned CSV for it "
                        "(reference reportDistortionOnlyTarget / "
                        "reportTargetDistortionValues_File)")
    p.add_argument("--LatencyMode", action="store_true",
                   help="Minimize per-frame latency: each frame is "
                        "class-sharded across ALL local devices "
                        "(no banding/padding; see SCALING.md round 3)")
    p.add_argument("--BatchFrames", type=int, default=8,
                   help="Frames kept in flight per dispatch window "
                        "(the analog of the reference's BUFFER_SLOTS "
                        "pipelining).  Throughput plateaus from ~16 "
                        "(evidence/batch_sweep_r5.log), but the CLI "
                        "reads back full cost tensors per chunk, so 8 "
                        "stays the default to bound the HBM/readback "
                        "footprint of --FullDistortion runs; raise it "
                        "for max-performance throughput runs")
    p.add_argument("--Resume", action="store_true",
                   help="Skip frames whose decisions CSV already exists "
                        "(checkpoint/resume for long multi-frame runs)")
    # Kept for command-line compatibility with the reference; device
    # selection is JAX's job on TPU.
    p.add_argument("--DeviceIndex", type=int, default=0,
                   help="(compatibility flag; unused on TPU)")
    return p


def _config_from_args(args) -> EngineConfig:
    w, h = EngineConfig.parse_resolution(args.Resolution)
    cfg = EngineConfig(
        width=w, height=h,
        n_frames=args.FramesToBeEncoded,
        input_path=args.OriginalFrames,
        output_prefix=args.OutputPreffix,
        filter_type=args.FilterType,
        kernel_idx=args.KernelIdx,
        only_filter=args.OnlyFilter,
        max_performance=not args.FullDistortion,
        trace_power=args.TracePower,
        mesh_data=args.MeshData,
        mesh_space=args.MeshSpace,
        batch_frames=args.BatchFrames,
        latency_mode=args.LatencyMode,
        coordinator=args.Coordinator,
        num_processes=args.NumProcesses,
        process_id=args.ProcessId,
    )
    cfg.validate()
    return cfg


def run(cfg: EngineConfig, synthetic: bool = False,
        target_ctu: int | None = None, resume: bool = False) -> int:
    from vvc_mip_gpu_tpu.io import export, frames as fio

    _enable_compilation_cache()
    if cfg.num_processes > 1:
        return _run_distributed(cfg, synthetic=synthetic, resume=resume,
                                target_ctu=target_ctu)
    timer = StageTimer(trace_power=cfg.trace_power)
    if cfg.trace_power:
        print_timestamp("STARTED HOST")

    with timer.stage("READ SAMPLES"):
        if synthetic or cfg.input_path is None:
            frames = fio.synthetic_frames(cfg.n_frames, cfg.width, cfg.height)
        else:
            frames = fio.read_frames_csv(
                cfg.input_path, cfg.width, cfg.height, cfg.n_frames)

    ref_frames = None
    if cfg.filter_type is not None:
        from vvc_mip_gpu_tpu.ops.filters import filter_frames

        with timer.stage("ENQUEUE FILTER"):
            # One vmapped jit over the whole batch; the result STAYS ON
            # DEVICE and feeds the engine directly (the reference
            # round-trips filtered frames through the host only for
            # export, main.cpp:793-822).
            ref_frames = filter_frames(frames, cfg.filter_type,
                                       cfg.kernel_idx)
        if cfg.only_filter:
            out = f"{cfg.output_prefix}filtered.csv"
            fio.write_frames_csv(out, np.asarray(ref_frames))
            print(f"wrote {out}")
            print(timer.report_compact(cfg.n_frames))
            return 0

    # Multi-frame target-CTU accumulation (one POC-columned CSV at the
    # end; reference reportTargetDistortionValues_File,
    # main_aux_functions.h:843-906).
    tgt_msh: dict[int, np.ndarray] = {}
    tgt_sad: dict[int, np.ndarray] = {}
    tgt_satd: dict[int, np.ndarray] = {}

    def _collect_target(f, msh, sad, satd):
        if target_ctu is None:
            return
        tgt_msh[f] = np.asarray(msh[target_ctu])
        tgt_sad[f] = None if sad is None else np.asarray(sad[target_ctu])
        tgt_satd[f] = None if satd is None else np.asarray(satd[target_ctu])

    if cfg.latency_mode:
        import os

        from vvc_mip_gpu_tpu.parallel.latency_engine import (
            LatencyMipCostEngine)

        engine = LatencyMipCostEngine(cfg.width, cfg.height,
                                      max_performance=cfg.max_performance)
        pending = [f for f in range(cfg.n_frames)
                   if not (resume and os.path.exists(_out_path(cfg, f)))]
        for f in range(cfg.n_frames):
            if f not in pending:
                print(f"skipping frame {f} (exists: {_out_path(cfg, f)})")
        for f in pending:
            # dispatch/assemble split keeps the stage attribution honest:
            # ENQUEUE covers the async per-device dispatches, READ the
            # blocking readback + block concatenation.
            with timer.stage("ENQUEUE KERNELS"):
                outs = engine.dispatch(
                    frames[f].astype(np.int32),
                    None if ref_frames is None
                    else np.asarray(ref_frames[f]).astype(np.int32))
            with timer.stage("READ DISTORTION"):
                costs = engine.assemble(outs)
                msh = np.asarray(costs.min_sad_had)
                sad = None if cfg.max_performance else np.asarray(costs.sad)
                satd = (None if cfg.max_performance
                        else np.asarray(costs.satd))
            _export_frame(cfg, export, msh, sad, satd, poc=f)
            _collect_target(f, msh, sad, satd)
            if target_ctu is not None:
                from vvc_mip_gpu_tpu.models.inspect import report_target_ctu

                report_target_ctu(msh, cfg.width, target_ctu,
                                  sad=sad, satd=satd)
    elif cfg.mesh_data * cfg.mesh_space > 1:
        import os

        from vvc_mip_gpu_tpu.parallel import ShardedMipCostEngine, make_mesh

        # Per-frame resume: compute only the frames whose decisions CSV is
        # missing, padding the batch up to a multiple of the data axis by
        # repeating the last pending frame (dropped after compute).
        pending = [f for f in range(cfg.n_frames)
                   if not (resume and os.path.exists(_out_path(cfg, f)))]
        for f in range(cfg.n_frames):
            if f not in pending:
                print(f"skipping frame {f} (exists: {_out_path(cfg, f)})")
        if not pending:
            print(f"all {cfg.n_frames} decision logs exist; nothing to do")
            return 0
        mesh = make_mesh(cfg.mesh_data, cfg.mesh_space)
        engine = ShardedMipCostEngine(cfg.width, cfg.height, mesh,
                                      max_performance=cfg.max_performance)
        # Chunked, double-buffered dispatch like the single-device path:
        # --BatchFrames bounds the HBM cost-tensor footprint (a 16-frame
        # 4K --FullDistortion run would otherwise materialize multi-GB
        # tensors in ONE dispatch).  Chunk size is batch_frames rounded
        # up to a multiple of the data axis.
        from vvc_mip_gpu_tpu.constants import num_ctus

        true_n = num_ctus(cfg.width, cfg.height)[2]
        chunk_n = (-(-max(cfg.batch_frames, 1) // cfg.mesh_data)
                   * cfg.mesh_data)

        def drain_sharded(pocs, costs):
            with timer.stage("READ DISTORTION"):
                # Slice to the TRUE CTU count: spatial padding can add
                # whole phantom CTU rows when space > ceil(H/128)/rows.
                msh = np.asarray(costs.min_sad_had)[:, :true_n]
                sad = satd = None
                if not cfg.max_performance:
                    sad = np.asarray(costs.sad)[:, :true_n]
                    satd = np.asarray(costs.satd)[:, :true_n]
            for b, f in enumerate(pocs):
                _export_frame(cfg, export, msh[b],
                              None if sad is None else sad[b],
                              None if satd is None else satd[b], poc=f)
                _collect_target(f, msh[b],
                                None if sad is None else sad[b],
                                None if satd is None else satd[b])

        def dispatch_sharded(pocs):
            # Pad to the ONE compiled batch shape when there are multiple
            # chunks, else just up to a multiple of the data axis.
            target = (chunk_n if len(pending) > chunk_n
                      else -(-len(pocs) // cfg.mesh_data) * cfg.mesh_data)
            feed = list(pocs) + [pocs[-1]] * (target - len(pocs))
            with timer.stage("ENQUEUE KERNELS"):
                return engine(frames[feed].astype(np.int32),
                              None if ref_frames is None
                              else ref_frames[feed].astype(np.int32))

        pipelined((pending[c0:c0 + chunk_n]
                   for c0 in range(0, len(pending), chunk_n)),
                  dispatch_sharded, drain_sharded)
    else:
        from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

        engine = MipCostEngine(cfg.width, cfg.height,
                               max_performance=cfg.max_performance)
        # Batched pipelined dispatch: --BatchFrames frames per device
        # call (one dispatch round-trip per chunk, like bench.py), with
        # the next chunk enqueued while the previous reads back — the
        # analog of the reference's BUFFER_SLOTS circular buffer + async
        # write queue (main_aux_functions.h:5, main.cpp:886-898).
        chunk_n = max(1, cfg.batch_frames)  # CLI --BatchFrames (default 8)

        def drain(pocs, costs):
            with timer.stage("READ DISTORTION"):
                msh = np.asarray(costs.min_sad_had)
                sad = (None if cfg.max_performance
                       else np.asarray(costs.sad))
                satd = (None if cfg.max_performance
                        else np.asarray(costs.satd))
            for b, f in enumerate(pocs):
                _export_frame(cfg, export, msh[b],
                              None if sad is None else sad[b],
                              None if satd is None else satd[b], poc=f)
                _collect_target(f, msh[b],
                                None if sad is None else sad[b],
                                None if satd is None else satd[b])
                if target_ctu is not None:
                    from vvc_mip_gpu_tpu.models.inspect import (
                        report_target_ctu)

                    report_target_ctu(
                        msh[b], cfg.width, target_ctu,
                        sad=None if sad is None else sad[b],
                        satd=None if satd is None else satd[b])

        import os

        pending = [f for f in range(cfg.n_frames)
                   if not (resume and os.path.exists(_out_path(cfg, f)))]
        for f in range(cfg.n_frames):
            if f not in pending:
                print(f"skipping frame {f} (exists: {_out_path(cfg, f)})")
        def dispatch(pocs):
            # Pad a ragged tail chunk up to chunk_n by repeating the last
            # poc (dropped on drain) so every dispatch reuses the ONE
            # compiled batch shape — a second full XLA compile of the
            # vmapped engine costs ~20-40 s at 1080p.  A run that fits in
            # a single smaller chunk keeps its exact size (only one
            # compile either way; no wasted compute).
            feed = list(pocs)
            if len(pending) > chunk_n:
                feed += [pocs[-1]] * (chunk_n - len(pocs))
            with timer.stage("ENQUEUE KERNELS"):
                return engine.compute_batch(
                    frames[feed].astype(np.int32),
                    None if ref_frames is None
                    else ref_frames[np.asarray(feed)].astype(np.int32))

        pipelined((pending[c0:c0 + chunk_n]
                   for c0 in range(0, len(pending), chunk_n)),
                  dispatch, drain)

    if target_ctu is not None and tgt_msh:
        from vvc_mip_gpu_tpu.io.export import export_target_ctu_csv

        pocs = sorted(tgt_msh)
        tpath = f"{cfg.output_prefix}target_ctu{target_ctu}.csv"
        export_target_ctu_csv(
            tpath, [tgt_msh[f] for f in pocs], cfg.width, target_ctu,
            sad_per_frame=[tgt_sad[f] for f in pocs],
            satd_per_frame=[tgt_satd[f] for f in pocs], pocs=pocs)
        print(f"wrote {tpath}")

    print(timer.report())
    print(timer.report_compact(cfg.n_frames))
    return 0


def _enable_compilation_cache() -> None:
    from vvc_mip_gpu_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()


def _run_distributed(cfg: EngineConfig, synthetic: bool,
                     resume: bool, target_ctu: int | None = None) -> int:
    """Multi-host path: init jax.distributed, build the DCN-aware global
    mesh, host-sharded ingest (each process reads only its own frame
    range), one global GSPMD dispatch, per-host decisions export.

    The reference has no multi-device story at all (main.cpp:217-228);
    this is the build's declared scaling axis (SURVEY §2.2/§5).
    """
    import os

    import numpy as np

    from vvc_mip_gpu_tpu.io import export, frames as fio
    from vvc_mip_gpu_tpu.parallel import distributed as dist

    dist.initialize(cfg.coordinator, cfg.num_processes, cfg.process_id)
    timer = StageTimer(trace_power=cfg.trace_power)
    mesh = dist.make_global_mesh(cfg.mesh_space)
    runner = dist.DistributedRunner(cfg.width, cfg.height, mesh,
                                    max_performance=cfg.max_performance)
    sl = runner.frame_slice(cfg.n_frames)
    with timer.stage("READ SAMPLES"):
        if synthetic or cfg.input_path is None:
            local = fio.synthetic_frames(
                cfg.n_frames, cfg.width, cfg.height)[list(sl)]
        else:
            local = fio.read_frames_csv(cfg.input_path, cfg.width,
                                        cfg.height, len(sl), start=sl.start)
    refs = None
    if cfg.filter_type is not None:
        from vvc_mip_gpu_tpu.ops.filters import filter_frames

        with timer.stage("ENQUEUE FILTER"):
            # Batched device filter; make_array_from_process_local_data
            # wants host arrays, so the multi-host path reads it back.
            # An empty-slice host (n_frames < n_processes) MUST still pass
            # a (0, H, W) array, not None: refs=None selects _fn_shared
            # while peers run _fn — divergent GSPMD programs inside one
            # collective dispatch hang or corrupt the run.  compute()'s
            # _global zero-fills 0-row inputs.
            refs = (np.asarray(filter_frames(local, cfg.filter_type,
                                             cfg.kernel_idx))
                    if len(local)
                    else np.zeros((0, cfg.height, cfg.width), np.int32))
    with timer.stage("ENQUEUE KERNELS"):
        costs = runner.compute(local.astype(np.int32), cfg.n_frames,
                               None if refs is None
                               else refs.astype(np.int32))
    with timer.stage("READ DISTORTION"):
        results = list(runner.local_results(costs, cfg.n_frames))
    from vvc_mip_gpu_tpu.constants import num_ctus

    true_n_ctus = num_ctus(cfg.width, cfg.height)[2]
    tgt: list[tuple[int, np.ndarray, np.ndarray | None,
                    np.ndarray | None]] = []
    for poc, msh, sad, satd in results:
        if target_ctu is not None:
            from vvc_mip_gpu_tpu.models.inspect import report_target_ctu

            report_target_ctu(msh[:true_n_ctus], cfg.width, target_ctu,
                              sad=None if sad is None else sad[:true_n_ctus],
                              satd=(None if satd is None
                                    else satd[:true_n_ctus]))
            tgt.append((poc, msh[target_ctu],
                        None if sad is None else sad[target_ctu],
                        None if satd is None else satd[target_ctu]))
        if resume and os.path.exists(_out_path(cfg, poc)):
            print(f"skipping frame {poc} (exists)")
            continue
        _export_frame(cfg, export, msh[:true_n_ctus],
                      None if sad is None else sad[:true_n_ctus],
                      None if satd is None else satd[:true_n_ctus],
                      poc=poc)
    if target_ctu is not None:
        _gather_target_ctu(cfg, runner, costs, tgt, target_ctu)
    print(f"[process {cfg.process_id}] exported {len(results)} frames")
    print(timer.report_compact(max(len(results), 1)))
    return 0


def _gather_target_ctu(cfg, runner, costs, tgt, target_ctu: int) -> None:
    """Multi-host --TargetCTU: every host owns only its own frames' cost
    rows, so the POC-columned target CSV (reference
    reportTargetDistortionValues_File, main_aux_functions.h:843-906) needs
    a cross-host gather.  The target rows are tiny (~32k values/frame);
    allgather them padded to equal per-host shapes, then process 0 writes
    the CSV.  ALL hosts must reach this collective (consistent control
    flow), hence it runs unconditionally when --TargetCTU is set.
    """
    import numpy as np

    from jax.experimental import multihost_utils as mhu

    d = int(costs.min_sad_had.shape[-1])
    n_frames = cfg.n_frames
    per = (-(-n_frames // runner.n_data) * runner.n_data) // runner.n_proc
    full = not cfg.max_performance

    pocs_arr = np.full(per, -1, np.int32)
    msh_arr = np.zeros((per, d), np.int64)
    sad_arr = np.zeros((per, d), np.int64) if full else None
    satd_arr = np.zeros((per, d), np.int64) if full else None
    for i, (poc, msh, sad, satd) in enumerate(tgt):
        pocs_arr[i] = poc
        msh_arr[i] = msh
        if full:
            sad_arr[i] = sad
            satd_arr[i] = satd

    g_pocs = np.asarray(mhu.process_allgather(pocs_arr)).reshape(-1)
    g_msh = np.asarray(mhu.process_allgather(msh_arr)).reshape(-1, d)
    g_sad = (np.asarray(mhu.process_allgather(sad_arr)).reshape(-1, d)
             if full else None)
    g_satd = (np.asarray(mhu.process_allgather(satd_arr)).reshape(-1, d)
              if full else None)
    if cfg.process_id != 0:
        return
    from vvc_mip_gpu_tpu.io.export import export_target_ctu_csv

    order = [int(i) for i in np.argsort(g_pocs, kind="stable")
             if g_pocs[i] >= 0]
    tpath = f"{cfg.output_prefix}target_ctu{target_ctu}.csv"
    export_target_ctu_csv(
        tpath, [g_msh[i] for i in order], cfg.width, target_ctu,
        sad_per_frame=[None if g_sad is None else g_sad[i] for i in order],
        satd_per_frame=[None if g_satd is None else g_satd[i]
                        for i in order],
        pocs=[int(g_pocs[i]) for i in order])
    print(f"wrote {tpath}")


def _out_path(cfg, poc) -> str:
    suffix = f"_poc{poc}" if cfg.n_frames > 1 else ""
    return f"{cfg.output_prefix}mip_decisions{suffix}.csv"


def _export_frame(cfg, export, msh, sad, satd, poc):
    out = _out_path(cfg, poc)
    export.export_decisions_csv(
        out, msh, cfg.width, sad=sad, satd=satd,
        poc=poc if cfg.n_frames > 1 else None)
    print(f"wrote {out}")


def main(argv=None) -> int:
    import os

    if os.environ.get("VVC_MIP_PLATFORM"):
        # The environment's sitecustomize imports jax early and snapshots
        # JAX_PLATFORMS, so a CPU run (e.g. the multi-process test rig)
        # must override through jax.config before backend init.
        import jax

        jax.config.update("jax_platforms", os.environ["VVC_MIP_PLATFORM"])
    args = build_parser().parse_args(argv)
    cfg = _config_from_args(args)
    return run(cfg, synthetic=args.Synthetic, target_ctu=args.TargetCTU,
               resume=args.Resume)


if __name__ == "__main__":
    sys.exit(main())
