"""Multi-host runtime: N real processes × local CPU devices must produce
bit-identical decisions to the single-process engine (VERDICT r1 missing
#1; SURVEY §2.2/§5 distributed backend).

Each worker process runs the full distributed CLI path — process init,
DCN-aware global mesh (space axis within a process), host-sharded
synthetic ingest, one global GSPMD dispatch, per-host CSV export — and the
parent diffs the union of the per-host exports against the single-device
engine's output.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every test here boots N fresh worker processes through jax.distributed
# (full jax import + mesh compile per worker) — minutes each on one core.
pytestmark = pytest.mark.heavy


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(n_proc: int, local_devices: int, args: list[str]):
    env = dict(
        os.environ,
        XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
        JAX_PLATFORMS="cpu",
        VVC_MIP_PLATFORM="cpu",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    for attempt in range(3):
        port = _free_port()
        procs = []
        for pid in range(n_proc):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "vvc_mip_gpu_tpu.cli", *args,
                 "--Coordinator", f"localhost:{port}",
                 "--NumProcesses", str(n_proc), "--ProcessId", str(pid)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=900)
                outs.append(out)
        except subprocess.TimeoutExpired:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.communicate()
            raise
        if all(p.returncode == 0 for p in procs):
            return outs
        # Contention on a 1-CPU host (e.g. the rest of the suite) can
        # stall one worker's compile past Gloo's fixed 30 s key-value /
        # connect timeouts while its peer already executes, with varying
        # surface errors — retry with the persistent compile cache now
        # warm.  A deterministic failure still fails: it reproduces on
        # every attempt and the last output is asserted below.
        if attempt == 2:
            break
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return outs


@pytest.mark.parametrize("n_proc,local,space,n_frames", [
    (2, 2, 2, 3),  # production layout: frames over DCN, space inner (ICI)
    (2, 1, 1, 2),  # pure frame-parallel across processes
])
def test_multiprocess_bit_identity(tmp_path, n_proc, local, space,
                                   n_frames):
    w, h = 256, 128 * max(space, 1) + 64  # bottom-partial CTUs + padding
    args = ["-f", str(n_frames), "-s", f"{w}x{h}", "--Synthetic",
            "--MeshSpace", str(space), "-l", str(tmp_path / "d_")]
    _spawn_workers(n_proc, local, args)

    # Single-device reference on the same synthetic frames.
    from vvc_mip_gpu_tpu.io import frames as fio
    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

    frames = fio.synthetic_frames(n_frames, w, h)
    engine = MipCostEngine(w, h, max_performance=True)
    for f in range(n_frames):
        got = pd.read_csv(tmp_path / f"d_mip_decisions_poc{f}.csv")
        exp = engine(frames[f].astype(np.int32))
        valid = np.asarray(exp.valid).ravel()
        e = np.asarray(exp.min_sad_had, np.int64).ravel()
        a = got.minSadHad.to_numpy()
        assert a.shape == e.shape
        mism = (a != e) & valid
        assert not mism.any(), (
            f"frame {f}: {mism.sum()} mismatches vs single-device")


def test_multiprocess_halo_crosses_processes(tmp_path):
    """space axis spanning processes (1 local device each): the one-row
    halo ppermute must cross the process boundary correctly."""
    w, h = 256, 256
    args = ["-f", "1", "-s", f"{w}x{h}", "--Synthetic",
            "--MeshSpace", "1", "-l", str(tmp_path / "x_")]
    # With 1 local device and space=1 the data axis spans processes; to
    # force CROSS-PROCESS halo traffic use 2 local devices but space=2 so
    # each space pair is one process... instead: 2 procs x 1 device with
    # space=... -> not expressible with space inner.  Drive the sharded
    # engine directly with a mesh whose space axis spans processes.
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    script = f"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=int(sys.argv[1]))
from vvc_mip_gpu_tpu.io import frames as fio
from vvc_mip_gpu_tpu.parallel.mesh import make_mesh
from vvc_mip_gpu_tpu.parallel.sharded_engine import ShardedMipCostEngine
from jax.sharding import NamedSharding, PartitionSpec as P

devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
mesh = make_mesh(1, 2, devices=devs)   # space axis ACROSS processes
engine = ShardedMipCostEngine({w}, {h}, mesh, max_performance=True)
fr = fio.synthetic_frames(1, {w}, {h}).astype(np.int32)
sh = NamedSharding(mesh, P(None, None, None))
garr = jax.make_array_from_callback(fr.shape, sh, lambda idx: fr[idx])
costs = engine._fn(garr, garr)
# gather the (replicated-over-data, space-sharded) result to this host
msh = np.asarray(jax.device_get(
    jax.jit(lambda x: x, out_shardings=NamedSharding(
        mesh, P(None, None, None)))(costs.min_sad_had)))
np.save(sys.argv[2], msh[0])
print("OK", flush=True)
"""
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, str(pid),
             str(tmp_path / f"msh{pid}.npy")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    from vvc_mip_gpu_tpu.io import frames as fio
    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

    frames = fio.synthetic_frames(1, w, h)
    exp = MipCostEngine(w, h, max_performance=True)(
        frames[0].astype(np.int32))
    valid = np.asarray(exp.valid)
    e = np.asarray(exp.min_sad_had, np.int64)
    for pid in range(2):
        a = np.load(tmp_path / f"msh{pid}.npy").astype(np.int64)
        mism = (a != e) & valid
        assert not mism.any(), f"proc {pid}: {mism.sum()} mismatches"


def test_multiprocess_empty_slice_filter_and_target(tmp_path):
    """One host owns ZERO frames (n_frames < n_processes) while
    --FilterType and --TargetCTU are set: the empty-slice host must still
    run the SAME GSPMD program as its peers (refs as a (0,H,W) array, not
    None — divergent programs hang the collective dispatch), and the
    POC-columned target CSV must be gathered across hosts and written by
    process 0 (ADVICE r2 medium + TargetCTU threading)."""
    w, h = 256, 192
    args = ["-f", "1", "-s", f"{w}x{h}", "--Synthetic",
            "--FilterType", "filterFrame_2d_int_quarterCtu",
            "--KernelIdx", "2", "--TargetCTU", "1",
            "-l", str(tmp_path / "e_")]
    _spawn_workers(2, 1, args)

    from vvc_mip_gpu_tpu.io import frames as fio
    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine
    from vvc_mip_gpu_tpu.ops.filters import filter_frames

    frames = fio.synthetic_frames(1, w, h)
    ref = np.asarray(filter_frames(
        frames, "filterFrame_2d_int_quarterCtu", 2))
    exp = MipCostEngine(w, h, max_performance=True)(
        frames[0].astype(np.int32), ref[0].astype(np.int32))
    valid = np.asarray(exp.valid).ravel()
    e = np.asarray(exp.min_sad_had, np.int64).ravel()

    got = pd.read_csv(tmp_path / "e_mip_decisions.csv")
    a = got.minSadHad.to_numpy()
    assert a.shape == e.shape
    assert not ((a != e) & valid).any()

    tgt = pd.read_csv(tmp_path / "e_target_ctu1.csv")
    e_ctu = np.asarray(exp.min_sad_had, np.int64)[1]
    v_ctu = np.asarray(exp.valid)[1]
    assert (tgt.POC == 0).all()
    assert not ((tgt.minSadHad.to_numpy() != e_ctu) & v_ctu).any()
