"""Multi-host distributed runtime: process init, DCN-aware global mesh,
host-sharded frame ingest and per-host decisions export.

The reference engine is single-process, single-GPU (main.cpp:217-228);
this is the build's own scaling axis (SURVEY.md §2.2, §5): N hosts × M
local chips, frames data-parallel across hosts over DCN (no cross-frame
communication at all), CTU-row bands spatial-parallel *within* a host over
ICI (the one-row halo ``ppermute`` of the sharded engine never crosses the
slow DCN link).

Usage (one process per host)::

    initialize(coordinator, num_processes, process_id)
    mesh = make_global_mesh(n_space=2)           # data axis inferred
    runner = DistributedRunner(w, h, mesh)
    costs = runner.compute(local_frames)         # [B_local, H, W] per host
    for poc, msh in runner.local_results(costs, n_frames): ...
"""

from __future__ import annotations

import numpy as np

import jax

from vvc_mip_gpu_tpu.parallel.mesh import make_mesh
from vvc_mip_gpu_tpu.parallel.sharded_engine import ShardedMipCostEngine


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """``jax.distributed.initialize`` wrapper (idempotent per process).

    Call before any other JAX API.  On TPU pods with standard env vars the
    arguments may all be None and are auto-detected.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def process_device_grid() -> np.ndarray:
    """[n_processes, n_local_devices] device grid, rows = processes.

    Requires every process to hold the same number of addressable
    devices (true for TPU pods and the forced-host-device test rig).
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = max(d.process_index for d in devs) + 1
    per = len(devs) // n_proc
    if per * n_proc != len(devs):
        raise ValueError(
            f"{len(devs)} devices do not split evenly over {n_proc} "
            "processes")
    return np.asarray(devs).reshape(n_proc, per)


def make_global_mesh(n_space: int = 1):
    """(data, space) mesh over ALL processes' devices, DCN-aware: the
    ``space`` axis (halo ppermute traffic) is laid out *within* a process
    (ICI), the ``data`` axis (no communication) spans processes (DCN).

    ``n_space`` must divide the per-process device count.
    """
    grid = process_device_grid()
    n_proc, per = grid.shape
    if per % n_space:
        raise ValueError(
            f"space axis {n_space} must divide the {per} local devices")
    # [n_proc, per] -> [n_proc * per//n_space (data), n_space (space)]:
    # each process contributes per//n_space data rows of n_space devices.
    arr = grid.reshape(n_proc * (per // n_space), n_space)
    return make_mesh(arr.shape[0], arr.shape[1], devices=arr.ravel())


class DistributedRunner:
    """Host-sharded MIP cost search: each process feeds and reads back only
    its own frames; compute is one global GSPMD dispatch."""

    def __init__(self, width: int, height: int, mesh,
                 max_performance: bool = True):
        self.mesh = mesh
        self.engine = ShardedMipCostEngine(
            width, height, mesh, max_performance=max_performance)
        self.n_data = mesh.shape["data"]
        self.n_proc = jax.process_count()
        if self.n_data % self.n_proc:
            raise ValueError("data axis must split evenly over processes")
        self.data_per_proc = self.n_data // self.n_proc

    def frame_slice(self, n_frames: int) -> range:
        """Global frame indices THIS process ingests/exports.

        The global batch is padded up to a multiple of the data axis; the
        padding frames land on the last process and are dropped on export.
        """
        batch = -(-n_frames // self.n_data) * self.n_data
        per = batch // self.n_proc
        p = jax.process_index()
        return range(p * per, min((p + 1) * per, n_frames))

    def _local_batch(self, n_frames: int) -> int:
        return -(-n_frames // self.n_data) * self.n_data // self.n_proc

    def compute(self, local_frames: np.ndarray, n_frames: int,
                local_refs: np.ndarray | None = None):
        """``local_frames``: [len(frame_slice), H, W] — only this host's
        frames.  Rows are padded up to the per-process batch internally
        (repeating the last frame; padding results are never exported).
        Returns FrameCosts of global (data, space)-sharded arrays.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("data", None, None))

        def _global(fr):
            fr = np.asarray(fr)
            per = self._local_batch(n_frames)
            if fr.shape[0] < per:
                if fr.shape[0] == 0:
                    # This process owns no real frames (n_frames < n_data):
                    # it still participates in the global dispatch with
                    # zero-filled padding frames (results never exported).
                    fr = np.zeros((per, self.engine.height,
                                   self.engine.width), np.int32)
                else:
                    fr = np.concatenate(
                        [fr, np.repeat(fr[-1:], per - fr.shape[0], axis=0)])
            fr = np.asarray(self.engine.pad_frames(fr))
            return jax.make_array_from_process_local_data(sh, fr)

        garr = _global(local_frames)
        if local_refs is None:
            return self.engine._fn_shared(garr, garr)
        return self.engine._fn(garr, _global(local_refs))

    def local_results(self, costs, n_frames: int):
        """Yield (poc, msh, sad, satd) numpy rows for THIS process's
        frames only — per-host export, no cross-host gather.  The space
        axis lives within a process, so every frame's full cost tensor is
        addressable locally.
        """
        sl = self.frame_slice(n_frames)
        msh = _local_rows(costs.min_sad_had)
        sad = None if costs.sad is None else _local_rows(costs.sad)
        satd = None if costs.satd is None else _local_rows(costs.satd)
        for i, poc in enumerate(sl):
            yield (poc, msh[i],
                   None if sad is None else sad[i],
                   None if satd is None else satd[i])


def _local_rows(garr) -> np.ndarray:
    """Assemble this process's frame rows [B_local, nCTU, D] from the
    addressable shards of a (data, space)-sharded global array."""
    shards = sorted(garr.addressable_shards,
                    key=lambda s: (s.index[0].start or 0,
                                   s.index[1].start or 0))
    by_frame: dict[int, list[np.ndarray]] = {}
    for s in shards:
        by_frame.setdefault(s.index[0].start or 0, []).append(
            np.asarray(s.data))
    rows = []
    for start in sorted(by_frame):
        rows.append(np.concatenate(by_frame[start], axis=1))
    return np.concatenate(rows, axis=0)
