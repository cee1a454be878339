"""Device-mesh construction for the sharded MIP engine.

The reference engine is single-process, single-GPU (SURVEY.md §2.2); our
scaling axes are the two embarrassingly- / nearly-embarrassingly-parallel
dimensions of the workload:

* ``data``  — whole frames (pure data parallelism; the analog of the
  reference's per-frame loop with BUFFER_SLOTS prefetch, main.cpp:678-1241).
* ``space`` — contiguous CTU-row bands within a frame.  Needs a one-row halo
  exchange of reference samples at band boundaries, because boundary
  extraction reads the row directly above each CTU (reference: intra.cl:76).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_data: int, n_space: int, devices=None) -> Mesh:
    """Build a (data, space) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_space
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    import numpy as np

    arr = np.asarray(devices[:n]).reshape(n_data, n_space)
    return Mesh(arr, axis_names=("data", "space"))


def factor_devices(n_devices: int, n_frames: int | None = None
                   ) -> tuple[int, int]:
    """Pick a (data, space) factorization.

    Frames are embarrassingly parallel while spatial sharding pays a halo
    exchange plus padded-CTU-row overhead, so the throughput default is
    PURE frame parallelism (space=1).  Spatial sharding is engaged only
    when there are fewer frames than devices (latency mode: a single
    frame still uses every chip).
    """
    if n_frames is None or n_frames >= n_devices:
        return n_devices, 1
    n_frames = max(n_frames, 1)
    # Smallest space shard count that keeps every chip busy.
    for space in range(1, n_devices + 1):
        if n_devices % space == 0 and n_devices // space <= n_frames:
            return n_devices // space, space
    return n_devices, 1
