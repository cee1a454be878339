"""Frame ingest: the reference's CSV-of-luma-samples format.

Format (reference: main.cpp:318-387): a text file where each line holds one
pixel row of comma-separated 10-bit luma samples; frames are concatenated
vertically (frame f occupies lines [f*H, (f+1)*H)).

The reference parses this with per-token std::stoi in a scalar loop — its
hottest host-side path (SURVEY.md C5).  We use pandas' C reader, with an
optional native C extension fast path (vvc_mip_gpu_tpu.io.native) when built.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def read_frames_csv(path: str | Path, width: int, height: int,
                    n_frames: int, start: int = 0) -> np.ndarray:
    """Read [n_frames, height, width] uint16 samples, skipping the first
    ``start`` frames (host-sharded ingest: each host of a distributed run
    reads only its own frame range)."""
    if n_frames == 0:
        # Empty-slice distributed host (n_frames < n_processes): nothing
        # to read; pd.read_csv(nrows=0) would yield (0, 0) and trip the
        # shape check below.
        return np.empty((0, height, width), np.uint16)
    try:
        if start:
            raise ImportError  # native reader has no skip; use pandas
        from vvc_mip_gpu_tpu.io import native  # optional C fast path

        data = native.read_samples_csv(str(path), width, height * n_frames)
    except Exception:
        import pandas as pd

        df = pd.read_csv(path, header=None, nrows=height * n_frames,
                         skiprows=start * height, dtype=np.uint16)
        data = df.to_numpy(np.uint16)
    if data.shape != (height * n_frames, width):
        raise ValueError(
            f"{path}: got {data.shape}, expected {(height * n_frames, width)}")
    return data.reshape(n_frames, height, width)


def write_frames_csv(path: str | Path, frames: np.ndarray) -> None:
    """Write frames in the reference CSV format (filtered-frame export,
    reference main.cpp:789-817; ~2M text rows per 1080p frame — the native
    writer is the production path, the Python loop a fallback)."""
    frames = np.asarray(frames)
    flat = frames.reshape(-1, frames.shape[-1])
    try:
        from vvc_mip_gpu_tpu.io import native

        native.write_samples_csv(str(path), flat.astype(np.uint16),
                                 flat.shape[-1])
        return
    except ImportError:
        pass
    with open(path, "w") as f:
        for row in flat:
            f.write(",".join(map(str, row.tolist())))
            f.write("\n")


def synthetic_frames(n_frames: int, width: int, height: int,
                     seed: int = 0) -> np.ndarray:
    """Deterministic pseudo-video for benchmarks: smooth gradients plus
    moving texture, quantized to 10 bits (more representative of video
    statistics than white noise)."""
    rng = np.random.default_rng(seed)
    y = np.arange(height)[:, None]
    x = np.arange(width)[None, :]
    base = rng.integers(0, 1024, size=(height, width))
    out = np.empty((n_frames, height, width), np.uint16)
    for f in range(n_frames):
        grad = (512 + 300 * np.sin(2 * np.pi * (x + 7 * f) / 256)
                * np.cos(2 * np.pi * (y - 3 * f) / 192))
        mix = 0.7 * grad + 0.3 * np.roll(base, (f * 2, f * 3), (0, 1))
        out[f] = np.clip(mix, 0, 1023).astype(np.uint16)
    return out
