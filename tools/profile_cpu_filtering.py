"""CPU low-pass-filter profiler: worker-count sweep, int/float x 3x3/5x5.

Analog of the reference's `profileCpuFiltering` OpenMP baseline
(reference: main_aux_functions.h:2233-2396, enabled by the
PERFORM_CPU_FILTERING macro, main.cpp:11,395-406): measures host-CPU
filtering time as a function of thread count, as a baseline against the
device filter stage.  The reference parallelizes rows with
`#pragma omp parallel for`; here each worker filters a horizontal band
(with halo) of the frame via the vectorized NumPy golden filters.

    python tools/profile_cpu_filtering.py -s 1920x1080 --max-workers 16 \
        --multiplier 4

``--multiplier`` repeats the work for stable timings (the reference's
MULTIPLIER_CPU_FILTER, main_aux_functions.h:7).
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vvc_mip_gpu_tpu.golden import filters_golden as fg  # noqa: E402


def filter_banded(frame: np.ndarray, filter_type: str, kernel_idx: int,
                  n_workers: int) -> np.ndarray:
    """Filter by horizontal bands with halo rows; bit-identical to the
    whole-frame golden filter away from band seams only if seams carry a
    full halo — which they do (radius rows of context per side)."""
    h, _ = frame.shape
    if n_workers <= 1:
        return fg.filter_frame(frame, filter_type, kernel_idx)
    radius = 2 if "5x5" in filter_type else 1
    bounds = np.linspace(0, h, n_workers + 1, dtype=int)
    out = np.empty_like(frame)

    def work(i: int):
        y0, y1 = int(bounds[i]), int(bounds[i + 1])
        if y0 == y1:
            return
        lo = max(0, y0 - radius)
        hi = min(h, y1 + radius)
        band = fg.filter_frame(frame[lo:hi], filter_type, kernel_idx)
        out[y0:y1] = band[y0 - lo:y0 - lo + (y1 - y0)]
        return None

    with cf.ThreadPoolExecutor(n_workers) as ex:
        list(ex.map(work, range(n_workers)))
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-s", "--resolution", default="1920x1080")
    p.add_argument("--max-workers", type=int, default=16)
    p.add_argument("--multiplier", type=int, default=1,
                   help="repeat count for stable timing")
    p.add_argument("--kernel-idx", type=int, default=0)
    args = p.parse_args()
    w, h = (int(v) for v in args.resolution.lower().split("x"))
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 1024, size=(h, w)).astype(np.int64)

    variants = ["filterFrame_2d_int_quarterCtu",
                "filterFrame_2d_float_quarterCtu",
                "filterFrame_2d_int_5x5_quarterCtu",
                "filterFrame_2d_float_5x5_quarterCtu"]
    print(f"CPU filtering sweep {args.resolution}, "
          f"multiplier {args.multiplier}")
    print(f"{'variant':<40s} " + " ".join(
        f"{n:>8d}w" for n in _worker_counts(args.max_workers)))
    for ft in variants:
        ref = fg.filter_frame(frame, ft, args.kernel_idx)
        cells = []
        for n in _worker_counts(args.max_workers):
            t0 = time.perf_counter()
            for _ in range(args.multiplier):
                got = filter_banded(frame, ft, args.kernel_idx, n)
            ms = (time.perf_counter() - t0) / args.multiplier * 1e3
            assert np.array_equal(got, ref), f"band seam mismatch: {ft}"
            cells.append(f"{ms:8.1f} ")
        print(f"{ft:<40s} " + " ".join(cells))


def _worker_counts(max_workers: int):
    n, out = 1, []
    while n <= max_workers:
        out.append(n)
        n *= 2
    return out


if __name__ == "__main__":
    main()
