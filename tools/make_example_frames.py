"""Generate example input CSVs in the reference's frame format.

The reference repo ships `data/original_frames_0_1.csv` samples
(reference README.md "Usage/Examples"; format: one pixel row of
comma-separated 10-bit luma samples per line, frames concatenated
vertically, main.cpp:318-387). Those blobs aren't redistributable
here, so this tool generates equivalent deterministic pseudo-video
files accepted by `-o/--OriginalFrames`:

    python tools/make_example_frames.py data/original_frames_0_1.csv \
        --resolution 1920x1080 --frames 2
    python -m vvc_mip_gpu_tpu.cli -f 2 -s 1920x1080 \
        -o data/original_frames_0_1.csv -l MIP_decisions_log
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output")
    p.add_argument("--resolution", default="1920x1080")
    p.add_argument("--frames", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from vvc_mip_gpu_tpu.io import frames as fio

    w, h = (int(v) for v in args.resolution.lower().split("x"))
    fr = fio.synthetic_frames(args.frames, w, h, seed=args.seed)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    fio.write_frames_csv(args.output, fr)
    print(f"wrote {args.output}: {args.frames} frames of {w}x{h} "
          f"({os.path.getsize(args.output) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
