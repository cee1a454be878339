"""Analytic compute/bandwidth roofline for the MIP mode-search pipeline.

Counts, per shape class and per frame, the integer element-ops the fused
distortion kernels MUST execute (from the kernel algorithm structure, not
from any profile) and the HBM bytes they must move, then converts both to
time at a parameterized VPU/HBM rate.  Purpose: establish the single-chip
speed of light for the workload — the mode search is elementwise-dominated
(diff/abs/accumulate/butterfly per sample per mode), so the MXU's matmul
FLOPs are nearly irrelevant and the VPU rate bounds throughput.

Op model per class (h x w CU, 2M modes, r = reduced pred size), from
ops/pallas/distortion.py (reference semantics: intra.cl:545-1171):
  - upsample (r < h or r < w): ~4 ops per produced sample (interp =
    shifted base + phase*delta + round >> log2, delta/base amortized
    across phases); horizontal pass produces r*w samples, vertical h*w.
  - diff (orig - pred): 1 op/sample
  - SAD: abs + accumulate = 2 ops/sample
  - SATD 4x4 butterflies: 4 ops/sample (2 stages x 8 ops per
    _hadamard4 over 16-sample blocks)
  - SATD |.| + accumulate: 2 ops/sample
  - per-mode epilogue (DC correction, min(2*SAD, SATD), emission):
    ~6 ops per mode per CU (negligible)
All ops are int32 lane-ops; int16 storage does not raise TPU VPU
throughput (32-bit lanes), so element-ops is the right currency.

Bandwidth model: orig samples in (int32, h*w*4 B per CU — each class
re-reads the frame), boundary rows in, cost rows out (int32), reduced
pred never leaves VMEM (fused path).

Usage:
  python tools/roofline.py [--width 1920 --height 1080]
      [--vpu-teraops 3.9] [--hbm-gbps 800]
      [--calibrate measured_ms]   # derive effective Tops from a measured
                                  # kernel-stage total instead
"""

from __future__ import annotations

import argparse

from vvc_mip_gpu_tpu.constants import num_ctus, shape_classes


def class_ops(h: int, w: int, r: int, two_m: int, n_cu: int) -> dict:
    """Element-op and byte counts for one class, whole frame."""
    per_sample = 1 + 2 + 4 + 2  # diff, SAD, butterflies, SATD abs+acc
    up_ops = 0
    if r < w:
        up_ops += 4 * r * w  # horizontal pass produces r*w
    if r < h or r < w:
        up_ops += 4 * h * w  # vertical (or only) pass produces h*w
    pred_epilogue = 4 * r * r  # matmul acc -> int32 >>6, clamp lo/hi
    ops_mode = per_sample * h * w + up_ops + pred_epilogue + 6
    ops = n_cu * two_m * ops_mode
    bytes_in = n_cu * (h * w * 4          # originals
                       + (h + w) * 4)     # boundary rows (amortized)
    bytes_out = n_cu * two_m * 4          # minSadHad (max-performance)
    return {"ops": ops, "bytes": bytes_in + bytes_out}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--vpu-teraops", type=float, default=3.9,
                   help="assumed VPU int32 element-ops throughput "
                        "(TPU v5e estimate: 8x128 lanes x ~4 ALUs x "
                        "~0.94 GHz ~= 3.9 Tops/s)")
    p.add_argument("--hbm-gbps", type=float, default=800.0,
                   help="assumed HBM bandwidth (v5e ~819 GB/s)")
    p.add_argument("--calibrate", type=float, default=None,
                   help="measured kernel-stage total ms for this frame "
                        "size; prints the implied effective Tops instead "
                        "of assuming one")
    args = p.parse_args()

    _, _, n_ctus = num_ctus(args.width, args.height)
    rows = []
    for cl in shape_classes():
        n_cu = cl.cus_per_ctu * n_ctus
        rows.append((cl, class_ops(cl.height, cl.width,
                                   cl.reduced_pred_size, cl.total_modes,
                                   n_cu)))

    total_ops = sum(r["ops"] for _, r in rows)
    total_bytes = sum(r["bytes"] for _, r in rows)
    print(f"frame {args.width}x{args.height}: {n_ctus} CTUs, "
          f"{len(rows)} shape classes")
    print(f"{'class':>8} {'sid':>3} {'2M':>3} {'nCU':>7} "
          f"{'Mops':>9} {'MB':>7} {'ms@vpu':>7}")
    for cl, r in sorted(rows, key=lambda t: -t[1]["ops"]):
        ms = r["ops"] / (args.vpu_teraops * 1e12) * 1e3
        print(f"{cl.width:>4}x{cl.height:<3} {cl.size_id:>3} "
              f"{cl.total_modes:>3} {cl.cus_per_ctu * n_ctus:>7} "
              f"{r['ops'] / 1e6:>9.1f} {r['bytes'] / 1e6:>7.1f} "
              f"{ms:>7.3f}")

    vpu_ms = total_ops / (args.vpu_teraops * 1e12) * 1e3
    hbm_ms = total_bytes / (args.hbm_gbps * 1e9) * 1e3
    print(f"total: {total_ops / 1e9:.2f} Gops, {total_bytes / 1e6:.0f} MB")
    print(f"VPU-bound floor @ {args.vpu_teraops:.1f} Tops/s: "
          f"{vpu_ms:.2f} ms/frame ({1e3 / vpu_ms:.0f} fps)")
    print(f"HBM-bound floor @ {args.hbm_gbps:.0f} GB/s: "
          f"{hbm_ms:.2f} ms/frame — "
          f"{'VPU' if vpu_ms > hbm_ms else 'HBM'}-bound workload")
    if args.calibrate is not None:
        eff = total_ops / (args.calibrate * 1e-3) / 1e12
        print(f"calibration: measured {args.calibrate:.2f} ms kernel "
              f"stage => effective {eff:.2f} Tops/s "
              f"({eff / args.vpu_teraops * 100:.0f}% of assumed peak)")


if __name__ == "__main__":
    main()
