#!/bin/sh
# Round-4 tuning batch D: per-class in-context gather attribution.
# Batch B showed tile/unroll levers don't move the heavy classes; batch
# C showed vmapped frame-batching REGRESSES (9.20 vs 8.60 ms/frame at
# b=2), so the per-launch fixed-cost theory is dead.  The remaining
# budget is gathers 2.69 ms + splits <=1.31 (family-level ablation,
# evidence/ablate_r4.log); this batch breaks those down BY CLASS so the
# relayout work can be attacked where it actually costs.
# Usage: sh tools/tpu_tune_r4d.sh 2>&1 | tee /tmp/tpu_tune_r4d.log
set -x
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
cd /root/repo

run() {
  timeout 1500 python tools/profile_incontext.py --class "$1" --ablate \
      2>&1 | grep -v WARNING
}

for c in 16x8 8x16 8x8 16x16 4x4 32x8 8x32 16x4 32x4; do
  date -u +%H:%M:%S
  run "$c"
done
echo "== done $(date -u +%H:%M:%S)"
