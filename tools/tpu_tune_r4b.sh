#!/bin/sh
# Round-4 tuning batch B: per-class (cu_tile, unroll) A/B IN CONTEXT
# (profile_incontext --class runs the class through the real
# compute_blocks path, so deltas include the gather/layout interactions
# the isolates miss).  Run SEQUENTIALLY on a quiet host; one process per
# variant so VVC_CU_TILES is snapshotted fresh.
# Usage: sh tools/tpu_tune_r4b.sh 2>&1 | tee /tmp/tpu_tune_r4b.log
set -x
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
cd /root/repo

run() {  # $1 = class WxH, $2 = VVC_CU_TILES value ('' = default)
  VVC_CU_TILES="$2" timeout 900 python tools/profile_incontext.py \
      --class "$1" 2>&1 | grep -v WARNING
}

for v in "" "16x8:512u0" "16x8:1024u4" "16x8:2048u4"; do
  run 16x8 "$v"
done
for v in "" "8x16:512u0" "8x16:1024u4"; do
  run 8x16 "$v"
done
for v in "" "8x8:512u0" "8x8:2048u0"; do
  run 8x8 "$v"
done
for v in "" "16x16:256u0" "16x16:1024u4"; do
  run 16x16 "$v"
done
for v in "" "8x32:256u0" "8x32:1024u4"; do
  run 8x32 "$v"
done
for v in "" "32x8:256u0" "32x8:1024u4"; do
  run 32x8 "$v"
done
for v in "" "64x64:128u6" "64x64:256u2" "64x64:128u2"; do
  run 64x64 "$v"
done
for v in "" "32x32:256u4" "32x32:128u6"; do
  run 32x32 "$v"
done
for v in "" "16x4:2048u0" "16x4:512u0"; do
  run 16x4 "$v"
done
for v in "" "8x4:2048u0"; do
  run 8x4 "$v"
done
for v in "" "4x8:2048u0"; do
  run 4x8 "$v"
done
for v in "" "4x4:2048u0" "4x4:512u0"; do
  run 4x4 "$v"
done
echo "== done $(date +%H:%M:%S)"
