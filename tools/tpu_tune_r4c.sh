#!/bin/sh
# Round-4 tuning batch C: grid-batching amortization measurement.
# vmap of pallas_call prepends a grid axis, so a vmapped B-frame
# pipeline pays each class's per-launch fixed cost once per batch
# instead of once per frame — the r3 per-class profile attributes the
# small-CU classes' 2-5x floor gap to exactly that cost (VERDICT r4
# item 1).  Run SEQUENTIALLY on a quiet host.
# Usage: sh tools/tpu_tune_r4c.sh 2>&1 | tee /tmp/tpu_tune_r4c.log
set -x
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
cd /root/repo

run() { timeout 1800 python tools/profile_incontext.py "$@" 2>&1 | grep -v WARNING; }

date -u +%H:%M:%S
# single-frame e2e reference (same methodology, same session)
timeout 1800 python tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
    | grep -v WARNING
for b in 2 4 8; do
  run --batch "$b"
done
date -u +%H:%M:%S
echo "== done"
