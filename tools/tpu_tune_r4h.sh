#!/bin/sh
# Round-4 tuning batch H: final rowband default selection.
# 1. e2e with the TRIMMED class set (batch F/G per-class winners)
#    vs the 'all' set (8.07) vs off (8.62).
# 2. VVC_FETCH interaction: with rowband covering most left
#    boundaries, does the fetch_rows kernel still pay for itself?
# 3. bench.py with the winning config (also warms the compile cache
#    for the final evidence batch).
# Usage: sh tools/tpu_tune_r4h.sh 2>&1 | tee /tmp/tpu_tune_r4h.log
set -x
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
cd /root/repo

date -u +%H:%M:%S
echo "== e2e trimmed set (shipped default list)"
VVC_ROWBAND=1 timeout 1800 python tools/profile_stages.py \
    --e2e-max --e2e-only 2>&1 | grep -v WARNING
echo "== e2e all classes"
VVC_ROWBAND=1 VVC_RB_CLASSES=all timeout 1800 python \
    tools/profile_stages.py --e2e-max --e2e-only 2>&1 | grep -v WARNING
echo "== e2e trimmed + fetch=none"
VVC_ROWBAND=1 VVC_FETCH=none timeout 1800 python \
    tools/profile_stages.py --e2e-max --e2e-only 2>&1 | grep -v WARNING
date -u +%H:%M:%S
echo "== bench (rowband trimmed)"
VVC_ROWBAND=1 VVC_MIP_SKIP_PROBE=1 timeout 1800 python bench.py 2>&1 \
    | grep -v WARNING | tail -1
echo "== done $(date -u +%H:%M:%S)"
