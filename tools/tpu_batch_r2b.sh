#!/bin/bash
# Follow-up TPU batch: deep-dive the WINNING lever combo from
# tools/tpu_batch_r2.sh (parse with tools/parse_tpu_batch.py first).
# Usage: bash tools/tpu_batch_r2b.sh <fetch> <emit> [/tmp/tpu_batch_b.log]
#   e.g. bash tools/tpu_batch_r2b.sh none 1
set -u
FETCH=${1:?fetch mode (none|left|orig|both)}
EMIT=${2:?ctu emit (0|1)}
LOG=${3:-/tmp/tpu_batch_b.log}
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export VVC_FETCH="$FETCH" VVC_CTU_EMIT="$EMIT"
export VVC_MIP_SKIP_PROBE=1
: > "$LOG"
log() { echo "== $*" >> "$LOG"; }

log "probe $(date -u +%H:%M:%S) (FETCH=$FETCH EMIT=$EMIT)"
timeout -k 10 120 python -c "import jax; print(jax.devices())" \
    >> "$LOG" 2>&1 || { log "RELAY DOWN"; exit 1; }

log "tpu bit-exact tests at winner levers $(date -u +%H:%M:%S)"
VVC_TPU_TESTS=1 timeout 7200 python -m pytest \
    tests/test_tpu_bit_exact.py -m tpu -q 2>&1 | tail -2 >> "$LOG"

log "bench winner $(date -u +%H:%M:%S)"
timeout 1200 python bench.py 2>&1 | grep -v WARNING | tail -1 >> "$LOG"

for b in 4 12; do
  log "bench winner --batch $b $(date -u +%H:%M:%S)"
  timeout 1200 python bench.py --batch "$b" 2>&1 | grep -v WARNING \
      | tail -1 >> "$LOG"
done

log "e2e full-report winner $(date -u +%H:%M:%S)"
timeout 1800 python tools/profile_stages.py --e2e --e2e-only 2>&1 \
    | grep -v WARNING | tail -1 >> "$LOG"

log "stage breakdown winner $(date -u +%H:%M:%S)"
timeout 3000 python tools/profile_stages.py 2>&1 | grep -v WARNING \
    >> "$LOG"

log "per-class winner $(date -u +%H:%M:%S)"
timeout 3000 python tools/profile_stages.py --per-class 2>&1 \
    | grep -v WARNING >> "$LOG"

log "done $(date -u +%H:%M:%S)"
