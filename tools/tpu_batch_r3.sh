#!/bin/bash
# Round-3 TPU measurement batch (trimmed from tpu_batch_r2.sh): the
# VVC_CTU_EMIT dimension was retired outright — Mosaic's output-block
# granularity makes CTU-direct emission illegal for every real CU
# geometry (see ops/pallas/distortion.py:_emit_costs) — leaving the
# VVC_FETCH and limb-source levers.
# Ordered highest-value-first in case the relay window is short.
# Usage: bash tools/tpu_batch_r3.sh /tmp/tpu_batch_r3.log
set -u
LOG=${1:-/tmp/tpu_batch_r3.log}
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export VVC_MIP_SKIP_PROBE=1
: > "$LOG"
log() { echo "== $*" >> "$LOG"; }

log "probe $(date -u +%H:%M:%S)"
timeout -k 10 120 python -c "import jax; print(jax.devices())" \
    >> "$LOG" 2>&1 || { log "RELAY DOWN"; exit 1; }

# fetch_rows role A/B.
for m in none left orig both; do
  log "e2e-max VVC_FETCH=$m $(date -u +%H:%M:%S)"
  VVC_FETCH=$m timeout 1800 python \
      tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
      | grep -v WARNING | tail -1 >> "$LOG"
done
# SizeId0/1 limb-source A/B (the mode-on-sublanes classes'
# roofline-gap candidate).
for sl in xla kernel; do
  log "e2e-max VVC_SID0_LIMBS=$sl $(date -u +%H:%M:%S)"
  VVC_SID0_LIMBS=$sl timeout 1800 python \
      tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
      | grep -v WARNING | tail -1 >> "$LOG"
done
log "e2e-max VVC_SID0_LIMBS=xla VVC_SID1_LIMBS=xla $(date -u +%H:%M:%S)"
VVC_SID0_LIMBS=xla VVC_SID1_LIMBS=xla timeout 1800 python \
    tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
    | grep -v WARNING | tail -1 >> "$LOG"

log "per-class (default levers) $(date -u +%H:%M:%S)"
timeout 3000 python tools/profile_stages.py --per-class 2>&1 \
    | grep -v WARNING >> "$LOG"

log "e2e full-report (default levers) $(date -u +%H:%M:%S)"
timeout 1800 python tools/profile_stages.py --e2e --e2e-only 2>&1 \
    | grep -v WARNING | tail -1 >> "$LOG"

log "bench (default levers) $(date -u +%H:%M:%S)"
timeout 1200 python bench.py 2>&1 | grep -v WARNING | tail -2 >> "$LOG"

# Bench-level (dispatch-inclusive) fetch A/B.
for m in both left; do
  log "bench VVC_FETCH=$m $(date -u +%H:%M:%S)"
  VVC_FETCH=$m timeout 1200 python bench.py 2>&1 \
      | grep -v WARNING | tail -1 >> "$LOG"
done

log "side benches $(date -u +%H:%M:%S)"
: > BENCH_SIDE.json
for a in "--window reference --iters 2" "--filtered" \
         "--resolution 3840x2160 --batch 4" "--with-export"; do
  log "bench $a"
  timeout 1800 python bench.py $a 2>&1 | grep -v WARNING | tail -1 \
      | tee -a BENCH_SIDE.json >> "$LOG"
done

log "tpu bit-exact FULL suite (1080p + filtered + lever matrix) $(date -u +%H:%M:%S)"
VVC_TPU_TESTS=1 timeout 7200 python -m pytest tests/test_tpu_bit_exact.py \
    -m tpu -q >> "$LOG" 2>&1

log "done $(date -u +%H:%M:%S)"
