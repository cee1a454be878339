#!/bin/bash
# One-shot TPU validation + A/B batch (run when the axon relay is up;
# each step logs and failures don't stop later steps).  Ordered so the
# highest-value measurements land FIRST in case the relay window is
# short: quick bit-exact smoke -> lever A/B -> benches -> profiles ->
# the full (slow) hardware bit-exact suite.
# Usage: bash tools/tpu_batch_r2.sh /tmp/tpu_batch.log
set -u
LOG=${1:-/tmp/tpu_batch.log}
cd /root/repo
# tools/*.py import the package from the repo root, and /root/.axon_site
# must stay importable for the axon TPU plugin.
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
# The script probes once below; bench.py need not re-probe per call.
export VVC_MIP_SKIP_PROBE=1
: > "$LOG"
log() { echo "== $*" >> "$LOG"; }

log "probe $(date -u +%H:%M:%S)"
timeout -k 10 120 python -c "import jax; print(jax.devices())" \
    >> "$LOG" 2>&1 || { log "RELAY DOWN"; exit 1; }

log "tpu bit-exact smoke (416x240 default levers) $(date -u +%H:%M:%S)"
VVC_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu_bit_exact.py \
    -m tpu -q -k "engine_bit_exact or max_performance" >> "$LOG" 2>&1

# 2-D A/B: fetch_rows roles x CTU-direct emission.
for c in 1 0; do
  for m in none left orig both; do
    log "e2e-max VVC_FETCH=$m VVC_CTU_EMIT=$c $(date -u +%H:%M:%S)"
    VVC_FETCH=$m VVC_CTU_EMIT=$c timeout 1800 python \
        tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
        | grep -v WARNING | tail -1 >> "$LOG"
  done
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
log "per-class VVC_SID0_LIMBS=xla $(date -u +%H:%M:%S)"
VVC_SID0_LIMBS=xla timeout 3000 python tools/profile_stages.py \
    --per-class 2>&1 | grep -v WARNING >> "$LOG"

log "e2e full-report (default levers) $(date -u +%H:%M:%S)"
timeout 1800 python tools/profile_stages.py --e2e --e2e-only 2>&1 \
    | grep -v WARNING | tail -1 >> "$LOG"

log "bench (default levers) $(date -u +%H:%M:%S)"
timeout 1200 python bench.py 2>&1 | grep -v WARNING | tail -2 >> "$LOG"

# Bench-level (dispatch-inclusive) A/B on the three most informative
# configs: old-pipeline proxy, fetch-only, emit-only.
for cfg in "both 1" "both 0" "none 1"; do
  set -- $cfg
  log "bench VVC_FETCH=$1 VVC_CTU_EMIT=$2 $(date -u +%H:%M:%S)"
  VVC_FETCH=$1 VVC_CTU_EMIT=$2 timeout 1200 python bench.py 2>&1 \
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

log "per-class profile (default levers) $(date -u +%H:%M:%S)"
timeout 3000 python tools/profile_stages.py --per-class 2>&1 \
    | grep -v WARNING >> "$LOG"

log "tpu bit-exact FULL suite (1080p + filtered + lever matrix) $(date -u +%H:%M:%S)"
VVC_TPU_TESTS=1 timeout 7200 python -m pytest tests/test_tpu_bit_exact.py \
    -m tpu -q >> "$LOG" 2>&1

log "done $(date -u +%H:%M:%S)"
