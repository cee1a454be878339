#!/bin/bash
# Round-3 TPU measurement batch (trimmed from tpu_batch_r2.sh):
# the 416x240 bit-exact smoke already passed this session, and the
# VVC_CTU_EMIT dimension collapsed — CTU-direct emission is Mosaic-legal
# only when T*cu_cols % 128 == 0, which no standard resolution satisfies
# (see models/cost_engine.py:_ctu_T), so emit=1 now falls back to
# lattice emit and measures identical to emit=0.  One emit=1 sanity run
# stays to prove the fallback engages cleanly on hardware.
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

# fetch_rows role A/B (emit pinned 0 = lattice emit everywhere).
for m in none left orig both; do
  log "e2e-max VVC_FETCH=$m $(date -u +%H:%M:%S)"
  VVC_FETCH=$m timeout 1800 python \
      tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
      | grep -v WARNING | tail -1 >> "$LOG"
done
log "e2e-max VVC_CTU_EMIT=1 fallback sanity $(date -u +%H:%M:%S)"
VVC_CTU_EMIT=1 timeout 1800 python \
    tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
    | grep -v WARNING | tail -1 >> "$LOG"

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
