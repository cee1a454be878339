#!/bin/bash
# Round-5 tuning batch (runs AFTER tools/tpu_batch_r5.sh banked the
# verification).  Evidence-first attack on the 8.10 -> ~3.5 ms gap
# (VERDICT r4 next #3/#4):
#   A. re-budget: in-context ablation with the shipped rowband default ON
#      (the committed ablate_r4.log predates the default flip)
#   B. VVC_RB_PACK lane-packing A/B (routes the 0.47-fill stride-32
#      partitions; see cost_engine._rb_pack_factor)
#   C. VVC_RB_K band-height sweep under the k-aware gate
#   D. per-class in-context pack A/B for the affected classes
#   E. widened class sets with packing (32-wides become routable)
#   F. the 4x8/4x16 rowband compile-time root cause: measured compile
#      wall time per class set
#   G. 4K e2e A/B (VVC_PROF_RES) for the same levers
# Usage: bash tools/tpu_tune_r5.sh /tmp/tpu_tune_r5.log
set -u
LOG=${1:-/tmp/tpu_tune_r5.log}
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export VVC_MIP_SKIP_PROBE=1
: > "$LOG"
log() { echo "== $*" >> "$LOG"; }
e2e() {
  # $1 = label; remaining args exported as env for the run
  local label=$1; shift
  log "e2e-max [$label] $(date -u +%H:%M:%S)"
  env "$@" timeout 1800 python tools/profile_stages.py \
      --e2e-max --e2e-only 2>&1 | grep -v WARNING | tail -1 >> "$LOG"
}

log "probe $(date -u +%H:%M:%S)"
timeout -k 10 120 python -c "import jax; print(jax.devices())" \
    >> "$LOG" 2>&1 || { log "RELAY DOWN"; exit 1; }

# A. Re-budget the remaining gap under shipped defaults.
log "incontext ablate (rowband default ON) $(date -u +%H:%M:%S)"
timeout 3600 python tools/profile_incontext.py --ablate 2>&1 \
    | grep -v WARNING >> "$LOG"

# B. Lane-packing A/B (same session ordering: control first).
e2e "pack=0 control"            VVC_RB_PACK=0
e2e "pack=1"                    VVC_RB_PACK=1
e2e "pack=1 (repeat)"           VVC_RB_PACK=1
e2e "pack=0 (repeat)"           VVC_RB_PACK=0

# C. Band-height sweep (k-aware gate; pack at its B-winner separately).
e2e "k=4"                       VVC_RB_K=4
e2e "k=16"                      VVC_RB_K=16
e2e "pack=1 k=4"                VVC_RB_PACK=1 VVC_RB_K=4
e2e "pack=1 k=16"               VVC_RB_PACK=1 VVC_RB_K=16

# D. Per-class in-context pack A/B (the 32-wides route ONLY packed at
# 1080p, so their pack=0 run is the default-path control).
for cls in 16x8 16x16 8x16 8x8 16x32 32x8 32x16 32x32; do
  log "only-class $cls pack=0 $(date -u +%H:%M:%S)"
  timeout 1200 python tools/profile_incontext.py --class $cls 2>&1 \
      | grep -v WARNING | tail -1 >> "$LOG"
  log "only-class $cls pack=1 $(date -u +%H:%M:%S)"
  VVC_RB_PACK=1 VVC_RB_CLASSES=all timeout 1200 \
      python tools/profile_incontext.py \
      --class $cls 2>&1 | grep -v WARNING | tail -1 >> "$LOG"
done

# E. Widened class sets (32-wides route only with packing at 1080p).
RB32="16x8,8x16,16x16,16x32,8x8,8x4,32x8,32x16,32x32,32x4"
e2e "pack=1 +32x8,32x16"        VVC_RB_PACK=1 VVC_RB_CLASSES="$RB32"
e2e "pack=1 all"                VVC_RB_PACK=1 VVC_RB_CLASSES=all

# F. 4-wide rowband compile-time (cold-cache wall time per set).
for cls in 8x4 4x8 4x16; do
  log "compile-time probe class=$cls $(date -u +%H:%M:%S)"
  VVC_RB_CLASSES=$cls VVC_RB_PACK=0 timeout 2400 python - <<PYEOF >> "$LOG" 2>&1
import time, numpy as np
import jax, jax.numpy as jnp
from vvc_mip_gpu_tpu.models.cost_engine import _compute
t0 = time.perf_counter()
fr = jnp.asarray(np.zeros((1080, 1920), np.int32))
out = _compute(fr, fr, 1920, 1080, max_performance=True).min_sad_had
print("compile+run s:", round(time.perf_counter() - t0, 1), flush=True)
PYEOF
done

# G. 4K: same levers at the reference's second workload geometry.
e2e "4K default"                VVC_PROF_RES=3840x2160
e2e "4K pack=1"                 VVC_PROF_RES=3840x2160 VVC_RB_PACK=1
e2e "4K +32-wides"              VVC_PROF_RES=3840x2160 \
                                VVC_RB_CLASSES="$RB32"
e2e "4K pack=1 +32-wides"       VVC_PROF_RES=3840x2160 VVC_RB_PACK=1 \
                                VVC_RB_CLASSES="$RB32"

log "done $(date -u +%H:%M:%S)"
cp "$LOG" evidence/ 2>/dev/null || true
