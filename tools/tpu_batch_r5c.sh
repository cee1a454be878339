#!/bin/bash
# Round-5 batch, part C — re-runs for entries parts A/B lost to the
# two in-flight code states:
#   * the 4K side bench errored at 12:25 against the pre-lane-tile
#     band-shrink code (k=4 violates Mosaic's sublane rule);
#   * the VVC_RB_K=16 e2e A/Bs at 12:28 imported a half-edited tree
#     (cost_engine passing cl= before rowband.py grew the kwarg).
# Usage: bash tools/tpu_batch_r5c.sh /tmp/tpu_batch_r5c.log
set -u
LOG=${1:-/tmp/tpu_batch_r5c.log}
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export VVC_MIP_SKIP_PROBE=1
export VVC_BENCH_ROUND=r5
: > "$LOG"
log() { echo "== $*" >> "$LOG"; }

log "probe $(date -u +%H:%M:%S)"
timeout -k 10 120 python -c "import jax; print(jax.devices())" \
    >> "$LOG" 2>&1 || { log "RELAY DOWN"; exit 1; }

# 4K compile+run smoke under the scoped-estimate gate (part B's 4K
# bit-exact failed twice: band-shrink k=4 lowering, then the 8x16@512
# predv-dominated scoped OOM the box proxy missed).
log "4K compile smoke (scoped-est gate) $(date -u +%H:%M:%S)"
timeout 2400 python - >> "$LOG" 2>&1 <<'EOF'
import numpy as np, jax
from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine
from vvc_mip_gpu_tpu.io.frames import synthetic_frames
f = synthetic_frames(1, 3840, 2160)[0].astype(np.int32)
eng = MipCostEngine(3840, 2160, max_performance=True)
out = eng(f)
print("4K smoke OK", int(np.asarray(out.min_sad_had).ravel()[-1]))
EOF
log "4K smoke rc=$? $(date -u +%H:%M:%S)"

# Default-config e2e under the lane-tile code (1080p tilings are
# identical at k=8, so this should reproduce ~8.13 ms).
log "e2e-max default (lane-tile code) $(date -u +%H:%M:%S)"
timeout 1800 python tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
    | grep -v WARNING | tail -1 >> "$LOG"

# Never-measured routing extension: the 32-wide SizeId2 classes have
# 60-column stride-32 lattices at 1080p (47% lane fill) that only the
# r5 pack lever can route at >=0.9 fill; the fresh ablation still
# bills ~1.9 ms/frame to the non-routed classes' materialized gathers.
log "e2e-max RB_CLASSES=+32wide RB_PACK=1 $(date -u +%H:%M:%S)"
VVC_RB_PACK=1 \
VVC_RB_CLASSES="16x8,8x16,16x16,16x32,8x8,8x4,32x32,32x16,32x8,32x4" \
timeout 1800 python tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
    | grep -v WARNING | tail -3 >> "$LOG"
log "e2e-max RB_CLASSES=all RB_PACK=1 $(date -u +%H:%M:%S)"
VVC_RB_PACK=1 VVC_RB_CLASSES=all \
timeout 1800 python tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
    | grep -v WARNING | tail -3 >> "$LOG"

log "e2e-max VVC_RB_K=16 $(date -u +%H:%M:%S)"
VVC_RB_K=16 timeout 1800 python tools/profile_stages.py \
    --e2e-max --e2e-only 2>&1 | grep -v WARNING | tail -3 >> "$LOG"
log "e2e-max VVC_RB_PACK=1 VVC_RB_K=16 $(date -u +%H:%M:%S)"
VVC_RB_PACK=1 VVC_RB_K=16 timeout 1800 python tools/profile_stages.py \
    --e2e-max --e2e-only 2>&1 | grep -v WARNING | tail -3 >> "$LOG"

side() {
  local tag=$1; shift
  log "bench $*"
  local out
  out=$(timeout "${SIDE_TIMEOUT:-2400}" python bench.py "$@" 2>&1 \
        | grep -v WARNING | tail -1)
  if [ -z "$out" ] || [ "${out#\{}" = "$out" ]; then
    out="{\"metric\": \"$tag\", \"value\": null, \"unit\": null, \
\"vs_baseline\": null, \"round\": \"r5\", \
\"error\": \"timeout or no JSON line\"}"
  fi
  echo "$out" | tee -a BENCH_SIDE.json >> "$LOG"
}
log "4K side bench (lane-tile code) $(date -u +%H:%M:%S)"
side mip_search_3840x2160_frames_per_second \
     --resolution 3840x2160 --batch 4

# 4x8/4x16 compile-time root cause (VERDICT r4 weak #6): split
# trace+lower (local) from backend compile (relay) per class.
log "rb compile probe $(date -u +%H:%M:%S)"
timeout 3600 python tools/rb_compile_probe.py --compile \
    8x4 4x8 4x16 16x4 2>&1 | grep -v WARNING >> "$LOG"

# The full 4K bit-exact run (CPU golden grind + TPU diff) — LAST so
# the timed entries above land even if the relay window closes.
log "tpu bit-exact 4K re-run #2 (scoped-est gate) $(date -u +%H:%M:%S)"
VVC_TPU_TESTS=1 timeout 7200 python -m pytest \
    tests/test_tpu_bit_exact.py -m tpu -q \
    -k "default_levers and res3" >> "$LOG" 2>&1
log "4K bit-exact rc=$? $(date -u +%H:%M:%S)"

log "done $(date -u +%H:%M:%S)"

python - <<'EOF'
import json
lines = [json.loads(l) for l in open("BENCH_SIDE.json") if l.strip()]
last = {}
for rec in lines:
    last[rec["metric"]] = rec
with open("BENCH_SIDE.json", "w") as f:
    for rec in last.values():
        f.write(json.dumps(rec) + "\n")
EOF

{ cat evidence/tpu_batch_r5.log 2>/dev/null
  echo "===== tpu_batch_r5 PART C (lane-tile re-runs) ====="
  cat "$LOG"
} > /tmp/tpu_batch_r5_merged.log && \
    mv /tmp/tpu_batch_r5_merged.log evidence/tpu_batch_r5.log
