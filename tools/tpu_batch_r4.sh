#!/bin/bash
# Round-4 TPU measurement batch: evidence for the r4 kernel/gather work
# plus the artifacts VERDICT r3 flagged missing (with-export, reference
# window decomposition, r1-window reconciliation run, latency mode).
# Ordered highest-value-first in case the relay window is short.  Runs
# SEQUENTIALLY on an otherwise-quiet host (stage isolates swing when the
# host CPU is busy).  The log is copied into evidence/ by the caller.
# Usage: bash tools/tpu_batch_r4.sh /tmp/tpu_batch_r4.log
set -u
LOG=${1:-/tmp/tpu_batch_r4.log}
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export VVC_MIP_SKIP_PROBE=1
: > "$LOG"
log() { echo "== $*" >> "$LOG"; }

log "probe $(date -u +%H:%M:%S)"
timeout -k 10 120 python -c "import jax; print(jax.devices())" \
    >> "$LOG" 2>&1 || { log "RELAY DOWN"; exit 1; }

log "e2e-max (default levers) $(date -u +%H:%M:%S)"
timeout 1800 python tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
    | grep -v WARNING | tail -1 >> "$LOG"
log "e2e full-report (default levers) $(date -u +%H:%M:%S)"
timeout 1800 python tools/profile_stages.py --e2e --e2e-only 2>&1 \
    | grep -v WARNING | tail -1 >> "$LOG"

log "bench (default levers) $(date -u +%H:%M:%S)"
timeout 1200 python bench.py 2>&1 | grep -v WARNING | tail -2 >> "$LOG"

log "per-class (default levers) $(date -u +%H:%M:%S)"
timeout 3000 python tools/profile_stages.py --per-class 2>&1 \
    | grep -v WARNING >> "$LOG"

log "side benches $(date -u +%H:%M:%S)"
: > BENCH_SIDE.json
side() {
  # $1 = metric tag for the timeout placeholder; rest = bench args.
  # A bench killed by `timeout` emits nothing — record an explicit
  # error line so the gap is machine-visible (ADVICE r3).
  local tag=$1; shift
  log "bench $*"
  local out
  out=$(timeout 1800 python bench.py "$@" 2>&1 | grep -v WARNING \
        | tail -1)
  if [ -z "$out" ] || [ "${out#\{}" = "$out" ]; then
    out="{\"metric\": \"$tag\", \"value\": null, \"unit\": null, \
\"vs_baseline\": null, \"error\": \"timeout or no JSON line\"}"
  fi
  echo "$out" | tee -a BENCH_SIDE.json >> "$LOG"
}
side mip_search_1080p_r1window_frames_per_second --window r1
side mip_search_1080p_refwindow_frames_per_second \
     --window reference --iters 2
side mip_search_1080p_with_export_frames_per_second --with-export
side mip_search_1080p_single_frame_latency_ms --latency
side mip_search_1080p_filtered_frames_per_second --filtered
side mip_search_3840x2160_frames_per_second \
     --resolution 3840x2160 --batch 4

log "tpu bit-exact FULL suite (1080p + 4K + filtered + lever matrix) $(date -u +%H:%M:%S)"
VVC_TPU_TESTS=1 timeout 10800 python -m pytest \
    tests/test_tpu_bit_exact.py -m tpu -q >> "$LOG" 2>&1

log "done $(date -u +%H:%M:%S)"
cp "$LOG" evidence/ 2>/dev/null || true
