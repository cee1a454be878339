#!/bin/sh
# Round-4 tuning batch A: run SEQUENTIALLY on a quiet host (stage isolates
# swing ~2x when the host CPU is busy — .claude/skills/verify/SKILL.md).
# Logs to stdout; caller redirects and preserves under evidence/.
set -x
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
cd /root/repo

echo "== gathers 4x4 / 4x8 / 4x16 $(date +%H:%M:%S)"
timeout 900 python tools/tune_gathers.py --class 4x4 2>&1 | grep -v WARNING
timeout 900 python tools/tune_gathers.py --class 4x8 2>&1 | grep -v WARNING
timeout 900 python tools/tune_gathers.py --class 4x16 2>&1 | grep -v WARNING

echo "== kernels 4x4 $(date +%H:%M:%S)"
timeout 900 python tools/tune_kernels.py --class 4x4 \
    --variants "t1024u0,t512u0,t2048u0,t1024u0L" 2>&1 | grep -v WARNING

echo "== kernels 64x64 $(date +%H:%M:%S)"
timeout 900 python tools/tune_kernels.py --class 64x64 \
    --variants "t128u0,t128u2,t128u4,t128u6" 2>&1 | grep -v WARNING

echo "== kernels 8x16 $(date +%H:%M:%S)"
timeout 900 python tools/tune_kernels.py --class 8x16 \
    --variants "t1024u0,t512u0,t1024u2" 2>&1 | grep -v WARNING

echo "== e2e reorder diagnostic $(date +%H:%M:%S)"
timeout 900 python tools/profile_stages.py --e2e-max-noreorder 2>&1 \
    | grep -v WARNING
timeout 900 python tools/profile_stages.py --e2e-max --e2e-only 2>&1 \
    | grep -v WARNING

echo "== done $(date +%H:%M:%S)"
