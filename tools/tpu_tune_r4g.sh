#!/bin/sh
# Round-4 tuning batch G: mode-minor (SizeId0/1) row-band validation.
# Usage: sh tools/tpu_tune_r4g.sh 2>&1 | tee /tmp/tpu_tune_r4g.log
set -x
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
cd /root/repo

date -u +%H:%M:%S
echo "== CLI bit-exact (rowband all size-ids)"
VVC_ROWBAND=1 timeout 1800 python -m vvc_mip_gpu_tpu.cli \
    -f 1 -s 416x240 --Synthetic -l /tmp/rbg_ 2>&1 | grep -v WARNING
timeout 600 python - <<'EOF' 2>&1 | grep -v WARNING
import numpy as np, pandas as pd
from vvc_mip_gpu_tpu.io import frames as fio
from vvc_mip_gpu_tpu.golden import reference_model as gm
from vvc_mip_gpu_tpu.constants import STRIDED_DISTORTIONS_PER_CTU
fr = fio.synthetic_frames(1, 416, 240)[0].astype(np.int64)
df = pd.read_csv('/tmp/rbg_mip_decisions.csv')
msh = df.minSadHad.to_numpy().reshape(-1, int(STRIDED_DISTORTIONS_PER_CTU[-1]))
exp = gm.frame_costs(fr)
e = gm.flatten_strided(exp, "min_sad_had")
valid = np.concatenate([np.repeat(exp[g].valid, exp[g].sad.shape[-1], axis=1)
                        for g in sorted(exp)], axis=1)
bad = int(((e != msh) & valid).sum())
print("ROWBAND-ALLSID CLI bit-exact mismatches:", bad, "of", int(valid.sum()))
EOF

date -u +%H:%M:%S
echo "== e2e A/B (rowband-all vs default)"
VVC_ROWBAND=1 timeout 1800 python tools/profile_stages.py \
    --e2e-max --e2e-only 2>&1 | grep -v WARNING
timeout 900 python tools/profile_stages.py \
    --e2e-max --e2e-only 2>&1 | grep -v WARNING

date -u +%H:%M:%S
echo "== per-class A/B (mode-minor classes)"
for c in 4x4 8x8 16x4 8x4 4x8 4x16; do
  VVC_ROWBAND=1 timeout 900 python tools/profile_incontext.py \
      --class "$c" 2>&1 | grep -v WARNING
  timeout 900 python tools/profile_incontext.py \
      --class "$c" 2>&1 | grep -v WARNING
done

date -u +%H:%M:%S
echo "== k sweep (4x4, 8x8)"
for kk in 4 16; do
  VVC_ROWBAND=1 VVC_RB_K=$kk timeout 900 python \
      tools/profile_incontext.py --class 4x4 2>&1 | grep -v WARNING
  VVC_ROWBAND=1 VVC_RB_K=$kk timeout 900 python \
      tools/profile_incontext.py --class 8x8 2>&1 | grep -v WARNING
done
echo "== done $(date -u +%H:%M:%S)"
