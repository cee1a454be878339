#!/bin/sh
# Round-4 tuning batch F: MIXED-MODE row-band validation + attribution.
# After the eligibility gate (lane occupancy >=90%, VMEM bound), the
# rowband path covers the fine-stride partitions of 16x8/8x16/16x16/
# 8x32/16x32 and leaves coarse strides on the default path.
# Usage: sh tools/tpu_tune_r4f.sh 2>&1 | tee /tmp/tpu_tune_r4f.log
set -x
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
cd /root/repo

date -u +%H:%M:%S
echo "== CLI bit-exact (rowband mixed)"
VVC_ROWBAND=1 timeout 1500 python -m vvc_mip_gpu_tpu.cli \
    -f 1 -s 416x240 --Synthetic -l /tmp/rb_ 2>&1 | grep -v WARNING
timeout 600 python - <<'EOF' 2>&1 | grep -v WARNING
import numpy as np, pandas as pd
from vvc_mip_gpu_tpu.io import frames as fio
from vvc_mip_gpu_tpu.golden import reference_model as gm
from vvc_mip_gpu_tpu.constants import STRIDED_DISTORTIONS_PER_CTU
fr = fio.synthetic_frames(1, 416, 240)[0].astype(np.int64)
df = pd.read_csv('/tmp/rb_mip_decisions.csv')
msh = df.minSadHad.to_numpy().reshape(-1, int(STRIDED_DISTORTIONS_PER_CTU[-1]))
exp = gm.frame_costs(fr)
e = gm.flatten_strided(exp, "min_sad_had")
valid = np.concatenate([np.repeat(exp[g].valid, exp[g].sad.shape[-1], axis=1)
                        for g in sorted(exp)], axis=1)
bad = int(((e != msh) & valid).sum())
print("ROWBAND-MIXED CLI bit-exact mismatches:", bad, "of", int(valid.sum()))
EOF

date -u +%H:%M:%S
echo "== e2e A/B (rowband vs default)"
VVC_ROWBAND=1 timeout 1800 python tools/profile_stages.py \
    --e2e-max --e2e-only 2>&1 | grep -v WARNING
timeout 900 python tools/profile_stages.py \
    --e2e-max --e2e-only 2>&1 | grep -v WARNING

date -u +%H:%M:%S
echo "== per-class A/B"
for c in 16x8 8x16 16x16 8x32 16x32; do
  VVC_ROWBAND=1 timeout 900 python tools/profile_incontext.py \
      --class "$c" 2>&1 | grep -v WARNING
  timeout 900 python tools/profile_incontext.py \
      --class "$c" 2>&1 | grep -v WARNING
done

date -u +%H:%M:%S
echo "== rowband k sweep (16x8)"
for kk in 16 32; do
  VVC_ROWBAND=1 VVC_RB_K=$kk timeout 900 python \
      tools/profile_incontext.py --class 16x8 2>&1 | grep -v WARNING
done

date -u +%H:%M:%S
echo "== attribution (boxes vs kernel-only)"
timeout 1200 python tools/tune_rowband.py --class 16x16 2>&1 | grep -v WARNING
timeout 1200 python tools/tune_rowband.py --class 16x8 2>&1 | grep -v WARNING
echo "== done $(date -u +%H:%M:%S)"
