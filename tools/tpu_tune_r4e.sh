#!/bin/sh
# Round-4 tuning batch E: row-band kernel hardware validation + A/B.
# 1. Mosaic compile + bit-exactness of VVC_ROWBAND=1 through the CLI
#    surface at 416x240 (diffed against the golden model).
# 2. e2e in-jit A/B (rowband vs default) with a same-session reference.
# 3. Per-class in-context numbers for the classes batch D showed are
#    data-movement-bound (evidence/tpu_tune_r4d.log).
# Usage: sh tools/tpu_tune_r4e.sh 2>&1 | tee /tmp/tpu_tune_r4e.log
set -x
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
cd /root/repo

date -u +%H:%M:%S
VVC_ROWBAND=1 timeout 900 python -m vvc_mip_gpu_tpu.cli \
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
print("ROWBAND CLI bit-exact mismatches:", bad, "of", int(valid.sum()))
EOF

date -u +%H:%M:%S
echo "== e2e A/B"
VVC_ROWBAND=1 timeout 1800 python tools/profile_stages.py \
    --e2e-max --e2e-only 2>&1 | grep -v WARNING
timeout 900 python tools/profile_stages.py \
    --e2e-max --e2e-only 2>&1 | grep -v WARNING

date -u +%H:%M:%S
echo "== rowband per-class"
for c in 16x8 8x16 16x16 8x32 32x8 32x16 16x32 32x32 64x64; do
  VVC_ROWBAND=1 timeout 900 python tools/profile_incontext.py \
      --class "$c" 2>&1 | grep -v WARNING
done
echo "== done $(date -u +%H:%M:%S)"
