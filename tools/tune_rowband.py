"""Row-band kernel attribution: where does a class's rowband time go?

For one SizeId2 class, measures IN-JIT (profile_stages.device_ms):
  boxes   — rowband_boxes for every group (XLA slices/pads/concats)
  kernel  — rowband_distortion on PREBUILT boxes (pure kernel+DMA)
  full    — boxes + kernel + per-group CTU reorder (the engine path)
  old     — the default (non-rowband) engine path for the same class
Per (stride) partition, so the coarse-stride lane-padding cost
(C=60 -> 128) is visible separately.

Usage: VVC_RB_K=8 python tools/tune_rowband.py --class 16x16
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

import tools.profile_stages as ps
from vvc_mip_gpu_tpu.constants import PRED_MODES, num_ctus
from vvc_mip_gpu_tpu.models import cost_engine as ce
from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
from vvc_mip_gpu_tpu.ops.geometry import class_plans, padded_extent


def _phase_tensors(fr, W, H, strides):
    fr16 = fr.astype(jnp.int16)
    hp, wp = padded_extent(W, H)
    w_eff = num_ctus(W, H)[0] * 128
    frame_pad = ce._pad_edge(fr16, hp, wp)
    halo_pad = ce._pad_edge(fr16[:1], 1, wp)
    ref_ext_pad = jnp.concatenate([halo_pad, frame_pad], axis=0)
    f_frame = {s: soa.phase_split4(frame_pad[:, :w_eff], s,
                                   pad_lanes=True, pad_rows=8)
               for s in strides}
    f_slab = {s: soa.phase_split4(ref_ext_pad[:, :w_eff], s)
              for s in strides}
    return f_frame, f_slab


def main() -> None:
    from vvc_mip_gpu_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    W, H = ps.W, ps.H
    want = sys.argv[sys.argv.index("--class") + 1]
    ww, hh = (int(v) for v in want.split("x"))
    cplan = next(cp for cp in class_plans(W, H)
                 if cp.shape.width == ww and cp.shape.height == hh)
    shape = cplan.shape
    h, w, r = shape.height, shape.width, shape.reduced_pred_size
    two_m = 2 * PRED_MODES[2]
    strides = tuple(sorted({ce._group_stride(gp) for gp in cplan.groups}))
    rng = np.random.default_rng(0)
    frame = jax.device_put(jnp.asarray(
        rng.integers(0, 1024, size=(H, W), dtype=np.int32)))

    from vvc_mip_gpu_tpu.ops.pallas import pred as pallas_pred
    from vvc_mip_gpu_tpu.ops.pallas.distortion import input_perms
    from vvc_mip_gpu_tpu.ops.pallas.rowband import rowband_distortion

    pred_perm = tuple(int(v) for v in input_perms(h, w, r)[0])
    mat = jnp.asarray(pallas_pred._augmented_matrix(2, pred_perm, False))

    by_stride = {}
    for gp in cplan.groups:
        by_stride.setdefault(ce._group_stride(gp), []).append(gp)

    def boxes_for(fr, s):
        f_frame, f_slab = _phase_tensors(fr, W, H, strides)
        bs = [soa.rowband_boxes(f_frame[s], f_slab[s], gp, True)
              for gp in by_stride[s]]
        og = jnp.concatenate([b[0] for b in bs], axis=1)
        rt = jnp.concatenate([b[1] for b in bs], axis=1)
        rl = jnp.concatenate([b[2] for b in bs], axis=0)
        return og, rt, rl

    for s in strides:
        n_r = sum(gp.n_rows for gp in by_stride[s])
        c = by_stride[s][0].n_cols
        ms_box = ps.device_ms(lambda fr, _s=s: boxes_for(fr, _s), frame)
        print(f"stride {s:3d} (n_r={n_r}, C={c}): boxes "
              f"{ms_box:6.3f} ms", flush=True)

        og0, rt0, rl0 = jax.jit(lambda fr, _s=s: boxes_for(fr, _s))(frame)
        og0, rt0, rl0 = (jax.device_put(x) for x in (og0, rt0, rl0))

        def kern(og, _rt=rt0, _rl=rl0):
            return rowband_distortion(og, _rt, _rl, mat, h=h, w=w, r=r,
                                      two_m=two_m, emit="msh_t")

        ms_k = ps.device_ms(kern, og0)
        print(f"              kernel-only {ms_k:6.3f} ms", flush=True)

    def full(fr):
        f_frame, f_slab = _phase_tensors(fr, W, H, strides)
        out, covered = ce._class_costs_rowband(cplan, f_frame, f_slab,
                                               True, True)
        return list(out.values())

    print(f"full rowband class: {ps.device_ms(full, frame):6.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
