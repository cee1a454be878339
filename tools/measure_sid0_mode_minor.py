"""A/B timing of the SizeId0 path: mode-minor pred layout (baked into the
weight matrices, no transpose op) vs the classic [2M, S, nCU] layout with a
swapaxes before the kernel.  Mirrors cost_engine._class_costs for the sid0
class; same in-jit K-loop min-of-runs methodology as profile_stages."""

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_stages import device_ms, W, H
from vvc_mip_gpu_tpu.models.cost_engine import _pad_edge
from vvc_mip_gpu_tpu.ops.geometry import class_plans, padded_extent
from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
from vvc_mip_gpu_tpu.ops.pallas.distortion import (
    _mod4_major, input_perms, upsample_distortion)


def main():
    rng = np.random.default_rng(0)
    frame = jax.device_put(jnp.asarray(
        rng.integers(0, 1024, size=(H, W), dtype=np.int32)))

    (cplan,) = [cp for cp in class_plans(W, H) if cp.shape.size_id == 0]
    shape = cplan.shape
    h, w, r = shape.height, shape.width, shape.reduced_pred_size
    pred_perm = tuple(int(v) for v in input_perms(h, w, r)[0])
    row_perm, col_perm = _mod4_major(h), _mod4_major(w)
    up_v = h // r

    def path(fr, mode_minor):
        fr16 = fr.astype(jnp.int16)
        ref_ext = jnp.concatenate([fr16[:1], fr16], axis=0)
        hp, wp = padded_extent(W, H)
        frame_pad = _pad_edge(fr16, hp, wp)
        ref_pad = _pad_edge(ref_ext, hp + 1, wp)
        ref_pad = jnp.concatenate([ref_pad[:, :1], ref_pad], axis=1)
        rts, rls, origs = [], [], []
        for gp in cplan.groups:
            rt, rl = soa.gather_boundaries(ref_pad, gp, True)
            rts.append(rt)
            rls.append(rl)
            origs.append(soa.gather_originals(frame_pad, gp, row_perm,
                                              col_perm))
        ref_t = jnp.concatenate(rts, axis=-1)
        ref_l = jnp.concatenate(rls, axis=-1)
        orig = jnp.concatenate(origs, axis=-1)
        red_t = soa.reduce_boundary(ref_t, shape.boundary_size)
        red_l = soa.reduce_boundary(ref_l, shape.boundary_size)
        pred = soa.reduced_prediction_all_modes(
            red_t, red_l, shape.size_id, sample_perm=pred_perm,
            mode_minor=mode_minor)
        return upsample_distortion(
            pred, orig, ref_t, ref_l[up_v - 1::up_v], h=h, w=w, r=r,
            inputs_permuted=True, pred_mode_minor=mode_minor)

    for mm in (False, True, False, True):
        ms = device_ms(lambda fr, _mm=mm: path(fr, _mm), frame)
        print(f"sid0 path mode_minor={mm}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
