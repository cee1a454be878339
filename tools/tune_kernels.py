"""Per-class kernel variant tuner (hardware A/B harness, not library API).

Measures one shape class's fused distortion kernel under (cu_tile, unroll)
variants on the real chip, using profile_stages' in-jit repetition
methodology.  Drives the round-4 attack on the classes measured far off
their roofline floors (evidence/tpu_batch_r3.log: 64x64 at 5.0x, 32x32 at
3.3x, 8x32 at 3.0x...).

Usage:
  python tools/tune_kernels.py --class 64x64 --variants \
      "t128u1,t128u2,t128u3,t256u1,t256u2"
  (tNNN = cu_tile, uN = modes per loop iteration; u0 = auto/default)
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--class", dest="cls", required=True, help="WxH")
    p.add_argument("--variants", required=True,
                   help="comma list of tNNNuM tokens")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    args = p.parse_args()

    from vvc_mip_gpu_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import tools.profile_stages as ps

    ps.W, ps.H = args.width, args.height
    from vvc_mip_gpu_tpu.constants import PRED_MODES
    from vvc_mip_gpu_tpu.ops.geometry import class_plans
    from vvc_mip_gpu_tpu.ops.pallas import pred as pallas_pred
    from vvc_mip_gpu_tpu.ops.pallas.distortion import (
        input_perms, upsample_distortion)

    want_w, want_h = (int(v) for v in args.cls.split("x"))
    cplan = next(cp for cp in class_plans(args.width, args.height)
                 if cp.shape.width == want_w and cp.shape.height == want_h)
    shape = cplan.shape
    h, w, r = shape.height, shape.width, shape.reduced_pred_size
    two_m = 2 * PRED_MODES[shape.size_id]
    mode_minor = shape.size_id < 2
    sid1 = mode_minor and not (h == 4 and w == 4)

    rng = np.random.default_rng(0)
    frame = jax.device_put(jnp.asarray(
        rng.integers(0, 1024, size=(args.height, args.width),
                     dtype=np.int32)))

    # Build the class inputs once via the engine's gather pipeline
    # (mirrors profile_stages stage B).
    from vvc_mip_gpu_tpu.models.cost_engine import (
        _gather_group_phase4, _group_stride, _pad_edge, gather_strides)
    from vvc_mip_gpu_tpu.constants import num_ctus
    from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
    from vvc_mip_gpu_tpu.ops.geometry import padded_extent
    from vvc_mip_gpu_tpu.ops.pallas.distortion import _mod4_major

    @jax.jit
    def staged(fr):
        fr16 = fr.astype(jnp.int16)
        hp, wp = padded_extent(args.width, args.height)
        strides = gather_strides(args.width, args.height)
        w_eff = num_ctus(args.width, args.height)[0] * 128
        frame_pad = _pad_edge(fr16, hp, wp)
        halo_pad = _pad_edge(fr16[:1], 1, wp)
        ref_ext_pad = jnp.concatenate([halo_pad, frame_pad], axis=0)
        f_frame = {s: soa.phase_split4(frame_pad[:, :w_eff], s,
                                       pad_lanes=True, pad_rows=8)
                   for s in strides}
        f_slab = {s: soa.phase_split4(ref_ext_pad[:, :w_eff], s)
                  for s in strides}
        row_perm = None if mode_minor else _mod4_major(h)
        rts, rls, ogs = [], [], []
        for gp in cplan.groups:
            stride = _group_stride(gp)
            rt, rl, og = _gather_group_phase4(
                f_frame[stride], f_slab[stride], f_frame[stride], gp,
                True, use_pallas=True, mode_minor=mode_minor,
                row_perm=row_perm)
            rts.append(rt)
            rls.append(rl)
            ogs.append(og)
        return (jnp.concatenate(ogs, -1), jnp.concatenate(rts, -1),
                jnp.concatenate(rls, -1))

    orig, ref_t, ref_l = (jax.device_put(a) for a in staged(frame))
    ps._sync(orig)

    if shape.size_id == 2:
        pperm = tuple(int(v) for v in input_perms(h, w, r)[0])
    elif shape.size_id == 0:
        pperm = tuple(int(v) for v in np.arange(16).reshape(4, 4).T.ravel())
    else:
        pperm = None
    mat = jax.device_put(jnp.asarray(pallas_pred._augmented_matrix(
        shape.size_id, pperm, mode_minor)))

    n_cu = orig.shape[-1]
    print(f"class {w}x{h} sid{shape.size_id} nCU={n_cu} 2M={two_m}",
          flush=True)

    def _limbs(rt, rl):
        """XLA-precomputed limb stack (the VVC_SID0/1_LIMBS=xla lever)."""
        if sid1 and w > 4:
            rt = rt[np.argsort(_mod4_major(w))]
        bs = shape.boundary_size
        return pallas_pred._augmented_inputs(
            soa.reduce_boundary(rt, bs), soa.reduce_boundary(rl, bs),
            shape.size_id)

    for tok in args.variants.split(","):
        tok = tok.strip()
        xla_limbs = tok.endswith("L")
        if xla_limbs:
            tok = tok[:-1]
        tile = int(tok.split("u")[0][1:])
        unroll = int(tok.split("u")[1])

        def body(o, _tile=tile, _unroll=unroll, _xl=xla_limbs):
            return upsample_distortion(
                None, o, ref_t, ref_l, h=h, w=w, r=r,
                cu_tile=_tile, inputs_permuted=True, mat=mat,
                two_m=two_m, emit="msh_t",
                sample_order="xmajor4" if sid1 else "raster",
                reft_permuted=True, unroll=_unroll,
                limbs=_limbs(ref_t, ref_l) if _xl else None)
        if xla_limbs:
            tok += "L"

        try:
            ms = ps.device_ms(body, orig)
            print(f"  {tok}: {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"  {tok}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
