"""Per-stage and per-class timing breakdown of the 1080p pipeline on TPU.

Not part of the library API: a development harness for finding where frame
time goes.  The axon relay adds ~8-30 ms per Python-level dispatch/sync, so
every measured computation is repeated K times *inside one jit* via
lax.fori_loop (inputs xor-perturbed per iteration so repetitions cannot be
CSE'd), timed as the min over several syncs, minus a measured
trivial-dispatch baseline.  This cancels the dispatch/sync round-trip but
NOT the fori_loop carry overhead, so per-stage numbers can be slightly
overstated; use them as ratios, not absolutes.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from vvc_mip_gpu_tpu.models.cost_engine import _compute
from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
from vvc_mip_gpu_tpu.ops.geometry import class_plans

W, H = 1920, 1080
import os as _os

if _os.environ.get("VVC_PROF_RES"):
    # e.g. VVC_PROF_RES=3840x2160 — the 4K tuning runs (the reference's
    # second benchmark workload, powerTracer_NVIDIA.py:33-80) reuse this
    # harness and tools/profile_incontext.py (which reads ps.W/ps.H).
    W, H = (int(v) for v in _os.environ["VVC_PROF_RES"].lower().split("x"))
K = 48


def _sync(out):
    # Through the axon relay, block_until_ready returns before device
    # execution finishes; a one-element readback is the only reliable sync.
    return int(jax.tree_util.tree_leaves(out)[-1].ravel()[-1])


def device_ms(body, x0):
    """Approximate device ms of body(x): K in-jit repetitions, min-of-runs,
    minus the trivial-dispatch baseline (see module docstring for caveats).

    body: x (int array) -> scalar-reducible pytree.  The loop xors the input
    with the iteration index so repetitions cannot be CSE'd away.
    """

    @jax.jit
    def run(x):
        def it(i, acc):
            out = body(x ^ i.astype(x.dtype))
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(l.ravel()[-1].astype(jnp.int32) for l in leaves)
            return acc + s
        return jax.lax.fori_loop(0, K, it, jnp.int32(0))

    _sync(run(x0))  # compile
    best = min(_timed(lambda j=j: _sync(run(x0 ^ (j + 1))))
               for j in range(5))
    return (best - _baseline()) / K * 1e3


def _timed(thunk):
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


@functools.cache
def _baseline():
    """Min sync round-trip of a trivial dispatch (constant overhead)."""
    x = jnp.int32(7)
    f = jax.jit(lambda v: v + 1)
    _sync(f(x))
    return min(_timed(lambda j=j: _sync(f(x + j))) for j in range(10))


def main():
    from vvc_mip_gpu_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    frame = jax.device_put(jnp.asarray(
        rng.integers(0, 1024, size=(H, W), dtype=np.int32)))

    import sys
    if "--e2e" in sys.argv:
        e2e = device_ms(
            lambda fr: _compute(fr, fr, width=W, height=H).min_sad_had,
            frame)
        print(f"end-to-end single frame: {e2e:8.2f} ms", flush=True)
    if "--e2e-max" in sys.argv:
        # The bench configuration (max_performance: msh only).
        e2e = device_ms(
            lambda fr: _compute(fr, fr, width=W, height=H,
                                max_performance=True).min_sad_had,
            frame)
        print(f"end-to-end single frame (max-perf): {e2e:8.2f} ms",
              flush=True)
    if "--e2e-max-noreorder" in sys.argv:
        # Diagnostic: how much of the e2e the lattice->CTU cost reorder
        # really costs IN CONTEXT (the isolates overstate).  Replaces the
        # mode-minor reorder with a layout-wrong but byte-identical
        # reshape; costs are unusable, timing is the point.
        from vvc_mip_gpu_tpu.ops import geometry as geom

        def _no_reorder(self, costs_t):
            n = self.ctu_rows * self.ctu_cols
            return costs_t.reshape(n, -1)

        geom.GroupPlan.lattice_costs_to_ctu_mode_minor = _no_reorder
        e2e = device_ms(
            lambda fr: _compute(fr, fr, width=W, height=H,
                                max_performance=True).min_sad_had,
            frame)
        print(f"end-to-end single frame (max-perf, NO reorder): "
              f"{e2e:8.2f} ms", flush=True)
        return
    if "--e2e-only" in sys.argv:
        return

    from vvc_mip_gpu_tpu.models.cost_engine import _pad_edge
    from vvc_mip_gpu_tpu.ops.geometry import padded_extent

    from vvc_mip_gpu_tpu.models.cost_engine import gather_strides as _gs

    def _padded(fr):
        from vvc_mip_gpu_tpu.constants import num_ctus

        fr16 = fr.astype(jnp.int16)
        hp, wp = padded_extent(W, H)
        strides = _gs(W, H)
        w_eff = num_ctus(W, H)[0] * 128
        frame_pad = _pad_edge(fr16, hp, wp)
        halo_pad = _pad_edge(fr16[:1], 1, wp)
        ref_ext_pad = jnp.concatenate([halo_pad, frame_pad], axis=0)
        ref_pad = jnp.concatenate([ref_ext_pad[:, :1], ref_ext_pad],
                                  axis=1)
        f_frame = {s: soa.phase_split4(frame_pad[:, :w_eff], s,
                                       pad_lanes=True, pad_rows=8)
                   for s in strides}
        f_slab = {s: soa.phase_split4(ref_ext_pad[:, :w_eff], s)
                  for s in strides}
        return frame_pad, ref_pad, f_frame, f_slab

    # stage A: gathers + boundary reduce + Pallas pred (mirrors the
    # engine: mode-minor raster for SizeId0/1, %4 perms + grouped layout
    # for SizeId2)
    from vvc_mip_gpu_tpu.ops.pallas import pred as pallas_pred
    from vvc_mip_gpu_tpu.ops.pallas.distortion import (
        _mod4_major, default_cu_tile, input_perms)

    from vvc_mip_gpu_tpu.models.cost_engine import (
        _group_stride, gather_strides)

    from vvc_mip_gpu_tpu.models.cost_engine import _gather_group_phase4

    def _class_inputs(frame_pad, ref_pad, cplan, f_frame=None, f_ref=None):
        """Mirror of _class_costs's gather stage (phase4 pipeline)."""
        shape = cplan.shape
        h, w = shape.height, shape.width
        mode_minor = shape.size_id < 2
        if mode_minor:
            row_perm = col_perm = None
        else:
            row_perm, col_perm = _mod4_major(h), _mod4_major(w)
        rts, rls, origs = [], [], []
        for gp in cplan.groups:
            stride = _group_stride(gp)
            if stride is not None and f_frame is not None:
                rt, rl, og = _gather_group_phase4(
                    f_frame[stride], f_ref[stride], f_frame[stride], gp,
                    True, use_pallas=True, mode_minor=mode_minor,
                    row_perm=row_perm)
            else:
                rt, rl = soa.gather_boundaries(ref_pad, gp, True)
                og = soa.gather_originals(
                    frame_pad, gp, row_perm,
                    _mod4_major(w) if mode_minor and w > 4 else col_perm,
                    order="xy" if mode_minor else "yx")
                if w > 4:
                    rt = rt[np.asarray(_mod4_major(w))]
            rts.append(rt)
            rls.append(rl)
            origs.append(og)
        ref_t = jnp.concatenate(rts, axis=-1)
        ref_l = jnp.concatenate(rls, axis=-1)
        orig = jnp.concatenate(origs, axis=-1)
        return orig, ref_t, ref_l

    def stage_a(fr):
        frame_pad, ref_pad, f_frame, f_ref = _padded(fr)
        return [_class_inputs(frame_pad, ref_pad, cplan, f_frame, f_ref)
                for cplan in class_plans(W, H)]

    print(f"stage A (gathers, all classes): "
          f"{device_ms(stage_a, frame):8.2f} ms")

    # gathers only (engine path: phase4 pipeline, per-class orders)
    def gathers_only(fr):
        frame_pad, ref_pad, f_frame, f_ref = _padded(fr)
        outs = []
        for cplan in class_plans(W, H):
            outs.append(_class_inputs(frame_pad, ref_pad, cplan,
                                      f_frame, f_ref))
        return outs

    print(f"  gathers only: {device_ms(gathers_only, frame):8.2f} ms",
          flush=True)

    import sys as _sys
    if "--per-class" in _sys.argv:
        # Per-class isolates: orig gather vs boundary gather vs a plain
        # reduction over the same bytes (the read-only floor).
        for cplan in class_plans(W, H):
            shape = cplan.shape
            h, w = shape.height, shape.width

            def orig_only(fr, _cp=cplan):
                frame_pad, ref_pad, f_frame, f_ref = _padded(fr)
                return _class_inputs(frame_pad, ref_pad, _cp,
                                     f_frame, f_ref)[0]

            def bnd_only(fr, _cp=cplan):
                frame_pad, ref_pad, f_frame, f_ref = _padded(fr)
                return _class_inputs(frame_pad, ref_pad, _cp,
                                     f_frame, f_ref)[1:]

            n_cu = sum(gp.n_rows * gp.n_cols for gp in cplan.groups)
            mb = h * w * n_cu * 2 / 1e6
            o_ms = device_ms(orig_only, frame)
            b_ms = device_ms(bnd_only, frame)
            print(f"  class {w:3d}x{h:<3d} nCU={n_cu:6d} orig={mb:7.1f}MB"
                  f" orig_gather={o_ms:6.2f} ms bnd_gather={b_ms:6.2f} ms",
                  flush=True)

        def phase_only(fr):
            frame_pad, ref_pad, f_frame, f_ref = _padded(fr)
            return list(f_frame.values()) + list(f_ref.values())

        print(f"  phase splits only: {device_ms(phase_only, frame):8.2f} ms",
              flush=True)

    # gathers + boundary reduce (isolates the reduce + pred einsum split)
    def gathers_reduce(fr):
        frame_pad, ref_pad, f_frame, f_ref = _padded(fr)
        outs = []
        for cplan in class_plans(W, H):
            shape = cplan.shape
            orig, ref_t, ref_l = _class_inputs(frame_pad, ref_pad, cplan,
                                               f_frame, f_ref)
            red_t = soa.reduce_boundary(ref_t, shape.boundary_size)
            red_l = soa.reduce_boundary(ref_l, shape.boundary_size)
            outs.append((red_t, red_l, orig, ref_t, ref_l))
        return outs

    print(f"  gathers+reduce: {device_ms(gathers_reduce, frame):8.2f} ms",
          flush=True)

    # stage C: per-group cost reorder + strided flatten + min
    from vvc_mip_gpu_tpu.constants import GROUPS, PRED_MODES
    from vvc_mip_gpu_tpu.models.cost_engine import _flatten_strided

    def stage_c(fake_costs):
        sad_blocks, satd_blocks = {}, {}
        k = 0
        for cplan in class_plans(W, H):
            two_m = 2 * PRED_MODES[cplan.shape.size_id]
            off = 0
            n_tot = sum(gp.n_rows * gp.n_cols for gp in cplan.groups)
            sad = fake_costs[:two_m, k:k + n_tot]
            satd = fake_costs[:two_m, k:k + n_tot] ^ 1
            k += n_tot
            for gp in cplan.groups:
                n = gp.n_rows * gp.n_cols
                sad_blocks[gp.group_index] = gp.lattice_costs_to_ctu(
                    sad[:, off:off + n])
                satd_blocks[gp.group_index] = gp.lattice_costs_to_ctu(
                    satd[:, off:off + n])
                off += n
        sf = _flatten_strided(sad_blocks)
        tf = _flatten_strided(satd_blocks)
        return jnp.minimum(2 * sf, tf)

    total_cu = sum(gp.n_rows * gp.n_cols for cp in class_plans(W, H)
                   for gp in cp.groups)
    fake = jax.device_put(jnp.asarray(
        np.random.default_rng(1).integers(0, 1 << 20, (32, total_cu)),
        jnp.int32))
    print(f"  stage C (reorder+flatten+min): {device_ms(stage_c, fake):8.2f}"
          " ms", flush=True)

    # stage C, max-performance form: mode-minor [nCU, 2M] kernel outputs,
    # mid-axis-only reorder (lattice_costs_to_ctu_mode_minor)
    def stage_c_mm(fake_t):
        msh_blocks = {}
        k = 0
        for cplan in class_plans(W, H):
            two_m = 2 * PRED_MODES[cplan.shape.size_id]
            n_tot = sum(gp.n_rows * gp.n_cols for gp in cplan.groups)
            msh = fake_t[k:k + n_tot, :two_m]
            k += n_tot
            off = 0
            for gp in cplan.groups:
                n = gp.n_rows * gp.n_cols
                msh_blocks[gp.group_index] = (
                    gp.lattice_costs_to_ctu_mode_minor(msh[off:off + n]))
                off += n
        return _flatten_strided(msh_blocks)

    fake_t = jax.device_put(jnp.asarray(
        np.random.default_rng(2).integers(0, 1 << 20, (total_cu, 32)),
        jnp.int32))
    print(f"  stage C max-perf (mode-minor reorder): "
          f"{device_ms(stage_c_mm, fake_t):8.2f} ms", flush=True)

    # stage B: pallas distortion per class (inputs fixed per class; the
    # engine's fused-pred max-performance emit="msh_t" configuration)
    from vvc_mip_gpu_tpu.constants import PRED_MODES
    from vvc_mip_gpu_tpu.ops.pallas.distortion import upsample_distortion

    @jax.jit
    def staged(fr):
        frame_pad, ref_pad, f_frame, f_ref = _padded(fr)
        return [_class_inputs(frame_pad, ref_pad, cplan, f_frame, f_ref)
                for cplan in class_plans(W, H)]  # arrays only (jit)

    from vvc_mip_gpu_tpu.ops.pallas.distortion import fused_cu_tile

    vals = staged(frame)
    _sync(vals[-1][0])
    b_total = 0.0
    for cplan, (orig, ref_t, ref_l) in zip(class_plans(W, H), vals):
        shape = cplan.shape
        h, w, r = shape.height, shape.width, shape.reduced_pred_size
        n_cu = orig.shape[-1]
        two_m = 2 * PRED_MODES[shape.size_id]
        mode_minor = shape.size_id < 2
        sid1 = mode_minor and not (h == 4 and w == 4)
        tile = (default_cu_tile(h, w) if mode_minor
                else fused_cu_tile(h, w, two_m))
        if shape.size_id == 2:
            pperm = tuple(int(v) for v in input_perms(h, w, r)[0])
        elif shape.size_id == 0:
            pperm = tuple(int(v)
                          for v in np.arange(16).reshape(4, 4).T.ravel())
        else:
            pperm = None
        mat = jnp.asarray(pallas_pred._augmented_matrix(
            shape.size_id, pperm, mode_minor))
        args = [jax.device_put(a) for a in (orig, ref_t, ref_l, mat)]

        def body(o, _args=args, _h=h, _w=w, _r=r, _tile=tile,
                 _two_m=two_m, _so="xmajor4" if sid1 else "raster"):
            return upsample_distortion(
                None, o, _args[1], _args[2], h=_h, w=_w, r=_r,
                cu_tile=_tile, inputs_permuted=True, mat=_args[3],
                two_m=_two_m, emit="msh_t", sample_order=_so,
                reft_permuted=True)

        ms = device_ms(body, args[0])
        b_total += ms
        # Analytic VPU floor for this class (tools/roofline.py model) —
        # measured/floor is the per-class efficiency gap to attack.
        from tools.roofline import class_ops
        floor = (class_ops(h, w, r, two_m, n_cu)["ops"]
                 / 3.9e12 * 1e3)
        print(f"  class {w:3d}x{h:<3d} sid{shape.size_id} nCU={n_cu:6d} "
              f"2M={two_m:2d} tile={tile:4d}: {ms:7.2f} ms "
              f"(floor {floor:5.2f}, x{ms / floor:4.1f})", end="")

        print()
    print(f"stage B (pallas pred+distortion, sum): {b_total:8.2f} ms")


if __name__ == "__main__":
    main()
