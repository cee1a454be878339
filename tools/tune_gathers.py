"""Per-group boundary-gather micro-benchmarks (hardware A/B harness).

Decomposes one class's boundary-gather isolate (profile_stages' bnd_gather)
into per-group ref_t / ref_l(kernel) / ref_l(xla) / fixup parts, so the
round-4 attack on the 4-wide classes' 0.7-0.9 ms gathers targets the real
cost and not a bucket.

Usage:
  python tools/tune_gathers.py --class 4x4
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--class", dest="cls", required=True, help="WxH")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    args = p.parse_args()

    from vvc_mip_gpu_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import tools.profile_stages as ps

    from vvc_mip_gpu_tpu.constants import num_ctus
    from vvc_mip_gpu_tpu.models.cost_engine import (
        _group_stride, _pad_edge, gather_strides)
    from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
    from vvc_mip_gpu_tpu.ops.geometry import class_plans, padded_extent
    from vvc_mip_gpu_tpu.ops.pallas.gather import fetch_rows

    want_w, want_h = (int(v) for v in args.cls.split("x"))
    cplan = next(cp for cp in class_plans(args.width, args.height)
                 if cp.shape.width == want_w and cp.shape.height == want_h)
    mode_minor = cplan.shape.size_id < 2

    rng = np.random.default_rng(0)
    frame = jax.device_put(jnp.asarray(
        rng.integers(0, 1024, size=(args.height, args.width),
                     dtype=np.int32)))

    hp, wp = padded_extent(args.width, args.height)
    strides = gather_strides(args.width, args.height)
    w_eff = num_ctus(args.width, args.height)[0] * 128

    def _padded(fr):
        fr16 = fr.astype(jnp.int16)
        frame_pad = _pad_edge(fr16, hp, wp)
        halo_pad = _pad_edge(fr16[:1], 1, wp)
        ref_ext_pad = jnp.concatenate([halo_pad, frame_pad], axis=0)
        f_frame = {s: soa.phase_split4(frame_pad[:, :w_eff], s,
                                       pad_lanes=True, pad_rows=8)
                   for s in strides}
        f_slab = {s: soa.phase_split4(ref_ext_pad[:, :w_eff], s)
                  for s in strides}
        return f_frame, f_slab

    for gi, gp in enumerate(cplan.groups):
        stride = _group_stride(gp)
        h = gp.height
        oy = int(gp.ys[0])
        sy = gp.y_prog[1] if (gp.y_prog and gp.n_rows > 1) else h
        x0 = gp.x_prog[0]
        s = stride
        p_left = soa.phase4_pos((x0 - 1) % s, s)
        print(f"group {gi}: x0={x0} oy={oy} sy={sy} h={h} "
              f"n_r={gp.n_rows} n_c={gp.n_cols} stride={s}", flush=True)

        def rt_only(fr, _gp=gp, _s=stride):
            _, f_slab = _padded(fr)
            return soa.gather_top_phase4(f_slab[_s], _gp, True,
                                         t_mod4=True)

        print(f"  rt:            {ps.device_ms(rt_only, frame):7.3f} ms",
              flush=True)

        def rl_kernel(fr, _gp=gp, _s=stride, _pl=p_left, _oy=oy, _sy=sy,
                      _h=h):
            f_frame, _ = _padded(fr)
            try:
                rl = fetch_rows(f_frame[_s], runs=((_pl, 1),), oy=_oy,
                                sy=_sy, h=_h, n_r=_gp.n_rows,
                                c_log=_gp.n_cols)
            except ValueError as e:
                raise RuntimeError(f"fetch_rows rejected: {e}") from e
            return rl

        try:
            ms = ps.device_ms(rl_kernel, frame)
            print(f"  rl(kernel):    {ms:7.3f} ms", flush=True)
        except RuntimeError as e:
            print(f"  rl(kernel):    n/a ({e})", flush=True)

        def rl_xla(fr, _gp=gp, _s=stride):
            _, f_slab = _padded(fr)
            return soa.gather_left_phase4(f_slab[_s], _gp)

        print(f"  rl(xla):       {ps.device_ms(rl_xla, frame):7.3f} ms",
              flush=True)

        def _rl(f_frame, f_slab, _gp=gp, _s=stride, _pl=p_left, _oy=oy,
                _sy=sy, _h=h, _x0=x0):
            try:
                rl = fetch_rows(f_frame[_s], runs=((_pl, 1),), oy=_oy,
                                sy=_sy, h=_h, n_r=_gp.n_rows,
                                c_log=_gp.n_cols)
                if _x0 == 0:
                    rl = jnp.concatenate([rl[:, :1], rl[:, :-1]], axis=1)
            except ValueError:
                rl = soa.gather_left_phase4(f_slab[_s], _gp)
            return rl

        def rl_full(fr, _gp=gp, _s=stride):
            f_frame, f_slab = _padded(fr)
            rl = _rl(f_frame, f_slab)
            return soa.left_fixups4(rl, f_slab[_s], _gp, True)

        print(f"  rl(kern+fix):  {ps.device_ms(rl_full, frame):7.3f} ms",
              flush=True)

        def pad_gather(fr, _gp=gp, _s=stride):
            _, f_slab = _padded(fr)
            return f_slab[_s][0, np.asarray(_gp.ys), 0]

        print(f"  pad gather:    {ps.device_ms(pad_gather, frame):7.3f}"
              " ms", flush=True)

        def rl_fix_const(fr, _gp=gp, _s=stride):
            # where with a CONSTANT pad value (isolates the select cost
            # from the pad_rows gather cost)
            f_frame, f_slab = _padded(fr)
            rl = _rl(f_frame, f_slab)
            fix_l = jnp.asarray(np.tile(_gp.xs == 0, _gp.n_rows))
            return jnp.where(fix_l[None, :], jnp.int16(512), rl)

        print(f"  rl+fix(const): {ps.device_ms(rl_fix_const, frame):7.3f}"
              " ms", flush=True)

        def rl_fix_slice(fr, _gp=gp, _s=stride):
            # pad_rows via a STRIDED SLICE of the slab's column 0 (the ys
            # lattice is a uniform progression) instead of a take-gather
            if _gp.y_prog is None:
                raise ValueError("non-uniform lattice")
            f_frame, f_slab = _padded(fr)
            rl = _rl(f_frame, f_slab)
            o, st = _gp.y_prog
            col0 = f_slab[_s][0, :, 0]
            n = _gp.n_rows
            rows = jax.lax.slice(col0, (o,), (o + (n - 1) * st + 1,),
                                 (st,))
            pad_rows = jnp.where(
                jnp.logical_and(jnp.asarray(_gp.ys == 0), True),
                jnp.int16(512), rows)
            pad_l = jnp.repeat(pad_rows, _gp.n_cols)
            fix_l = jnp.asarray(np.tile(_gp.xs == 0, _gp.n_rows))
            return jnp.where(fix_l[None, :], pad_l[None, :], rl)

        try:
            ms = ps.device_ms(rl_fix_slice, frame)
            print(f"  rl+fix(slice): {ms:7.3f} ms", flush=True)
        except ValueError as e:
            print(f"  rl+fix(slice): n/a ({e})", flush=True)


if __name__ == "__main__":
    main()
