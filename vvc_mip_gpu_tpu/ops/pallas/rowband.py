"""Row-band fused kernel: upsample+SAD+SATD consuming phase-space boxes.

The grouped (SizeId2) kernel in ops/pallas/distortion.py takes orig as a
materialized [h*w, nCU] tensor, which the engine builds from the
phase-split frame with a lane/sublane-crossing XLA relayout — measured at
~1.13 ms/frame in context for the orig family plus a share of the 1.19 ms
boundary family (evidence/ablate_r4.log), ~6x worse than the HBM
bandwidth the same bytes would cost as contiguous copies.  A per-row DMA
relayout kernel (gather.fetch_rows serving the orig role) also lost on
hardware (VVC_FETCH=orig, 8.88 vs 8.58 ms e2e): its n_rows*h*4 row copies
are a few hundred bytes each, far below DMA efficiency.

This kernel removes the relayout entirely: for a uniform lattice the CU
windows of one LATTICE ROW are contiguous boxes of the %4-major
phase-split frame (soa.phase_split4), so the engine passes

    og   [w, n_r, h, C]   (phase-run window x row windows; pure XLA
                           slices + reshape of F4 — for the aligned
                           stride==w, sy==h groups a zero-copy view)
    reft [w, n_r, C]      top boundaries, edge rules pre-applied
    refl [n_r, h, C]      left boundaries, edge rules pre-applied

and the grid walks k-row bands: each step's block DMA moves a
[w, k, h, C] box (hundreds of KB — full DMA efficiency), every plane the
mode loop touches is a [k, C=128] tile (exactly one int32 vreg shape),
and the per-mode costs are emitted as [k, 2M*C] rows that reshape —
without any lane-crossing move — into the engine's lattice order.

Reference equivalent: the upsampleDistortion kernel family
(intra.cl:545-1171) plus the strided per-work-item boundary reads the
reference author flagged as the bottleneck (intra.cl:229-231).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vvc_mip_gpu_tpu.ops.pallas.distortion import (
    _fused_pred,
    _grouped_unrolled,
    _hadamard4,
    input_perms,
)


def _reduced_planes(rows, nb: int):
    """Downsample-average n same-shape planes to nb (reference boundary
    reduction, intra.cl:131-140).  ``rows``: list of [k, C] int32."""
    n = len(rows)
    ds = n // nb
    if ds == 1:
        return rows
    log2 = ds.bit_length() - 1
    off = 1 << (log2 - 1)
    return [(sum(rows[i * ds:(i + 1) * ds]) + off) >> log2
            for i in range(nb)]


def _build_limbs_planes(rows_t, rows_l, bs: int, dc_row0: bool):
    """Limb stack [K, k*C] bf16 from boundary row planes (the row-band
    twin of distortion._build_limbs; same folded algebra and row order
    as pred._augmented_matrix's columns)."""
    red_t = _reduced_planes(rows_t, bs)
    red_l = _reduced_planes(rows_l, bs)

    def wing(b_first, b_second):
        bnd = b_first + b_second
        first = bnd[0]
        row0 = (512 - first) if dc_row0 else jnp.zeros_like(first)
        off = [row0] + [b - first for b in bnd[1:]]
        return ([o >> 5 for o in off], [o & 31 for o in off],
                first >> 5, first & 31)

    hn, ln, fhn, fln = wing(red_t, red_l)
    ht, lt, fht, flt = wing(red_l, red_t)
    rows = hn + ln + ht + lt + [fhn, fln, fht, flt, jnp.ones_like(fhn)]
    rows += [jnp.zeros_like(fhn)] * ((-len(rows)) % 8)
    k, c = rows[0].shape
    stk = jnp.concatenate([p.reshape(1, k, c) for p in rows], 0)
    return stk.reshape(len(rows), k * c).astype(jnp.bfloat16)


def _kernel_rowband(*refs, h: int, w: int, r: int, two_m: int, emit: str,
                    unroll: int):
    """One k-row band of one SizeId2 class (fused pred chain).

    og_ref   [w, k, h, C]  w %4-grouped (phase-run order), h raster
    reft_ref [w, k, C]     w %4-grouped
    refl_ref [k, h, C]     h raster
    Outputs [k, C, 2M] int32 bands, mode-minor.
    """
    mat_ref, og_ref, reft_ref, refl_ref, *rest = refs
    if emit == "msh_t":
        (out_ref,) = rest[:1]
        rest = rest[1:]
    else:
        sad_out, satd_out = rest[:2]
        rest = rest[2:]
    sad_s, satd_s, *pred_stage = rest
    k = og_ref.shape[1]
    C = og_ref.shape[3]
    up_h, up_v = w // r, h // r

    # ---- in-kernel limb build (boundary reduce + offset/first split).
    # reft's w axis is %4-grouped: raster row x sits at position xinv[x].
    _, row_a, reft_perm, _ = input_perms(h, w, r)
    inv_t = np.argsort(np.asarray(reft_perm))
    rows_t = [reft_ref[pl.ds(int(inv_t[x]), 1)].reshape(k, C)
              .astype(jnp.int32) for x in range(w)]
    rows_l = [refl_ref[:, pl.ds(y, 1), :].reshape(k, C).astype(jnp.int32)
              for y in range(h)]
    x = _build_limbs_planes(rows_t, rows_l, 4, dc_row0=False)
    predv = _fused_pred(mat_ref, x)  # [2M*r*r, k*C] rows (m, s)

    if unroll >= two_m:
        def load_pred(m):
            return predv[m * r * r:(m + 1) * r * r].reshape(r, r, k, C)
    else:
        (pred_s,) = pred_stage
        pred_s[...] = predv

        def load_pred(m):
            return pred_s[pl.ds(m * r * r, r * r)].reshape(r, r, k, C)

    # ---- boundaries as interpolation bases
    if up_h > 1:
        lead = jnp.concatenate(
            [refl_ref[:, pl.ds(int((row_a[j] + 1) * up_v - 1), 1), :]
             for j in range(r)], 1).astype(jnp.int32)
        lead = jnp.transpose(lead, (1, 0, 2)).reshape(r, 1, k, C)
    if up_v > 1:
        top = reft_ref[...].astype(jnp.int32).reshape(1, w, k, C)

    # ---- original samples, regrouped to [4(y%4), h//4, w, k, C].
    # Leading-dim permutes only: the trailing (k, C) vreg tile never
    # moves, so these are register renames, not shuffles.
    og = og_ref[...].astype(jnp.int32)           # [w, k, h, C]
    og = jnp.transpose(og, (2, 0, 1, 3))         # [h, w, k, C]
    og4 = jnp.transpose(og.reshape(h // 4, 4, w, k, C),
                        (1, 0, 2, 3, 4))         # [4, h//4, w, k, C]

    def _phases(base, anchors, up: int):
        log2 = up.bit_length() - 1
        delta = anchors - base
        t = (base << log2) + (1 << (log2 - 1))
        out = []
        for _ in range(up - 1):
            t = t + delta
            out.append(t >> log2)
        return out

    def horizontal(p3):
        """[r, r, k, C] anchors -> [r, w, k, C], columns x%4-grouped."""
        if up_h == 1:
            return p3
        if up_h == 2:
            half = r // 2
            ev, od = p3[:, :half], p3[:, half:]
            base_e = jnp.concatenate([lead, od[:, :-1]], axis=1)
            return jnp.concatenate(
                [(base_e + ev + 1) >> 1, ev, (ev + od + 1) >> 1, od],
                axis=1)
        base = jnp.concatenate([lead, p3[:, :-1]], axis=1)
        ph = _phases(base, p3, up_h)
        if up_h == 4:
            return jnp.concatenate([ph[0], ph[1], ph[2], p3], axis=1)
        ph.append(p3)  # up_h == 8
        groups = [jnp.stack([ph[j], ph[j + 4]], axis=2)
                  .reshape(r, 2 * r, k, C) for j in range(4)]
        return jnp.concatenate(groups, axis=1)

    def vertical(anch):
        """[r, W, k, C] anchor rows -> 4 y%4 planes [h//4, W, k, C]."""
        wk = anch.shape[1]
        if up_v == 1:
            return list(anch.reshape(4, h // 4, wk, k, C))
        if up_v == 2:
            half = r // 2
            ev, od = anch[:half], anch[half:]
            base_e = jnp.concatenate([top, od[:-1]], axis=0)
            return [(base_e + ev + 1) >> 1, ev, (ev + od + 1) >> 1, od]
        base = jnp.concatenate([top, anch[:-1]], axis=0)
        ph = _phases(base, anch, up_v)
        if up_v == 4:
            return [ph[0], ph[1], ph[2], anch]
        ph.append(anch)  # up_v == 8
        return [jnp.stack([ph[i], ph[i + 4]], axis=1)
                .reshape(h // 4, wk, k, C) for i in range(4)]

    def mode_body(m, _):
        d = vertical(horizontal(load_pred(m)))
        sad = None
        for i in range(4):
            d[i] = og4[i] - d[i]
            s = jnp.abs(d[i]).sum((0, 1), dtype=jnp.int32)
            sad = s if sad is None else sad + s
        sad_s[pl.ds(m, 1)] = sad.reshape(1, k, C)
        v = _hadamard4(d)
        acc = None
        dc = None
        for ky, t in enumerate(v):
            t4 = t.reshape(h // 4, 4, w // 4, k, C)
            for kx, out in enumerate(_hadamard4(
                    [t4[:, j] for j in range(4)])):
                a = jnp.abs(out)
                acc = a if acc is None else acc + a
                if ky == 0 and kx == 0:
                    dc = a
        bsatd = (acc - dc + (dc >> 2) + 1) >> 1
        satd_s[pl.ds(m, 1)] = (
            bsatd.sum((0, 1), dtype=jnp.int32).reshape(1, k, C))
        return 0

    if unroll >= two_m:
        for m in range(two_m):
            mode_body(m, 0)
    elif unroll == 1:
        jax.lax.fori_loop(0, two_m, mode_body, 0)
    else:
        assert two_m % unroll == 0, (two_m, unroll)

        def chunk_body(i, _):
            for j in range(unroll):
                mode_body(i * unroll + j, 0)
            return 0

        jax.lax.fori_loop(0, two_m // unroll, chunk_body, 0)

    # ---- epilogue: [2M, k, C] scratch -> [k, C, 2M] output (per-sublane
    # 2D transposes — the same lane<->sublane move _emit_costs makes for
    # msh_t — stacked along the band axis; Mosaic rejects the
    # sublane-into-lane shape cast a flat [k, 2M*C] row form would need).
    def _bands(vals):
        return jnp.stack(
            [jnp.transpose(vals[:, kk, :], (1, 0)) for kk in range(k)], 0)

    if emit == "msh_t":
        out_ref[...] = _bands(jnp.minimum(2 * sad_s[...], satd_s[...]))
    else:
        sad_out[...] = _bands(sad_s[...])
        satd_out[...] = _bands(satd_s[...])


def _kernel_rowband_mm(*refs, h: int, w: int, r: int, two_m: int,
                       bs: int, emit: str, dc_row0: bool):
    """Mode-minor (SizeId0/1) row-band kernel: the mode axis rides the
    SUBLANES, so each k-band row is processed as full-width [2M, C]
    planes (the _kernel_mode_minor body on row-band inputs).  Same box
    layouts as _kernel_rowband; a static python loop walks the k rows.
    """
    mat_ref, og_ref, reft_ref, refl_ref, *outs = refs
    k, C = og_ref.shape[1], og_ref.shape[3]
    up_h, up_v = w // r, h // r
    from vvc_mip_gpu_tpu.ops.pallas.distortion import _satd4x4_planes

    # Box w axis is %4-grouped: raster x sits at position xinv[x].
    xinv = np.argsort(np.asarray(_mod4_major_w(w)))

    for kk in range(k):
        def t_row(x):
            return reft_ref[pl.ds(int(xinv[x]), 1),
                            pl.ds(kk, 1), :].reshape(1, C).astype(
                                jnp.int32)

        def l_row(y):
            return refl_ref[pl.ds(kk, 1),
                            pl.ds(y, 1), :].reshape(1, C).astype(
                                jnp.int32)

        x = _build_limbs_planes([t_row(i) for i in range(w)],
                                [l_row(i) for i in range(h)],
                                bs, dc_row0=dc_row0)
        predv = _fused_pred(mat_ref, x)  # [s*2M, C] rows (s, m)

        def pred_plane(i):
            return predv[i * two_m:(i + 1) * two_m]

        def og_plane(y, x_):
            return og_ref[pl.ds(int(xinv[x_]), 1), pl.ds(kk, 1),
                          pl.ds(y, 1), :].reshape(1, C).astype(jnp.int32)

        def interp(base, after, o, up):
            if o == up:
                return after
            log2 = up.bit_length() - 1
            return ((base << log2) + o * (after - base)
                    + (1 << (log2 - 1))) >> log2

        anchors = [[pred_plane(ky * r + j) for j in range(r)]
                   for ky in range(r)]
        if up_h > 1:
            lead = [l_row((ky + 1) * up_v - 1) for ky in range(r)]
        memo = {}

        def hor(ky, x_):
            if up_h == 1:
                return anchors[ky][x_]
            if (ky, x_) not in memo:
                j, o = x_ // up_h, x_ % up_h + 1
                base = anchors[ky][j - 1] if j else lead[ky]
                memo[(ky, x_)] = interp(base, anchors[ky][j], o, up_h)
            return memo[(ky, x_)]

        if up_v == 1:
            plane = hor
        else:
            top = [t_row(x_) for x_ in range(w)]

            def plane(y, x_):
                ky, o = y // up_v, y % up_v + 1
                base = hor(ky - 1, x_) if ky else top[x_]
                return interp(base, hor(ky, x_), o, up_v)

        sad = None
        satd = None
        for by in range(h // 4):
            for bx in range(w // 4):
                d = [[og_plane(4 * by + dy, 4 * bx + dx)
                      - plane(4 * by + dy, 4 * bx + dx)
                      for dx in range(4)] for dy in range(4)]
                sad_b = None
                for row in d:
                    for v in row:
                        a = jnp.abs(v)
                        sad_b = a if sad_b is None else sad_b + a
                satd_b = _satd4x4_planes(d)
                sad = sad_b if sad is None else sad + sad_b
                satd = satd_b if satd is None else satd + satd_b

        if emit == "msh_t":
            msh = jnp.minimum(2 * sad, satd)
            outs[0][pl.ds(kk, 1)] = jnp.transpose(
                msh, (1, 0)).reshape(1, C, two_m)
        else:
            outs[0][pl.ds(kk, 1)] = jnp.transpose(
                sad, (1, 0)).reshape(1, C, two_m)
            outs[1][pl.ds(kk, 1)] = jnp.transpose(
                satd, (1, 0)).reshape(1, C, two_m)


def _mod4_major_w(n: int):
    from vvc_mip_gpu_tpu.ops.pallas.distortion import _mod4_major

    return _mod4_major(n)


def _band_grid(k: int, cl: int, n_pad: int, C: int):
    """Grid + index maps shared by both rowband wrappers: bands on the
    row axis x 128-lane tiles on the column axis (cl < C only when the
    [w, k, h, C] og box would crowd Mosaic's scoped VMEM — wide 4K
    partitions; see cost_engine._rb_tiling).  Mosaic's block-mapping
    rules are asserted HERE because interpret mode does not check them
    (the r5 band-shrink regression: k=4 passed every CPU test and
    failed hardware lowering)."""
    assert C % 128 == 0, C
    assert cl % 128 == 0 and C % cl == 0, (cl, C)
    assert k % 8 == 0 or k == n_pad, (k, n_pad)
    assert n_pad % k == 0, (n_pad, k)
    return (n_pad // k, C // cl)


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "r", "two_m", "bs", "emit", "k", "cl", "interpret",
    "dc_row0"))
def rowband_distortion_mm(og, reft, refl, mat, *, h, w, r, two_m, bs,
                          emit="msh_t", k=8, cl=None, interpret=False,
                          dc_row0=True):
    """Mode-minor row-band wrapper (SizeId0/1 classes): same box
    contract as rowband_distortion; ``mat`` is the mode-minor augmented
    matrix (rows (s, m)); ``bs`` the boundary size (2 for SizeId0,
    4 for SizeId1); ``dc_row0`` the 512-first DC offset rule."""
    n_r, C = og.shape[1], og.shape[3]
    cl = C if cl is None else cl
    pad = (-n_r) % k
    if pad:
        og = jnp.pad(og, [(0, 0), (0, pad), (0, 0), (0, 0)])
        reft = jnp.pad(reft, [(0, 0), (0, pad), (0, 0)])
        refl = jnp.pad(refl, [(0, pad), (0, 0), (0, 0)])
    n_pad = n_r + pad
    grid = _band_grid(k, cl, n_pad, C)
    rows_m, k_dim = mat.shape
    in_specs = [
        pl.BlockSpec((rows_m, k_dim), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w, k, h, cl), lambda i, j: (0, i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w, k, cl), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, h, cl), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    n_outs = 1 if emit == "msh_t" else 2
    out_specs = [pl.BlockSpec((k, cl, two_m), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)] * n_outs
    out_shape = [jax.ShapeDtypeStruct((n_pad, C, two_m),
                                      jnp.int32)] * n_outs
    outs = pl.pallas_call(
        functools.partial(_kernel_rowband_mm, h=h, w=w, r=r,
                          two_m=two_m, bs=bs, emit=emit,
                          dc_row0=dc_row0),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * two_m * n_pad * C * h * w * 4,
            bytes_accessed=(og.size + reft.size + refl.size) * 2
                           + mat.size * 2 + n_pad * two_m * C * 4 * n_outs,
            transcendentals=0,
        ),
    )(mat, og, reft, refl)
    if emit == "msh_t":
        return outs[0][:n_r]
    return outs[0][:n_r], outs[1][:n_r]


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "r", "two_m", "emit", "k", "cl", "unroll", "interpret"))
def rowband_distortion(og, reft, refl, mat, *, h, w, r, two_m,
                       emit="msh_t", k=8, cl=None, unroll=0,
                       interpret=False):
    """Fused pred+upsample+SAD/SATD over phase-space row bands.

    og   [w, n_r, h, C] int16   reft [w, n_r, C] int16
    refl [n_r, h, C] int16      mat  [2M*r*r, K] bf16 augmented matrix
    (boundary edge rules must already be applied to reft/refl; C is the
    lane-padded lattice column count; ``cl`` the lane-tile width the
    grid walks C in — defaults to C, i.e. one tile).

    Returns [n_r, C, 2M] int32 minSadHad (emit="msh_t") or a
    (sad, satd) pair of the same shape — lattice order, mode-minor;
    callers slice C back to the true column count.
    """
    n_r, C = og.shape[1], og.shape[3]
    cl = C if cl is None else cl
    pad = (-n_r) % k
    if pad:
        # Pad the row-band axis to the band size; the padded bands
        # compute on zeros and are sliced off below.
        og = jnp.pad(og, [(0, 0), (0, pad), (0, 0), (0, 0)])
        reft = jnp.pad(reft, [(0, 0), (0, pad), (0, 0)])
        refl = jnp.pad(refl, [(0, pad), (0, 0), (0, 0)])
    n_pad = n_r + pad
    grid = _band_grid(k, cl, n_pad, C)

    eff_unroll = unroll or (
        two_m if _grouped_unrolled(h, w, two_m, True, k * cl) else 1)
    rows_m, k_dim = mat.shape
    in_specs = [
        pl.BlockSpec((rows_m, k_dim), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w, k, h, cl), lambda i, j: (0, i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w, k, cl), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, h, cl), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    n_outs = 1 if emit == "msh_t" else 2
    out_specs = [pl.BlockSpec((k, cl, two_m), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)] * n_outs
    out_shape = [jax.ShapeDtypeStruct((n_pad, C, two_m),
                                      jnp.int32)] * n_outs
    scratch = [pltpu.VMEM((two_m, k, cl), jnp.int32)] * 2
    if eff_unroll < two_m:
        scratch.append(pltpu.VMEM((two_m * r * r, k * cl), jnp.int32))
    outs = pl.pallas_call(
        functools.partial(_kernel_rowband, h=h, w=w, r=r, two_m=two_m,
                          emit=emit, unroll=eff_unroll),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=tuple(scratch),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * two_m * n_pad * C * h * w * 4,
            bytes_accessed=(og.size + reft.size + refl.size) * 2
                           + mat.size * 2 + n_pad * two_m * C * 4 * n_outs,
            transcendentals=0,
        ),
    )(mat, og, reft, refl)

    def _shaped(o):
        return o[:n_r]

    if emit == "msh_t":
        return _shaped(outs[0])
    return _shaped(outs[0]), _shaped(outs[1])
