"""Fused Pallas kernel: upsample + SAD + SATD for one shape class.

This is the engine's hottest path (reference equivalent: the
upsampleDistortion kernel family, intra.cl:545-1171).  The XLA-only SoA
path materializes the upsampled prediction, the diff, and the Hadamard
blocks in HBM for every mode; this kernel keeps the whole per-mode pipeline
in VMEM:

  grid: CU tiles (the lane axis).  Per tile, the reduced predictions of all
  modes, the CU's boundary anchor samples, and the original samples are
  DMA'd to VMEM once; a fori_loop over the 2M modes then upsamples (exact
  VVC integer interpolation, delta form), computes SAD, and computes the
  VTM mean-scaled 4x4-Hadamard SATD with an 8-op-per-axis butterfly —
  writing only the [2M, tile] cost rows back to HBM.

HBM traffic per class: pred + orig + boundaries in, 2x[2M, nCU] int32 out —
no intermediate tensors.  All arithmetic int16 (upsample products bounded by
8*1023 + rounding < 2^15; Hadamard coefficients bounded by 16*1023 < 2^15)
with int32 reductions, bit-identical to the golden model.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_down_pow2(x: int) -> int:
    return 1 << (x.bit_length() - 1)


def class_tile_unroll(h: int, w: int) -> tuple[int | None, int]:
    """Per-class (cu_tile, unroll) override from the VVC_CU_TILES env
    lever ("WxH:TILEuU,..." e.g. "16x8:1024u2,4x4:2048u0"; tile/unroll
    of 0 mean 'default').  A hardware-tuning A/B hook (tools/
    tune_kernels.py sweeps variants; measured winners get baked into
    default_cu_tile / fused_cu_tile), not a user-facing knob."""
    import os

    for tok in os.environ.get("VVC_CU_TILES", "").split(","):
        tok = tok.strip()
        if not tok:
            continue
        key, _, val = tok.partition(":")
        kw, _, kh = key.partition("x")
        if int(kw) == w and int(kh) == h:
            t, _, u = val.partition("u")
            return (int(t) or None), int(u or 0)
    return None, 0


def default_cu_tile(h: int, w: int) -> int:
    """Pick the CU-tile width so the per-tile working set fits VMEM."""
    budget = 1 << 20  # ~1 MB for the largest [h, w, tile] int16 temp
    tile = budget // (h * w * 2)
    tile = max(128, min(1024, _round_down_pow2(max(tile, 1)) * 128 // 128))
    # keep it a multiple of 128 lanes
    return max(128, (tile // 128) * 128)


def fused_cu_tile(h: int, w: int, two_m: int) -> int:
    """CU tile for the FUSED grouped (SizeId2) kernel: the largest
    power-of-two tile that keeps the unrolled mode loop inside the
    _grouped_unrolled VMEM byte bound — measured faster than a bigger
    tile with the fori_loop (e.g. 16x16: 0.26 ms @512 unrolled vs
    0.43 @1024 looped).  64x64 can't unroll even at 128 and keeps the
    loop."""
    bound = (8 << 20) // (h * w * 4 * two_m)
    return max(128, min(default_cu_tile(h, w),
                        _round_down_pow2(max(bound, 1)) // 128 * 128))


def _hadamard4(parts):
    """4-point Hadamard butterfly (rows [1111, 11-1-1, 1-1-11, 1-11-1])."""
    x0, x1, x2, x3 = parts
    s0, s1 = x0 + x1, x2 + x3
    d0, d1 = x0 - x1, x2 - x3
    return s0 + s1, s0 - s1, d0 - d1, d0 + d1


def _mod4_major(n: int) -> np.ndarray:
    """Canonical %4-grouped order: position (i, b) holds old index 4b+i."""
    if n <= 4:
        return np.arange(n)
    return np.concatenate([np.arange(i, n, 4) for i in range(4)])


def _anchor_perm(r: int, up: int) -> np.ndarray:
    """Anchor-axis permutation so the interpolation below emits outputs
    directly in %4-grouped order: %4-major when the axis is not upsampled,
    parity-major for 2x upsampling, untouched otherwise."""
    if up == 1:
        return _mod4_major(r)
    if up == 2:
        return np.concatenate([np.arange(0, r, 2), np.arange(1, r, 2)])
    return np.arange(r)


def input_perms(h: int, w: int, r: int):
    """(pred_sample_perm, refl_perm, reft_perm, orig_perm) — static
    permutations the wrapper applies so the kernel sees %4-group-friendly
    layouts (fused into the producing copies by XLA, effectively free)."""
    up_h, up_v = w // r, h // r
    row_a = _anchor_perm(r, up_v)
    col_a = _anchor_perm(r, up_h)
    pred_perm = (row_a[:, None] * r + col_a[None, :]).ravel()
    row4 = _mod4_major(h)
    col4 = _mod4_major(w)
    orig_perm = (row4[:, None] * w + col4[None, :]).ravel()
    return pred_perm, row_a, col4, orig_perm


def _fused_pred(mat_ref, x):
    """In-kernel all-mode reduced prediction: one bf16 MXU dot against the
    augmented matrix (see ops/pallas/pred.py for the folded algebra and
    the bit-exactness argument), epilogue in registers — the prediction
    tensor never exists in HBM.  Returns [rows, tile] int32 in the
    matrix's row order ((m, s) grouped / (s, m) mode-minor)."""
    acc = jnp.dot(mat_ref[...], x, preferred_element_type=jnp.float32)
    return jnp.clip(acc.astype(jnp.int32) >> 6, 0, 1023)


def _reduced_rows(ref, n: int, nb: int, order=None):
    """Downsample-average ``ref``'s n rows to nb [1, c] int32 planes
    (reference boundary reduction, intra.cl:131-140).  ``order[i]``:
    static position of raster row i when ``ref`` arrives permuted."""
    rows = [ref[pl.ds(int(order[i]) if order is not None else i, 1)]
            .astype(jnp.int32) for i in range(n)]
    ds = n // nb
    if ds == 1:
        return rows
    log2 = ds.bit_length() - 1
    off = 1 << (log2 - 1)
    return [(sum(rows[i * ds:(i + 1) * ds]) + off) >> log2
            for i in range(nb)]


def _build_limbs(reft_ref, refl_ref, w: int, h: int, bs: int,
                 dc_row0: bool = True, t_order=None):
    """In-kernel limb stack [K, c] bf16 for the augmented matrix — the
    boundary reduce + offset/first limb split built from the raster
    boundaries (row order must match pred._augmented_matrix's columns;
    see pred._augmented_inputs for the XLA twin).  All ops are on [1, c]
    planes: a handful of adds/shifts, far cheaper in-kernel than an XLA
    assembly pass through HBM.  ``dc_row0``: SizeId0/1's 512-first first
    offset (SizeId2 uses 0, intra.cl:443-446).  ``t_order``: static
    position-of-raw-row-i map when reft_ref arrives %4-permuted."""
    red_t = _reduced_rows(reft_ref, w, bs, t_order)
    red_l = _reduced_rows(refl_ref, h, bs)

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
    return jnp.concatenate(rows, 0).astype(jnp.bfloat16)


def _grouped_unrolled(h: int, w: int, two_m: int, fused: bool,
                      tile: int) -> bool:
    """Whether the grouped (SizeId2) kernel unrolls its mode loop.
    Unrolling enlarges Mosaic basic blocks and (fused) lets per-mode
    predictions be static slices, but Mosaic's stack allocator keeps the
    unrolled iterations' plane sets live together — bound the estimated
    footprint (mode bodies x the [h, w, tile] int32 working set) well
    under the 16 MB scoped-VMEM limit."""
    if fused:
        return h * w * tile * 4 * two_m <= (8 << 20)
    return two_m <= 4 or h * w <= 64


def _emit_costs(refs, sad, satd, emit: str):
    """Write [2M, tile] sad/satd values to the output refs per ``emit``:
    plain rows, mode-minor transposed rows ("sad_satd_t"), or a single
    mode-minor min(2*SAD, SATD) ("msh_t").

    Outputs stay in LATTICE order; the engine's XLA reorder pass maps
    them to the reference CTU layout (intra.cl:1144-1148).  A CTU-direct
    output BlockSpec (scatter one lattice row x T CTUs per grid step)
    was built and retired: Mosaic requires output blocks of >=8 sublanes
    and 128-lane multiples, and a (T, 1, cu_cols*2M) cost tile satisfies
    neither for any real CU geometry, while the measured cost of the
    reorder it would save is ~0 (hidden behind the kernels)."""
    if emit == "msh_t":
        (msh_ref,) = refs
        msh_ref[...] = jnp.transpose(jnp.minimum(2 * sad, satd), (1, 0))
    elif emit == "sad_satd_t":
        sad_ref, satd_ref = refs
        sad_ref[...] = jnp.transpose(sad, (1, 0))
        satd_ref[...] = jnp.transpose(satd, (1, 0))
    else:
        sad_ref, satd_ref = refs
        sad_ref[...] = sad
        satd_ref[...] = satd


def _kernel_sid0(*refs, two_m: int, emit: str, fused: bool,
                 has_limbs: bool = False):
    """SizeId0 (4x4, no upsampling): the mode axis rides the SUBLANES.

    pred arrives transposed to [16, 2M, tile] (or is computed in-kernel —
    including the boundary reduce and limb split — when ``fused``); all
    2M modes process in one shot with every op on full-width (2M, lane)
    tiles — no mode loop, no skinny 4-sublane planes (measured ~3x
    faster than the looped form for this class).

    ``has_limbs``: the limb stack arrives precomputed (one wide XLA pass
    over the whole lattice) instead of being built in-kernel from the
    raw boundaries — the per-grid-step build is ~40 single-sublane plane
    ops, a candidate for this class's measured gap to its roofline floor
    (VVC_SID0_LIMBS lever).

    Sample order: any fixed order works as long as pred's rows match
    orig's (SAD is order-invariant and the two-sided 4x4 Hadamard SATD is
    transpose-invariant), so the engine's x-major fetch_rows layout needs
    no kernel change — only the matching pred sample_perm."""
    if fused and has_limbs:
        mat_ref, orig_ref, limbs_ref, *rest = refs
        c = orig_ref.shape[-1]
        pred3 = _fused_pred(mat_ref, limbs_ref[...]).reshape(16, two_m, c)
    elif fused:
        mat_ref, orig_ref, reft_ref, refl_ref, *rest = refs
        c = orig_ref.shape[-1]
        x = _build_limbs(reft_ref, refl_ref, 4, 4, 2)
        pred3 = _fused_pred(mat_ref, x).reshape(16, two_m, c)
    else:
        pred_ref, orig_ref, *rest = refs
        c = pred_ref.shape[-1]
        pred3 = pred_ref[...].astype(jnp.int32)
    og = orig_ref[...].astype(jnp.int32).reshape(16, 1, c)
    d = og - pred3  # [16, 2M, c]
    sad = jnp.abs(d).sum(0, dtype=jnp.int32)  # [2M, c]
    d4 = d.reshape(4, 4, two_m, c)
    acc = None
    dc = None
    for ky, t in enumerate(_hadamard4([d4[i] for i in range(4)])):
        for kx, out in enumerate(_hadamard4([t[j] for j in range(4)])):
            a = jnp.abs(out)  # [2M, c]
            acc = a if acc is None else acc + a
            if ky == 0 and kx == 0:
                dc = a
    satd = (acc - dc + (dc >> 2) + 1) >> 1
    _emit_costs(rest, sad, satd, emit)


def _satd4x4_planes(d):
    """VTM mean-scaled SATD of one 4x4 block given as 16 [2M, c] planes
    d[dy][dx] (kernel_aux_functions.cl:142-249, same butterfly algebra as
    the grouped-layout kernels)."""
    t = [_hadamard4([d[0][j], d[1][j], d[2][j], d[3][j]]) for j in range(4)]
    acc = None
    dc = None
    for ky in range(4):
        for kx, out in enumerate(_hadamard4([t[j][ky] for j in range(4)])):
            a = jnp.abs(out)
            acc = a if acc is None else acc + a
            if ky == 0 and kx == 0:
                dc = a
    return (acc - dc + (dc >> 2) + 1) >> 1


def _kernel_mode_minor(*refs, has_limbs: bool = False, h: int, w: int,
                       r: int, two_m: int,
                       emit: str, fused: bool,
                       sample_order: str = "raster"):
    """SizeId0/1 classes (r == 4): the mode axis rides the SUBLANES.

    pred arrives mode-minor [S, 2M, tile] in RASTER sample order; every
    reduced-prediction sample is a full-width [2M, tile] plane, so the
    upsample interpolations, the SAD, and the SATD butterflies all run at
    full sublane occupancy — the generalization of the SizeId0 kernel.
    The grouped-layout kernel below runs these classes on r=4-sublane
    slices (half the VPU idle); no %4 sample permutations are needed
    here at all because planes are addressed statically.
    """
    up_h, up_v = w // r, h // r
    # Static sample-position maps ("xmajor4": orig rows x-%4-grouped
    # major + y raster minor, ref_t rows %4-grouped — the layouts the
    # phase4/fetch_rows gather pipeline emits for free).
    if sample_order == "xmajor4":
        xpos = _mod4_major(w)  # stored row of raster x = position in %4
        xinv = np.argsort(xpos)

        def opos(y, x):
            return int(xinv[x]) * h + y

        tpos = [int(xinv[x]) for x in range(w)]
        t_order = tuple(int(v) for v in xinv)
    else:
        def opos(y, x):
            return y * w + x

        tpos = list(range(w))
        t_order = None
    if fused:
        # refl_ref holds the FULL [h, tile] raster left boundary here
        # (the boundary reduce + limb split run in-kernel — or arrive
        # precomputed via ``has_limbs``; the raw boundaries are still
        # needed as the upsample interpolation bases).
        if has_limbs:
            mat_ref, orig_ref, reft_ref, refl_ref, limbs_ref, *rest = refs
            x = limbs_ref[...]
        else:
            mat_ref, orig_ref, reft_ref, refl_ref, *rest = refs
            x = _build_limbs(reft_ref, refl_ref, w, h, 4, t_order=t_order)
        c = orig_ref.shape[-1]
        predv = _fused_pred(mat_ref, x)  # rows (s, m)

        def pred_plane(i):
            return predv[i * two_m:(i + 1) * two_m]

        def lead_row(k):  # left-boundary sample at anchor row k
            return refl_ref[pl.ds((k + 1) * up_v - 1, 1)].astype(
                jnp.int32)
    else:
        pred_ref, orig_ref, reft_ref, refl_ref, *rest = refs
        c = pred_ref.shape[-1]

        def pred_plane(i):
            return pred_ref[pl.ds(i, 1)].reshape(two_m, c).astype(
                jnp.int32)

        def lead_row(k):  # refl_ref holds the [r, tile] anchors here
            return refl_ref[pl.ds(k, 1)].astype(jnp.int32)

    def orig_plane(i):
        return orig_ref[pl.ds(i, 1)].astype(jnp.int32)  # [1, c]

    def interp(base, after, o, up):
        """Phase o in 1..up between anchor planes (VVC linear rule,
        intra.cl:815-895): ((up-o)*base + o*after + up/2) >> log2."""
        if o == up:
            return after
        log2 = up.bit_length() - 1
        return ((base << log2) + o * (after - base)
                + (1 << (log2 - 1))) >> log2

    anchors = [[pred_plane(k * r + j) for j in range(r)] for k in range(r)]
    if up_h > 1:
        # horizontal pass: anchor row k's phase-0 base is the left
        # boundary sample at that row
        lead = [lead_row(k) for k in range(r)]
    memo = {}

    def hor(k, x):
        """Horizontally upsampled anchor-row plane (lazy + memoized so
        liveness tracks block consumption order, not w x r eagerness)."""
        if up_h == 1:
            return anchors[k][x]
        if (k, x) not in memo:
            j, o = x // up_h, x % up_h + 1
            base = anchors[k][j - 1] if j else lead[k]
            memo[(k, x)] = interp(base, anchors[k][j], o, up_h)
        return memo[(k, x)]

    if up_v == 1:
        plane = hor
    else:
        # vertical pass: column x's base is the top boundary sample
        top = [reft_ref[pl.ds(tpos[x], 1)].astype(jnp.int32)
               for x in range(w)]

        def plane(y, x):
            k, o = y // up_v, y % up_v + 1
            base = hor(k - 1, x) if k else top[x]
            return interp(base, hor(k, x), o, up_v)

    sad = None
    satd = None
    for by in range(h // 4):
        for bx in range(w // 4):
            d = [[orig_plane(opos(4 * by + dy, 4 * bx + dx))
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

    _emit_costs(rest, sad, satd, emit)


def _kernel(*refs, h: int, w: int, r: int, two_m: int, emit: str,
            fused: bool, unroll: int = 0):
    if fused:
        # refl_ref holds the FULL [h, tile] RASTER left boundary; reft_ref
        # arrives %4-permuted (its interpolation consumer wants that) and
        # is statically un-permuted for the in-kernel boundary reduce.
        mat_ref, orig_ref, reft_ref, refl_ref, *rest = refs
        _, _, reft_perm, _ = input_perms(h, w, r)
        inv_t = tuple(int(v) for v in np.argsort(reft_perm))
        x = _build_limbs(reft_ref, refl_ref, w, h, 4, dc_row0=False,
                         t_order=inv_t)
        predv = _fused_pred(mat_ref, x)  # rows (m, s)
        if unroll >= two_m or (
                not unroll
                and _grouped_unrolled(h, w, two_m, fused,
                                      orig_ref.shape[-1])):
            unroll = two_m
            # Unrolled mode loop: per-mode predictions are static row
            # slices of the dot result — no staging needed.
            def load_pred(m):
                return predv[m * r * r:(m + 1) * r * r].reshape(
                    r, r, predv.shape[-1])
        else:
            # fori_loop needs dynamic row slices, which Mosaic only
            # supports on REFS — stage through the trailing VMEM scratch.
            *rest, pred_s = rest
            pred_s[...] = predv

            def load_pred(m):
                return pred_s[pl.ds(m * r * r, r * r)].reshape(
                    r, r, pred_s.shape[-1])
    else:
        pred_ref, orig_ref, reft_ref, refl_ref, *rest = refs

        def load_pred(m):
            return pred_ref[pl.ds(m, 1)].astype(jnp.int32).reshape(
                r, r, pred_ref.shape[-1])
    if not unroll:
        unroll = (two_m if _grouped_unrolled(h, w, two_m, fused,
                                             orig_ref.shape[-1])
                  else 1)
    if emit == "sad_satd":
        sad_ref, satd_ref = rest
    else:
        # The mode loop accumulates sad/satd rows in VMEM scratch; the
        # epilogue below emits the transposed (mode-minor) outputs, so
        # the engine's lattice->CTU reorder never moves the mode axis to
        # minor (the expensive half of the old epilogue).
        *out_refs, sad_ref, satd_ref = rest
    # One CU tile per grid step; a fori_loop over the 2M modes amortizes
    # the per-step overhead (a mode-per-grid-step variant measured ~2x
    # slower on small classes).  int16 is storage-only: the v5e VPU has no
    # i16 arithmetic, so compute runs in int32 after the VMEM loads.
    #
    # %4-grouped layout: inputs arrive permuted (input_perms) and the
    # upsampler emits output ROWS grouped by y%4 and COLUMNS by x%4, so the
    # SATD butterflies consume contiguous full-sublane-width planes instead
    # of strided in-block slices (measured ~1.7x faster SATD).  The
    # interpolation exploits that phase o == up reproduces the anchor
    # exactly and that 2x interpolation is a rounded average.
    up_h = w // r
    up_v = h // r
    c = orig_ref.shape[-1]
    # orig rows arrive y%4-grouped, columns x%4-grouped
    og4 = orig_ref[...].astype(jnp.int32).reshape(4, h // 4, w, c)
    up_v_ = h // r
    if up_h > 1:
        if fused:
            # anchor k's left sample from the full raster boundary, in
            # the kernel's (row_a-permuted) anchor order
            row_a = input_perms(h, w, r)[1]
            lead = jnp.concatenate(
                [refl_ref[pl.ds(int((row_a[k] + 1) * up_v_ - 1), 1)]
                 for k in range(r)], 0).astype(jnp.int32).reshape(r, 1, c)
        else:
            lead = refl_ref[...].astype(jnp.int32).reshape(r, 1, c)
    if up_v > 1:
        top = reft_ref[...].astype(jnp.int32).reshape(1, w, c)

    def _phases(base, anchors, up: int):
        """Interpolation phases o = 1..up-1 (o == up is the anchor)."""
        log2 = up.bit_length() - 1
        delta = anchors - base
        t = (base << log2) + (1 << (log2 - 1))
        out = []
        for _ in range(up - 1):
            t = t + delta
            out.append(t >> log2)
        return out

    def horizontal(p3):
        """[r, r, c] anchors -> [r, w, c] with columns x%4-grouped."""
        if up_h == 1:
            return p3  # columns pre-permuted %4-major
        if up_h == 2:
            half = r // 2  # columns pre-permuted parity-major [E | O]
            ev, od = p3[:, :half], p3[:, half:]
            base_e = jnp.concatenate([lead, od[:, :-1]], axis=1)
            return jnp.concatenate(
                [(base_e + ev + 1) >> 1, ev, (ev + od + 1) >> 1, od], axis=1)
        base = jnp.concatenate([lead, p3[:, :-1]], axis=1)
        ph = _phases(base, p3, up_h)
        if up_h == 4:
            return jnp.concatenate([ph[0], ph[1], ph[2], p3], axis=1)
        ph.append(p3)  # up_h == 8: x%4 = (o-1)%4, x//4 = 2a + (o-1)//4
        groups = [jnp.stack([ph[j], ph[j + 4]], axis=2).reshape(r, 2 * r, c)
                  for j in range(4)]
        return jnp.concatenate(groups, axis=1)

    def vertical(anch):
        """[r, W, c] anchor rows -> 4 y%4-group planes [h//4, W, c]."""
        wk = anch.shape[1]
        if up_v == 1:
            return list(anch.reshape(4, h // 4, wk, c))
        if up_v == 2:
            half = r // 2  # rows pre-permuted parity-major [E | O]
            ev, od = anch[:half], anch[half:]
            base_e = jnp.concatenate([top, od[:-1]], axis=0)
            return [(base_e + ev + 1) >> 1, ev, (ev + od + 1) >> 1, od]
        base = jnp.concatenate([top, anch[:-1]], axis=0)
        ph = _phases(base, anch, up_v)
        if up_v == 4:
            return [ph[0], ph[1], ph[2], anch]
        ph.append(anch)  # up_v == 8
        return [jnp.stack([ph[i], ph[i + 4]], axis=1).reshape(h // 4, wk, c)
                for i in range(4)]

    def mode_body(m, _):
        d = vertical(horizontal(load_pred(m)))
        sad = None
        for i in range(4):
            d[i] = og4[i] - d[i]
            s = jnp.abs(d[i]).sum((0, 1), dtype=jnp.int32)
            sad = s if sad is None else sad + s
        sad_ref[pl.ds(m, 1), :] = sad.reshape(1, c)
        # ---- SATD: the four y%4-group planes ARE the row-stage butterfly
        # inputs; the column stage slices x%4 groups from an outer dim.
        v = _hadamard4(d)
        acc = None
        dc = None
        for ky, t in enumerate(v):
            t4 = t.reshape(h // 4, 4, w // 4, c)
            for kx, out in enumerate(_hadamard4(
                    [t4[:, j] for j in range(4)])):
                a = jnp.abs(out)  # [h/4, w/4, c]
                acc = a if acc is None else acc + a
                if ky == 0 and kx == 0:
                    dc = a
        bsatd = acc - dc + (dc >> 2)
        bsatd = (bsatd + 1) >> 1
        satd_ref[pl.ds(m, 1), :] = (
            bsatd.sum((0, 1), dtype=jnp.int32).reshape(1, c))
        return 0

    # (4x4 routes to _kernel_sid0 instead.)  ``unroll`` = modes per loop
    # iteration: two_m is a full static unroll (bigger Mosaic basic
    # blocks, static prediction slices when fused); 2-4 keeps the loop
    # but interleaves INDEPENDENT mode bodies inside one iteration so the
    # VPU's multi-issue has parallel work (a single mode body is one long
    # dependency chain — measured ~1 vreg-op/cycle on the big classes).
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
    if emit != "sad_satd":
        _emit_costs(out_refs, sad_ref[...], satd_ref[...], emit)

@functools.partial(jax.jit, static_argnames=(
    "h", "w", "r", "cu_tile", "interpret", "inputs_permuted",
    "pred_mode_minor", "emit", "two_m", "sample_order", "reft_permuted",
    "unroll"))
def upsample_distortion(pred, orig, ref_t, refl_anchor, *, h, w, r,
                        cu_tile=None, interpret=False,
                        inputs_permuted=False, pred_mode_minor=False,
                        emit="sad_satd", mat=None, two_m=None,
                        sample_order="raster", reft_permuted=False,
                        limbs=None, unroll=0):
    """Fused upsample+SAD+SATD for one class.

    pred: [2M, R*R, nCU] int16 reduced predictions (raster sample order).
    orig: [h*w, nCU] int16 original samples (raster).
    ref_t: [w, nCU] int16 complete top boundaries.
    refl_anchor: [R, nCU] int16 left-boundary anchor samples
        (ref_l[up_v-1::up_v]).
    ``inputs_permuted``: pred and orig already carry the %4-grouped sample
    order of `input_perms` (bake pred's into the weight matrices and fold
    orig's into the gather transpose — both free there, vs a standalone
    gather pass here).
    Returns (sad, satd): [2M, nCU] int32 each — or, with emit="msh_t",
    a single [nCU, 2M] int32 min(2*SAD, SATD) in MODE-MINOR layout (the
    reference's MAX_PERFORMANCE_DIST regime, main_aux_functions.h:1,
    intra.cl:1122-1168: only minSadHad leaves the kernel).  Inputs are
    padded to the CU tile internally; outputs are sliced back to nCU.
    Outputs are in the caller's lattice order (see _emit_costs for why a
    CTU-direct output layout was retired).
    """
    sid0 = h == 4 and w == 4
    mode_minor = r == 4 and not sid0  # all SizeId1 classes
    fused = pred is None
    s = r * r
    if fused:
        # The whole prediction chain runs in-kernel: boundary reduce +
        # limb split + one MXU dot against the augmented matrix (see
        # _build_limbs / _fused_pred / ops/pallas/pred.py); neither the
        # limb stack nor the pred tensor ever touches HBM.  refl_anchor
        # must be the FULL [h, nCU] raster left boundary.
        assert mat is not None and two_m is not None
        assert refl_anchor.shape[0] == h, "fused kernels need full ref_l"
        n_pred = n_in = orig.shape[-1]
    elif pred_mode_minor:
        assert sid0 or mode_minor, (
            "mode-minor pred layout is a SizeId0/1 option")
        s, two_m, n_pred = pred.shape
    else:
        two_m, s, n_pred = pred.shape
    # NOTE: packing G modes along the column axis of the w == r classes
    # was tried and measured SLOWER (duplicated original samples and
    # smaller CU tiles outweigh the wider planes); only SizeId0 keeps the
    # mode-on-sublanes form, via its dedicated kernel.
    n_in = orig.shape[-1]
    tile = cu_tile or default_cu_tile(h, w)
    pad = (-n_in) % tile
    n_cu = n_in + pad
    grid = (n_cu // tile,)

    def _idx(i):
        return (0, i)

    def _zero(i):
        return (0, 0)
    if pad:
        orig, ref_t, refl_anchor = (
            jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
            for a in (orig, ref_t, refl_anchor))
    if n_pred == n_in:
        if pad and not fused:
            pred = jnp.pad(pred, [(0, 0), (0, 0), (0, pad)])
    elif n_pred != n_cu:
        raise ValueError(
            f"pred CU axis {n_pred} matches neither nCU {n_in} nor the "
            f"tile-padded {n_cu}")

    if fused:
        rows_m, k_dim = mat.shape
        pred_inputs = [mat]
        pred_specs = [pl.BlockSpec((rows_m, k_dim), _zero,
                                   memory_space=pltpu.VMEM)]
    else:
        if (sid0 or mode_minor) and not pred_mode_minor:
            pred = jnp.swapaxes(pred, 0, 1)
        pred_inputs = [pred]
        shape3 = ((s, two_m, tile) if sid0 or mode_minor
                  else (two_m, s, tile))
        pred_specs = [pl.BlockSpec(shape3, lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)]

    n_outs = 1 if emit == "msh_t" else 2
    if emit == "sad_satd":
        out_specs = [pl.BlockSpec((two_m, tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [jax.ShapeDtypeStruct((two_m, n_cu), jnp.int32)] * 2
    else:  # transposed (mode-minor) outputs
        out_specs = [pl.BlockSpec((tile, two_m), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)] * n_outs
        out_shape = [jax.ShapeDtypeStruct((n_cu, two_m),
                                          jnp.int32)] * n_outs

    def _sliced(outs):
        if emit == "sad_satd":
            return outs[0][:, :n_in], outs[1][:, :n_in]
        if emit == "msh_t":
            return outs[0][:n_in]
        return outs[0][:n_in], outs[1][:n_in]

    if sid0:
        # SizeId0: mode-on-sublanes kernel (fused also takes the raw
        # boundaries for the in-kernel reduce + limb split, OR the
        # XLA-precomputed limb stack via ``limbs``).
        if limbs is not None:
            assert fused, "limbs input requires the fused pred path"
            if pad:
                limbs = jnp.pad(limbs, [(0, 0), (0, pad)])
            bnd_specs = [pl.BlockSpec((limbs.shape[0], tile), _idx,
                                      memory_space=pltpu.VMEM)]
            bnd_inputs = (limbs,)
        else:
            bnd_specs = [
                pl.BlockSpec((w, tile), _idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((h, tile), _idx, memory_space=pltpu.VMEM),
            ] if fused else []
            bnd_inputs = (ref_t, refl_anchor) if fused else ()
        outs = pl.pallas_call(
            functools.partial(_kernel_sid0, two_m=two_m, emit=emit,
                              fused=fused,
                              has_limbs=limbs is not None),
            grid=grid,
            in_specs=pred_specs + [
                pl.BlockSpec((h * w, tile), _idx,
                             memory_space=pltpu.VMEM),
            ] + bnd_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*pred_inputs, orig, *bnd_inputs)
        return _sliced(outs)

    if mode_minor:
        # SizeId1 classes: mode-on-sublanes kernel; every sample access
        # is static indexing, so the order is a parameter: raster
        # (legacy/tests) or the phase4 pipeline's x-major %4 layout.
        limb_specs = []
        limb_inputs = ()
        if limbs is not None:
            assert fused, "limbs input requires the fused pred path"
            if pad:
                limbs = jnp.pad(limbs, [(0, 0), (0, pad)])
            limb_specs = [pl.BlockSpec((limbs.shape[0], tile), _idx,
                                       memory_space=pltpu.VMEM)]
            limb_inputs = (limbs,)
        kernel = functools.partial(_kernel_mode_minor,
                                   has_limbs=limbs is not None,
                                   h=h, w=w, r=r,
                                   two_m=two_m, emit=emit, fused=fused,
                                   sample_order=sample_order)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=pred_specs + [
                pl.BlockSpec((h * w, tile), _idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, tile), _idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((refl_anchor.shape[0], tile),
                             _idx, memory_space=pltpu.VMEM),
            ] + limb_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*pred_inputs, orig, ref_t, refl_anchor, *limb_inputs)
        return _sliced(outs)

    # Static %4-group permutations (see _kernel); applied here unless the
    # caller already folded them upstream (inputs_permuted /
    # reft_permuted — the phase4 gather pipeline emits both for free).
    pred_perm, refl_perm, reft_perm, orig_perm = input_perms(h, w, r)
    if not inputs_permuted:
        if not fused:
            pred = pred[:, pred_perm, :]
            pred_inputs = [pred]
        orig = orig[orig_perm, :]
    if not fused:
        # fused keeps the full raster ref_l (anchors picked in-kernel)
        refl_anchor = refl_anchor[refl_perm, :]
    if not reft_permuted:
        ref_t = ref_t[reft_perm, :]
    kernel = functools.partial(_kernel, h=h, w=w, r=r, two_m=two_m,
                               emit=emit, fused=fused, unroll=unroll)
    eff_unroll = unroll or (
        two_m if _grouped_unrolled(h, w, two_m, fused, tile) else 1)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=pred_specs + [
            pl.BlockSpec((h * w, tile), _idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile), _idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((refl_anchor.shape[0], tile), _idx,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            ([pltpu.VMEM((two_m, tile), jnp.int32)] * 2
             if emit != "sad_satd" else [])
            + ([pltpu.VMEM((two_m * s, tile), jnp.int32)]
               if fused and eff_unroll < two_m
               else [])),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * two_m * n_cu * h * w * 4,
            bytes_accessed=(sum(a.size for a in pred_inputs) + orig.size
                            + ref_t.size + refl_anchor.size) * 2
                           + two_m * n_cu * 8,
            transcendentals=0,
        ),
    )(*pred_inputs, orig, ref_t, refl_anchor)
    return _sliced(outs)
