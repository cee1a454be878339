"""The flagship model: full-frame MIP mode-search cost engine.

Computes, for every candidate CU of every size group in every CTU and every
(transposed and non-transposed) MIP mode, the SAD / SATD / minSadHad costs —
the TPU-native equivalent of the reference's per-frame kernel pipeline
initBoundaries -> MIP_ReducedPred -> upsampleDistortion
(reference: main.cpp:678-1241).

Design (TPU-first, see SURVEY.md §7.1): instead of 47 size-specialized GPU
work-group programs, CUs are batched by *shape class* — all CUs sharing
(width, height, SizeId) across all alignment groups and CTUs form one dense
tensor, so the whole mode search per class is a single gather -> einsum ->
interpolate -> reduce chain that XLA fuses.  All arithmetic is exact int32,
bit-identical to the golden model.

Out-of-frame CUs (partial CTUs at the bottom/right frame edges) are computed
from edge-clamped gathers — deterministic, documented values — and flagged
invalid in the validity mask.  The reference leaves undefined buffer contents
for these CUs (intra.cl:96-98), so only valid CUs are comparable.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from vvc_mip_gpu_tpu.constants import (
    GROUPS,
    PRED_MODES,
    STRIDED_DISTORTIONS_PER_CTU,
    num_ctus,
)
from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
from vvc_mip_gpu_tpu.ops.geometry import ClassPlan, class_plans, padded_extent


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameCosts:
    """Cost tensors in the reference's strided per-CTU layout.

    Index within a CTU slab: STRIDED_DISTORTIONS_PER_CTU[group] +
    cu * 2*num_modes + mode (reference: intra.cl:1144-1148); shape
    [nCTU, STRIDED_DISTORTIONS_PER_CTU[-1]] = [nCTU, 97840].
    """

    sad: jax.Array
    satd: jax.Array
    min_sad_had: jax.Array
    valid: jax.Array  # bool, same layout; False for out-of-frame CUs


# Test overrides: force the Pallas engine branch on/off regardless of
# backend, and run the kernels in interpret mode (CPU emulation) so the
# engine-level Pallas wiring is exercised by the default test run, not
# only by the tpu-marked hardware tests.
_PALLAS_OVERRIDE: bool | None = None
_PALLAS_INTERPRET: bool = False

# Which roles the fetch_rows relayout kernel serves ("both" | "left" |
# "orig" | "none"); an A/B lever for on-hardware profiling — the XLA
# phase gathers are the fallback either way.
#
# DEFAULT MATCHES THE RECORDED MEASUREMENT (r3 full A/B, 1080p in-jit
# e2e max-perf, evidence/tpu_batch_r3.log): left 8.58 ms < none 8.82 <
# orig 8.88 < both 8.92 — fetch_rows wins for the left-boundary role
# only (its strided column reads are the one gather XLA does badly);
# adding the originals role overshoots.  Re-confirmed with the r4
# rowband default on (evidence/tpu_tune_r4h.log): left 8.10 ms vs
# none 8.36 — the row-band path covers class interiors, not the
# left-boundary columns, so fetch_rows still pays for itself.
import os as _os

_FETCH_MODE: str = _os.environ.get("VVC_FETCH", "left")


# SizeId0/1 limb-stack source: "kernel" builds the boundary-reduce +
# limb split in-kernel per grid step (~40 single-sublane plane ops x
# 288 steps at 1080p for the 4x4 class); "xla" precomputes the stack
# for the whole lattice in one wide pass and feeds it as a kernel input
# (A/B levers for the mode-on-sublanes classes' gap to their roofline
# floors; the SizeId1 kernels still take the raw boundaries as upsample
# bases either way).
_SID0_LIMBS: str = _os.environ.get("VVC_SID0_LIMBS", "kernel")
_SID1_LIMBS: str = _os.environ.get("VVC_SID1_LIMBS", "kernel")

# Row-band kernel lever: "1" (the measured default) routes shape
# classes through ops/pallas/rowband.py, which consumes the phase-split
# tensors directly as [w, k, h, C] blocks — no materialized orig/ref
# relayouts (the ~1.1 ms/frame orig family of evidence/ablate_r4.log).
# Default decided by the batch-H A/B (evidence/tpu_tune_r4h.log):
# 1080p in-jit e2e 8.10 ms with the trimmed class set vs 8.62 off
# (8.31 with VVC_RB_CLASSES=all); headline bench 106.9 fps vs 104.0.
_ROWBAND: str = _os.environ.get("VVC_ROWBAND", "1")

# Which classes take the row-band path when it is on: hardware-measured
# winners (in-context per-class A/B, evidence/tpu_tune_r4f/r4g.log):
# 16x8 0.70 vs 0.86, 8x8 0.56 vs 0.97; 8x16/16x16/16x32/8x4 neutral
# (kept — they drop relayout HBM traffic at equal time).  Excluded
# measured losers: 8x32 (0.61 vs 0.46), 4x4 (0.67 vs 0.60), 16x4
# (0.66 vs 0.61).  4x8/4x16 were excluded in r4 "pending compile-time
# investigation"; the r5 probe showed the blowup no longer reproduces
# (tools/rb_compile_probe.py: trace+lower <4 s, Mosaic backend <2 s
# per w=4 kernel, evidence/tpu_batch_r5.log part C) and the whole-set
# A/B keeps them out on perf alone (RB_CLASSES=all 8.22 ms vs trimmed
# 8.09, same batch).  Override: VVC_RB_CLASSES="16x8,8x16" or "all".
_RB_DEFAULT_CLASSES = "16x8,8x16,16x16,16x32,8x8,8x4"
_RB_CLASSES: str = _os.environ.get("VVC_RB_CLASSES", _RB_DEFAULT_CLASSES)

# Row-band band height (rows of the lattice per grid step).  Read at
# import like the other levers; the VMEM eligibility gate below is
# computed from THIS value so raising it can never route a group whose
# og box exceeds the scoped-VMEM budget (the r4 gate hardcoded k=8 in
# the check, making VVC_RB_K=16 lever-unsafe — the Mosaic OOM class of
# evidence/tpu_tune_r4e_fail1.log).
_RB_K: int = int(_os.environ.get("VVC_RB_K", "8"))
# Lane-packing lever (r5): route coarse-stride groups (e.g. the
# 60-column stride-32 partitions at 1080p, 47% lane fill) by packing
# 2 or 4 consecutive lattice rows side-by-side along the lane axis
# (fill 120/128) — the kernels are lane-independent so they run
# unchanged; the costs unpack in XLA.  A/B lever pending hardware
# measurement.
_RB_PACK: str = _os.environ.get("VVC_RB_PACK", "0")
# Routing-gate thresholds, module-level so tests can lower them to
# force the row-band path at small geometries (mirroring
# _PALLAS_OVERRIDE): minimum lattice-column lane fill and the scoped
# VMEM budget one k-band og box may occupy.  The budget is a PROXY for
# Mosaic's 16M scoped-vmem limit: measured scoped usage is ~10x the
# int16 og box (the kernel's int32 og/diff plane families plus the
# double-buffered block DMA) — the r4 2MB budget let the 4K 16x32
# partition (256 lanes, box 2MB -> 20.5M scoped) through to a Mosaic
# stack OOM (evidence/tpu_batch_r5.log, first 4K default-lever run).
# 1MB (~10.3M scoped) is the empirically-good 1080p ceiling; larger
# boxes grid over 128-lane tiles of the column axis instead of OOMing
# (_rb_tiling — NOT by shrinking the band height below 8: Mosaic's
# sublane rule requires the reft block's k to be a multiple of 8, which
# the first r5 band-shrink fix violated; interpret mode does not check
# block-mapping rules, so only the hardware run caught it).
_RB_MIN_FILL: float = 0.9
_RB_VMEM_BUDGET: int = 1 << 20
# When a list, _class_costs_rowband appends ("WxH", sorted(covered
# group indices)) at trace time — lets tests assert the gate actually
# routed something instead of passing vacuously (VERDICT r4 weak #1).
_RB_ROUTED_LOG: list | None = None



def _use_pallas() -> bool:
    if _PALLAS_OVERRIDE is not None:
        return _PALLAS_OVERRIDE
    return jax.default_backend() == "tpu"


def _group_stride(gp) -> int | None:
    """Lattice x stride for the phase-split gather path, or None for the
    (rare) non-uniform-x groups that fall back to the transpose path."""
    if gp.x_prog is None:
        return None
    s = gp.x_prog[1] if len(gp.xs) > 1 else gp.width
    return s if gp.x_prog[0] + gp.width <= s else None


def gather_strides(width: int, height: int) -> tuple[int, ...]:
    """All distinct lattice strides the phase-split gathers need."""
    out = set()
    for cplan in class_plans(width, height):
        for gp in cplan.groups:
            s = _group_stride(gp)
            if s is not None:
                out.add(s)
    return tuple(sorted(out))


def _class_costs(frame, ref_ext, is_top, cplan: ClassPlan,
                 use_pallas: bool | None = None,
                 max_performance: bool = False,
                 f_frame=None, f_slab=None, f_reff=None):
    """Per-group cost blocks of one shape class in the reference CTU
    layout: {group_index: [nCTU, n*2M] minSadHad} with
    ``max_performance``, else {group_index: (sad, satd)} pairs.

    On TPU, all groups are concatenated into one lattice-order kernel
    call per class whose mode-minor output is reordered to the CTU
    layout by a mid-axis-only XLA transpose (a CTU-direct output
    BlockSpec was tried and retired — see ops/pallas/distortion.py
    _emit_costs: Mosaic's block granularity makes it illegal, and the
    reorder it would save measures ~free behind the kernels).
    The upsample+distortion stage runs as one fused Pallas kernel (no
    HBM intermediates) and the gathers run via the %4-major phase
    pipeline:
    ref_l and (for the mode-on-sublanes classes) the x-major original
    samples come from the pure-copy fetch_rows relayout kernel, ref_t and
    the grouped classes' %4-sample orders fall out of contiguous phase-
    run concats for free.  Elsewhere (CPU tests) the raster XLA SoA path
    is used.  ``f_frame``/``f_ref``: the per-stride %4-major phase splits.
    """
    shape = cplan.shape
    w, h = shape.width, shape.height
    r = shape.reduced_pred_size
    if use_pallas is None:
        use_pallas = _use_pallas()
    rb_out: dict[int, object] = {}
    rb_covered: frozenset[int] = frozenset()
    if (use_pallas and _ROWBAND == "1" and f_frame is not None
            and (_RB_CLASSES == "all"
                 or f"{w}x{h}" in {c.strip()
                                   for c in _RB_CLASSES.split(",")})):
        rb_out, rb_covered = _class_costs_rowband(
            cplan, f_frame, f_slab, is_top, max_performance)
        if len(rb_covered) == len(cplan.groups):
            return rb_out
    mode_minor = use_pallas and shape.size_id < 2
    if use_pallas and not mode_minor:
        # Grouped (SizeId2) kernel: %4 sample orders.  Columns and ref_t
        # come %4-grouped from the phase runs for free; the y row_perm is
        # folded into the gather transpose; pred's order is baked into
        # the weight rows.
        from vvc_mip_gpu_tpu.ops.pallas.distortion import (
            _mod4_major, input_perms)

        pred_perm = tuple(int(v) for v in input_perms(h, w, r)[0])
        row_perm, col_perm = _mod4_major(h), _mod4_major(w)
    elif mode_minor and not (w == 4 and h == 4):
        # Mode-on-sublanes kernels index samples statically: x-major
        # %4-grouped orig (the fetch_rows layout), %4-grouped ref_t.
        pred_perm = None
        row_perm = col_perm = None
    elif mode_minor:
        # SizeId0: x-major == transposed 4x4 sample grid; SAD/SATD are
        # transpose-invariant so only pred's row order must match.
        pred_perm = tuple(
            int(v) for v in np.arange(16).reshape(4, 4).T.ravel())
        row_perm = col_perm = None
    else:
        pred_perm = None
        row_perm = col_perm = None
    kernel_kw = None
    if use_pallas:
        # The whole prediction chain is FUSED into the distortion kernel:
        # every kernel takes the raw raster boundaries and does the
        # boundary reduce + limb split + one bf16 MXU dot against the
        # augmented matrix (offset term, rounding, +first and both wings
        # folded in — see ops/pallas/pred.py) in-kernel.  Neither the
        # limb stack nor the ~600 MB/frame prediction tensor ever exists
        # in HBM.  (An earlier pre-limb-fold in-kernel matmul measured
        # 2x slower; the single-dot form with contiguous row-slice
        # consumption wins.)
        from vvc_mip_gpu_tpu.ops.pallas import pred as pallas_pred
        from vvc_mip_gpu_tpu.ops.pallas.distortion import (
            default_cu_tile, fused_cu_tile, upsample_distortion)

        two_m = 2 * PRED_MODES[shape.size_id]
        mat = jnp.asarray(pallas_pred._augmented_matrix(
            shape.size_id, pred_perm, mode_minor))
        sid1 = mode_minor and not (w == 4 and h == 4)
        kernel_kw = dict(h=h, w=w, r=r, inputs_permuted=True, mat=mat,
                         two_m=two_m,
                         sample_order="xmajor4" if sid1 else "raster",
                         reft_permuted=True, interpret=_PALLAS_INTERPRET,
                         emit="msh_t" if max_performance
                         else "sad_satd_t")
    def _sid0_limbs(rt, rl):
        """XLA-precomputed limb stack for the mode-on-sublanes classes
        (VVC_SID0_LIMBS / VVC_SID1_LIMBS levers); None selects the
        in-kernel build.  For the x-major-%4 SizeId1 classes the stored
        ref_t rows are un-permuted back to raster before the reduce
        (the in-kernel build does the same via its t_order map)."""
        sid0 = w == 4 and h == 4
        if not use_pallas or not (
                (sid0 and _SID0_LIMBS == "xla")
                or (mode_minor and not sid0 and _SID1_LIMBS == "xla")):
            return None
        from vvc_mip_gpu_tpu.ops.pallas import pred as pallas_pred

        if not sid0 and w > 4:
            from vvc_mip_gpu_tpu.ops.pallas.distortion import _mod4_major

            # stored[k] = raster[_mod4_major(w)[k]] => raster order is
            # stored[argsort(perm)] (the kernel's t_order map).
            rt = rt[np.argsort(_mod4_major(w))]
        bs = shape.boundary_size
        return pallas_pred._augmented_inputs(
            soa.reduce_boundary(rt, bs), soa.reduce_boundary(rl, bs),
            shape.size_id)

    out: dict[int, object] = dict(rb_out)
    pending = []
    for gp in cplan.groups:
        if gp.group_index in rb_covered:
            continue
        stride = _group_stride(gp)
        if stride is not None and f_frame is not None:
            rt, rl, og = _gather_group_phase4(
                f_frame[stride], f_slab[stride], f_reff[stride], gp,
                is_top, use_pallas=use_pallas, mode_minor=mode_minor,
                row_perm=row_perm)
        else:
            # Non-uniform-x lattice (the interleaved 8x8 group): plain
            # padded-frame gathers, then the class's sample orders
            # applied in XLA for consistency with the phase-path groups.
            rt, rl = soa.gather_boundaries(ref_ext, gp, is_top)
            fb_col = col_perm
            if mode_minor and w > 4:
                from vvc_mip_gpu_tpu.ops.pallas.distortion import (
                    _mod4_major as _m4)

                fb_col = _m4(w)  # x %4-grouped, matching fetch_rows
            og = soa.gather_originals(
                frame, gp, row_perm, fb_col,
                order="xy" if mode_minor else "yx")
            if use_pallas and w > 4:
                from vvc_mip_gpu_tpu.ops.pallas.distortion import (
                    _mod4_major as _m4)

                rt = rt[np.asarray(_m4(w))]
        pending.append((gp, rt, rl, og))
    if not pending:
        return out
    gps = [p[0] for p in pending]
    ref_t = jnp.concatenate([p[1] for p in pending], axis=-1)  # [w, nCU]
    ref_l = jnp.concatenate([p[2] for p in pending], axis=-1)  # [h, nCU]
    orig = jnp.concatenate([p[3] for p in pending], axis=-1)  # [h*w, nCU]

    if use_pallas:
        from vvc_mip_gpu_tpu.ops.pallas.distortion import class_tile_unroll

        tile_ov, unroll = class_tile_unroll(h, w)
        tile = tile_ov or (default_cu_tile(h, w) if mode_minor
                           else fused_cu_tile(h, w, two_m))
        costs = upsample_distortion(None, orig, ref_t, ref_l,
                                    cu_tile=tile, unroll=unroll,
                                    limbs=_sid0_limbs(ref_t, ref_l),
                                    **kernel_kw)
    else:
        red_t = soa.reduce_boundary(ref_t, shape.boundary_size)
        red_l = soa.reduce_boundary(ref_l, shape.boundary_size)
        pred = soa.reduced_prediction_all_modes(
            red_t, red_l, shape.size_id, sample_perm=pred_perm)

        if shape.size_id > 0:
            pred = soa.upsample_all(pred, ref_t, ref_l, w, h, r)
        sad, satd = soa.distortion(orig, pred, h, w)
        costs = (jnp.minimum(2 * sad, satd).T if max_performance
                 else (sad.T, satd.T))
    # Split the pending CU axis back per group (static lattice sizes) and
    # reorder each from lattice order to the reference CTU layout.
    off = 0
    for gp in gps:
        n = gp.n_rows * gp.n_cols
        if max_performance:
            out[gp.group_index] = gp.lattice_costs_to_ctu_mode_minor(
                costs[off:off + n])
        else:
            sad_t, satd_t = costs
            out[gp.group_index] = (
                gp.lattice_costs_to_ctu_mode_minor(sad_t[off:off + n]),
                gp.lattice_costs_to_ctu_mode_minor(satd_t[off:off + n]))
        off += n
    return out


def _rb_pack_factor(gp, w: int, h: int) -> int | None:
    """Row-band routing gate for one uniform-stride group: the lane-pack
    factor to run it with, or None for the default path.

    pack=1 when the lattice columns fill >= _RB_MIN_FILL of the
    128-padded lane tile; otherwise (with the VVC_RB_PACK lever on) the
    smallest pack in {2, 4} whose side-by-side row packing reaches the
    fill bar (e.g. the 60-column stride-32 groups at 1080p: 2*60=120 of
    128).  Rejected either way if the [w, _RB_K, h, C] og box — at the
    ACTUAL configured band height and PACKED lane width — would crowd
    the scoped-VMEM budget (the Mosaic OOM class of
    evidence/tpu_tune_r4e_fail1.log)."""
    if gp.y_prog is None:
        return None  # non-uniform lattice: default path
    pack = None
    for p in (1, 2, 4):
        if p > 1 and _RB_PACK != "1":
            break
        cp = -(-(p * gp.n_cols) // 128) * 128
        if (p * gp.n_cols) / cp >= _RB_MIN_FILL:
            pack = p
            break
    if pack is None:
        return None  # lane padding too wasteful even packed
    cp = -(-(pack * gp.n_cols) // 128) * 128
    if _rb_tiling(w, h, cp) is None:
        return None  # og block over budget even at k=8, cl=128
    return pack


@functools.cache
def _shape_params(w: int, h: int) -> tuple[int, int]:
    """(reduced_pred_size, total_modes) for a CU shape, from the
    canonical constants.shape_classes() table (no re-derived SizeId
    rule to drift from it)."""
    from vvc_mip_gpu_tpu.constants import shape_classes

    sc = next(s for s in shape_classes()
              if (s.width, s.height) == (w, h))
    return sc.reduced_pred_size, sc.total_modes


def _rb_scoped_est(w: int, h: int, kk: int, cl: int) -> int:
    """Estimated Mosaic scoped-VMEM bytes for one rowband grid step.

    The og box proxy alone is NOT enough: the 4K 8x16 partition
    (512 lanes) fit the 1MB box budget yet OOMed the 16M scoped stack
    at 17.15M (evidence/tpu_batch_r5.log, part-B 4K re-run) because the
    predv stage — [2M*r*r, k*cl] int32, materialized whether unrolled
    or as explicit scratch — is 12.6MB at cl=512 and scales with two_m,
    not with the box.  Model the two dominant families separately:
    predv exactly, plus ~8x the int16 box for the og int32 copies and
    the per-mode upsample/Hadamard planes (calibrated: 16x32@128 est
    11.1M vs 10.3M measured; 8x16@512 est 20.6M vs 17.15M measured)."""
    r, two_m = _shape_params(w, h)
    box = w * kk * h * cl * 2
    predv = 4 * two_m * r * r * kk * cl
    return predv + 8 * box


# Headroom under Mosaic's 16M scoped-vmem limit for the slack the
# estimator doesn't model (boundary row planes, limb stack, DMA
# double-buffering) and its error band (observed up to ~1M over on the
# box-dominated shapes).
_RB_SCOPED_LIMIT: int = 13 << 20


def _rb_tiling(w: int, h: int, c_pad: int) -> tuple[int, int] | None:
    """(band height k, lane-tile width cl) for a rowband partition, or
    None if no legal tiling fits the scoped-VMEM budget.

    The [w, k, h, cl] og box must fit _RB_VMEM_BUDGET and the
    _rb_scoped_est model must clear _RB_SCOPED_LIMIT.  Wide partitions
    (4K: c_pad 256+) shrink cl — the kernel grids over 128-lane tiles of
    the column axis, each grid step a hardware-native tile — BEFORE
    shrinking k, and k never drops below 8: Mosaic's block-mapping rule
    needs the reft block's sublane dim (k) to be a multiple of 8."""
    # Round any VVC_RB_K down to a multiple of 8 (Mosaic's sublane
    # rule); halving below likewise re-rounds, so e.g. K=24 tries
    # 24 -> 8, never an illegal 12-row band.
    kk = max(8, _RB_K // 8 * 8)
    while True:
        cl = c_pad
        while True:
            if (w * kk * h * cl * 2 <= _RB_VMEM_BUDGET
                    and _rb_scoped_est(w, h, kk, cl) <= _RB_SCOPED_LIMIT):
                return kk, cl
            if cl <= 128:
                break
            half = cl // 2
            cl = half if half % 128 == 0 and c_pad % half == 0 else 128
        if kk == 8:
            return None
        kk = max(8, kk // 2 // 8 * 8)


def _class_costs_rowband(cplan: ClassPlan, f_frame, f_slab, is_top,
                         max_performance: bool):
    """Class costs via the row-band kernels (VVC_ROWBAND=1):
    phase-space boxes in, [n_r, C, 2M] lattice-order mode-minor costs
    out — no materialized orig/boundary relayouts (see
    ops/pallas/rowband.py).  Groups sharing a (lattice stride, pack
    factor) share one kernel call.  Returns (blocks, covered): a
    partition is taken when _rb_pack_factor admits it — lane fill
    >= _RB_MIN_FILL at some pack in {1, 2, 4} (VVC_RB_PACK gates >1)
    AND _rb_tiling finds a (band height k, lane-tile width cl) whose
    og box and scoped-VMEM estimate fit the budgets; the rest stay on
    the default gather path (mixed per-class routing)."""
    from vvc_mip_gpu_tpu.ops.pallas import pred as pallas_pred
    from vvc_mip_gpu_tpu.ops.pallas.distortion import input_perms
    from vvc_mip_gpu_tpu.ops.pallas.rowband import (
        rowband_distortion, rowband_distortion_mm)

    shape = cplan.shape
    w, h, r = shape.width, shape.height, shape.reduced_pred_size
    sid = shape.size_id
    two_m = 2 * PRED_MODES[sid]
    if sid == 2:
        pred_perm = tuple(int(v) for v in input_perms(h, w, r)[0])
        mat = jnp.asarray(
            pallas_pred._augmented_matrix(2, pred_perm, False))
    else:
        # Mode-minor kernel: raster (y, x) sample rows on both pred and
        # orig (the kernel indexes the og box statically, so no perm).
        mat = jnp.asarray(pallas_pred._augmented_matrix(sid, None, True))

    # Partition by (lattice stride, pack factor): groups in one
    # partition share a kernel call (their bands concatenate on the
    # row axis; same packed lane width by construction).
    by_part: dict[tuple[int, int], list] = {}
    for gp in cplan.groups:
        s = _group_stride(gp)
        if s is None:
            continue
        p = _rb_pack_factor(gp, w, h)
        if p is None:
            continue
        by_part.setdefault((s, p), []).append(gp)

    out: dict[int, object] = {}
    covered = frozenset(gp.group_index
                        for gps in by_part.values() for gp in gps)
    if _RB_ROUTED_LOG is not None:
        _RB_ROUTED_LOG.append((f"{w}x{h}", sorted(covered)))
    for (s, p), gps in sorted(by_part.items()):
        boxes = [soa.rowband_boxes(f_frame[s], f_slab[s], gp, is_top,
                                   pack=p)
                 for gp in gps]
        og = jnp.concatenate([b[0] for b in boxes], axis=1)
        rt = jnp.concatenate([b[1] for b in boxes], axis=1)
        rl = jnp.concatenate([b[2] for b in boxes], axis=0)
        kk, cl = _rb_tiling(w, h, og.shape[-1])
        emit = "msh_t" if max_performance else "sad_satd_t"
        if sid == 2:
            res = rowband_distortion(
                og, rt, rl, mat, h=h, w=w, r=r, two_m=two_m, emit=emit,
                k=kk, cl=cl, interpret=_PALLAS_INTERPRET)
        else:
            res = rowband_distortion_mm(
                og, rt, rl, mat, h=h, w=w, r=r, two_m=two_m,
                bs=shape.boundary_size, emit=emit, k=kk, cl=cl,
                interpret=_PALLAS_INTERPRET)
        off = 0
        for gp in gps:
            n_r, n_c = gp.n_rows, gp.n_cols
            n_rp = -(-n_r // p)  # packed row count of this group

            def _blk(t):
                b = t[off:off + n_rp]
                if p > 1:
                    # packed row t, lane block q = lattice row t*p+q
                    b = jnp.stack([b[:, q * n_c:(q + 1) * n_c]
                                   for q in range(p)], axis=1)
                    b = b.reshape(n_rp * p, n_c, two_m)[:n_r]
                else:
                    b = b[:, :n_c]
                return gp.lattice_costs_to_ctu_mode_minor(
                    b.reshape(n_r * n_c, two_m))

            if max_performance:
                out[gp.group_index] = _blk(res)
            else:
                out[gp.group_index] = (_blk(res[0]), _blk(res[1]))
            off += n_rp
    return out, covered


def _gather_group_phase4(f4_frame, f4_slab, f4_reff, gp, is_top, *,
                         use_pallas: bool, mode_minor: bool, row_perm):
    """One uniform-x group's (ref_t, ref_l, orig) via the %4-major phase
    pipeline.  On TPU, ref_l and (mode-minor) orig come from the
    pure-copy fetch_rows Pallas kernel (addressed in REF FRAME rows —
    slab row y+1 == frame row y — so DMA offsets stay tile-aligned);
    groups whose geometry the kernel's DMA alignment rules can't serve
    fall back to the XLA phase gathers."""
    s = f4_slab.shape[0]
    w, h = gp.width, gp.height
    x0 = gp.x_prog[0]
    oy = int(gp.ys[0])
    rt = soa.gather_top_phase4(f4_slab, gp, is_top, t_mod4=use_pallas)
    sy = gp.y_prog[1] if (gp.y_prog and gp.n_rows > 1) else h
    kernel_ok = use_pallas and gp.y_prog is not None

    def _fetch(f4, runs):
        if not kernel_ok:
            return None
        from vvc_mip_gpu_tpu.ops.pallas.gather import fetch_rows

        try:
            return fetch_rows(f4, runs=runs, oy=oy, sy=sy, h=h,
                              n_r=gp.n_rows, c_log=gp.n_cols,
                              interpret=_PALLAS_INTERPRET)
        except ValueError:
            return None

    p_left = soa.phase4_pos((x0 - 1) % s, s)
    rl = (_fetch(f4_reff, ((p_left, 1),))
          if _FETCH_MODE in ("both", "left") else None)
    if rl is not None and x0 == 0:
        # Frame-left wrap: CU column j's left neighbor is column j-1 of
        # the LAST phase — shift one lattice column right; the garbage
        # j == 0 column is overwritten by the edge fixup below.
        rl = jnp.concatenate([rl[:, :1], rl[:, :-1]], axis=1)
    if rl is None:
        rl = soa.gather_left_phase4(f4_slab, gp)
    rl = soa.left_fixups4(rl, f4_slab, gp, is_top)
    if mode_minor:
        og = (_fetch(f4_frame, tuple(soa.window_runs(x0, w, s)))
              if _FETCH_MODE in ("both", "orig") else None)
        if og is None:
            og = soa.gather_originals_phase4(f4_frame, gp, order="xy")
    elif use_pallas:
        og = soa.gather_originals_phase4(f4_frame, gp,
                                         row_perm=row_perm, order="yx")
    else:
        og = soa.gather_originals_phase4(f4_frame, gp, order="raster")
    return rt, rl, og


def _pad_edge(a, rows: int, cols: int):
    """Pad [R, C] to [rows, cols] by replicating the last row/column."""
    if rows > a.shape[0]:
        tail = jnp.broadcast_to(a[-1:], (rows - a.shape[0], a.shape[1]))
        a = jnp.concatenate([a, tail], axis=0)
    if cols > a.shape[1]:
        tail = jnp.broadcast_to(a[:, -1:], (a.shape[0], cols - a.shape[1]))
        a = jnp.concatenate([a, tail], axis=1)
    return a


def _flatten_strided(blocks: dict[int, jax.Array]) -> jax.Array:
    """Concatenate per-group [nCTU, n*2M] blocks into the strided layout."""
    return jnp.concatenate([blocks[g.index] for g in GROUPS], axis=1)


def compute_ext(frame, ref, halo_row, is_top, width: int, height: int,
                max_performance: bool = False):
    """Cost computation against a halo-extended reference slab.

    ``frame`` is the [height, width] distortion-target slab; ``ref`` the
    boundary-sample source (pass the SAME OBJECT as ``frame`` for the
    original-samples regime — the phase tensors are then shared);
    ``halo_row`` is the [width] sample row above the slab (exchanged from
    the neighboring shard in the spatial-parallel engine; any row for the
    frame's top shard).  ``is_top`` (bool, may be traced) marks the slab
    holding the frame's global top row.  Returns (sad, satd, min_sad_had)
    in the flat strided layout; with ``max_performance`` (the reference's
    MAX_PERFORMANCE_DIST, main_aux_functions.h:1) sad/satd are None and
    only minSadHad is assembled.
    """
    sad_blocks, satd_blocks, msh_blocks = compute_blocks(
        frame, ref, halo_row, is_top, width, height,
        max_performance=max_performance)
    if max_performance:
        return None, None, _flatten_strided(msh_blocks)
    sad_flat = _flatten_strided(sad_blocks)
    satd_flat = _flatten_strided(satd_blocks)
    return sad_flat, satd_flat, jnp.minimum(2 * sad_flat, satd_flat)


def compute_blocks(frame, ref, halo_row, is_top, width: int, height: int,
                   max_performance: bool = False,
                   classes: tuple[int, ...] | None = None):
    """Per-group cost blocks ({group_index: [nCTU, n*2M]} dicts), for all
    shape classes or (``classes``, by class_plans index) a subset — the
    class-sharded latency engine's unit of device work: the phase splits
    built here cover only the strides the selected classes' gathers use.
    Returns (sad_blocks, satd_blocks, msh_blocks); with
    ``max_performance`` only msh_blocks is populated.
    """
    # Gathers and SoA transposes are pure data movement: run them in int16
    # (10-bit samples) to halve the traffic.  Arithmetic stages cast up.
    share_ref = ref is frame
    frame = frame.astype(jnp.int16)
    ref = frame if share_ref else ref.astype(jnp.int16)
    halo_row = halo_row.astype(jnp.int16)
    # Edge-replication padding turns every lattice gather into strided
    # slices (geometry.padded_extent); padded samples reach only CUs the
    # validity mask flags out-of-frame.
    hp, wp = padded_extent(width, height)
    plans = class_plans(width, height)
    if classes is not None:
        plans = tuple(plans[i] for i in classes)
    strides = tuple(sorted({
        s for cplan in plans for gp in cplan.groups
        if (s := _group_stride(gp)) is not None}))
    # The phase splits cover exactly ctu_cols*128 columns: every uniform
    # lattice has n_cols == ctu_cols*128/stride there, so phase-space
    # gathers need no column trimming and the lattice CU axis equals the
    # phase tensors' minor axis exactly (wp >= that by padded_extent).
    w_eff = num_ctus(width, height)[0] * 128
    assert wp >= w_eff, (wp, w_eff)
    # phase_split4 reshapes [.., w_eff] by each stride: every lattice
    # stride must divide w_eff (true for the power-of-two VVC lattices;
    # a future non-power-of-two stride must extend the padding rule).
    assert all(w_eff % s == 0 for s in strides), (w_eff, strides)
    frame_pad = _pad_edge(frame, hp, wp)
    ref_pad_f = frame_pad if share_ref else _pad_edge(ref, hp, wp)
    halo_pad = _pad_edge(halo_row[None, :], 1, wp)
    ref_ext_pad = jnp.concatenate([halo_pad, ref_pad_f], axis=0)  # slab
    ref_pad = jnp.concatenate([ref_ext_pad[:, :1], ref_ext_pad], axis=1)
    # Phase-split frames: one lane-hostile relayout per distinct lattice
    # stride (phases %4-MAJOR: CU windows become contiguous run quartets,
    # see soa.phase_split4), after which every group gather is
    # minor-axis-preserving slices or pure-copy fetch_rows DMA.  Three
    # tensor families: the frame (orig), the halo SLAB (ref_t + edge
    # fixups: slab row y = frame row y-1), and the ref FRAME rows (the
    # ref_l fetch kernel — frame-row addressing keeps its DMA offsets
    # 8-aligned); the last shares the frame's splits when ref is frame.
    pad = _FETCH_MODE != "none"
    f_frame = {s: soa.phase_split4(frame_pad[:, :w_eff], s,
                                   pad_lanes=pad, pad_rows=8 * pad)
               for s in strides}
    f_slab = {s: soa.phase_split4(ref_ext_pad[:, :w_eff], s)
              for s in strides}
    f_reff = f_frame if share_ref else {
        s: soa.phase_split4(ref_pad_f[:, :w_eff], s,
                            pad_lanes=pad, pad_rows=8 * pad)
        for s in strides}
    sad_blocks: dict[int, jax.Array] = {}
    satd_blocks: dict[int, jax.Array] = {}
    msh_blocks: dict[int, jax.Array] = {}
    for cplan in plans:
        blocks = _class_costs(frame_pad, ref_pad, is_top, cplan,
                              max_performance=max_performance,
                              f_frame=f_frame, f_slab=f_slab,
                              f_reff=f_reff)
        for gidx, blk in blocks.items():
            if max_performance:
                msh_blocks[gidx] = blk
            else:
                sad_blocks[gidx], satd_blocks[gidx] = blk
    return sad_blocks, satd_blocks, msh_blocks


def _compute(frame, ref, width: int, height: int,
             max_performance: bool = False) -> FrameCosts:
    """Single-frame cost search.  Pass the SAME OBJECT for ``frame`` and
    ``ref`` in the original-samples regime — the gather pipeline then
    shares the phase tensors between the two roles."""
    sad_flat, satd_flat, msh_flat = compute_ext(
        frame, ref, ref[0], True, width, height,
        max_performance=max_performance)
    return FrameCosts(
        sad=sad_flat,
        satd=satd_flat,
        min_sad_had=msh_flat,
        valid=jnp.asarray(_validity_mask(width, height)),
    )


@functools.cache
def _validity_mask(width: int, height: int):
    """Static [nCTU, 97840] bool mask of fully-in-frame CUs (numpy —
    cached values must not be trace-local jax arrays)."""
    import numpy as np

    _, _, n_ctu = num_ctus(width, height)
    out = np.zeros((n_ctu, int(STRIDED_DISTORTIONS_PER_CTU[-1])), bool)
    for cplan in class_plans(width, height):
        for gp in cplan.groups:
            g = GROUPS[gp.group_index]
            v = gp.to_ctu_layout(gp.valid)  # [nCTU, nCU]
            v = np.repeat(v, g.total_modes, axis=1)
            start = int(STRIDED_DISTORTIONS_PER_CTU[g.index])
            out[:, start:start + v.shape[1]] = v
    return out


class MipCostEngine:
    """Compiled full-frame MIP cost search for a fixed frame size.

    >>> engine = MipCostEngine(1920, 1080)
    >>> costs = engine(frame)                    # original-sample regime
    >>> costs = engine(frame, filtered_frame)    # alternative-sample regime
    """

    def __init__(self, width: int, height: int,
                 max_performance: bool = False):
        """``max_performance`` mirrors the reference's MAX_PERFORMANCE_DIST
        (main_aux_functions.h:1): only minSadHad is assembled and
        FrameCosts.sad/satd are None — ~2x less cost-layout work."""
        if width % 4 or height % 4:
            raise ValueError("frame dimensions must be multiples of 4")
        self.width = width
        self.height = height
        self.n_ctus = num_ctus(width, height)[2]
        # Two compiled variants: the original-samples regime passes ONE
        # array for both roles (shared phase tensors), the
        # alternative-samples regime two.
        base = functools.partial(_compute, width=width, height=height,
                                 max_performance=max_performance)
        self._fn1 = jax.jit(lambda frame: base(frame, frame))
        self._fn = jax.jit(base)
        self._fnb1 = jax.jit(jax.vmap(lambda frame: base(frame, frame)))
        self._fnb = jax.jit(jax.vmap(base))

    def __call__(self, frame, ref_frame=None) -> FrameCosts:
        """frame: [H, W] integer luma samples (10-bit).  ref_frame: the
        boundary-sample source; defaults to ``frame`` (pass the low-pass
        filtered frame for the alternative-samples regime,
        reference: main.cpp:818-822)."""
        if ref_frame is None:
            return self._fn1(frame)
        return self._fn(frame, ref_frame)

    def compute_batch(self, frames, ref_frames=None) -> FrameCosts:
        """Batched search: [B, H, W] frames in ONE device dispatch (the
        per-call dispatch cost does not scale with B — the analog of the
        reference's BUFFER_SLOTS pipelined enqueue, main.cpp:886-898).
        FrameCosts fields gain a leading batch axis."""
        if ref_frames is None:
            return self._fnb1(frames)
        return self._fnb(frames, ref_frames)
