"""The JAX cost engine must match the NumPy golden model bit-for-bit on
every valid CU — including frames with partial CTUs at the bottom and right
edges and the alternative-samples (distinct reference frame) regime."""

import numpy as np
import pytest

from vvc_mip_gpu_tpu.golden import reference_model as gm
from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

RNG = np.random.default_rng(11)


def _check(width, height, distinct_ref=False):
    frame = RNG.integers(0, 1024, size=(height, width), dtype=np.int64)
    ref = (RNG.integers(0, 1024, size=(height, width), dtype=np.int64)
           if distinct_ref else frame)
    engine = MipCostEngine(width, height)
    got = engine(frame.astype(np.int32), ref.astype(np.int32))
    exp = gm.frame_costs(frame, ref)
    valid = np.asarray(got.valid)
    for field in ("sad", "satd", "min_sad_had"):
        e = gm.flatten_strided(exp, field)
        a = np.asarray(getattr(got, field), np.int64)
        mism = (e != a) & valid
        assert not mism.any(), (
            f"{field}: {mism.sum()} mismatches at {np.argwhere(mism)[:5]}")
    # Validity mask must agree with the golden model's per-group masks.
    vexp = np.concatenate(
        [np.repeat(exp[g].valid, exp[g].sad.shape[-1], axis=1)
         for g in sorted(exp)], axis=1)
    np.testing.assert_array_equal(valid, vexp)


def test_aligned_2x2_ctus():
    _check(256, 256)


def test_partial_bottom_and_right():
    # 4.75 CTU cols x 1.5 CTU rows — exercises right and bottom partials
    _check(608, 192)


def test_alternative_samples_regime():
    _check(256, 128, distinct_ref=True)


def test_max_performance_min_sad_had_matches():
    # The reference MAX_PERFORMANCE_DIST analog: minSadHad must equal the
    # full path's; sad/satd are skipped entirely.
    frame = RNG.integers(0, 1024, size=(128, 256), dtype=np.int32)
    full = MipCostEngine(256, 128)(frame)
    fast = MipCostEngine(256, 128, max_performance=True)(frame)
    assert fast.sad is None and fast.satd is None
    np.testing.assert_array_equal(np.asarray(fast.min_sad_had),
                                  np.asarray(full.min_sad_had))


@pytest.mark.parametrize("max_performance", [True, False])
def test_pallas_engine_wiring_interpret(max_performance):
    """The engine-level Pallas branch (augmented-matrix construction,
    permutation folding, emit plumbing in _class_costs) vs the golden
    model, with the kernels in interpret mode — so this wiring is covered
    by the default CPU run, not only the tpu-marked tests."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    frame = RNG.integers(0, 1024, size=(128, 128), dtype=np.int64)
    old = ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    try:
        got = MipCostEngine(128, 128, max_performance=max_performance)(
            frame.astype(np.int32))
    finally:
        ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = old
    exp = gm.frame_costs(frame, frame)
    valid = np.asarray(got.valid)
    fields = (("min_sad_had",) if max_performance
              else ("sad", "satd", "min_sad_had"))
    for field in fields:
        e = gm.flatten_strided(exp, field)
        a = np.asarray(getattr(got, field), np.int64)
        mism = (e != a) & valid
        assert not mism.any(), (
            f"{field}: {mism.sum()} mismatches at {np.argwhere(mism)[:5]}")


@pytest.mark.parametrize("fetch", ["both", "left", "orig", "none"])
def test_fetch_lever_interpret(fetch):
    """Every VVC_FETCH lever setting must be bit-exact through the engine
    (interpret-mode kernels) — whichever wins the TPU A/B becomes the
    default, so all candidates need standing coverage."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    frame = RNG.integers(0, 1024, size=(128, 128), dtype=np.int64)
    old = (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._FETCH_MODE)
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    ce._FETCH_MODE = fetch
    try:
        got = MipCostEngine(128, 128, max_performance=True)(
            frame.astype(np.int32))
    finally:
        (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET,
         ce._FETCH_MODE) = old
    exp = gm.frame_costs(frame, frame)
    valid = np.asarray(got.valid)
    e = gm.flatten_strided(exp, "min_sad_had")
    a = np.asarray(got.min_sad_had, np.int64)
    mism = (e != a) & valid
    assert not mism.any(), (
        f"fetch={fetch}: {mism.sum()} mismatches")


def _assert_rowband_routed(routed_log):
    """The 128-wide test geometry pads every lattice to 128 lanes, so the
    production fill gate would route NOTHING and the rowband tests would
    pass vacuously (VERDICT r4 weak #1: exactly that happened when the
    gate landed after the tests).  The tests lower the gate; this asserts
    the override worked — both kernel families actually computed groups."""
    covered = {cls: idx for cls, idx in routed_log if idx}
    assert covered, f"rowband routed nothing: {routed_log}"
    sid2 = [c for c in covered if min(
        int(c.split("x")[0]), int(c.split("x")[1])) >= 8
        and c not in ("8x8", "8x4", "4x8")]
    mm = [c for c in covered if c in ("8x8", "8x4", "4x8", "4x4")]
    assert sid2, f"no SizeId2 class routed rowband_distortion: {covered}"
    assert mm, f"no SizeId0/1 class routed rowband_distortion_mm: {covered}"


def test_rowband_filtered_interpret():
    """VVC_ROWBAND=1 in the alternative-samples regime: the boundary
    boxes must come from the FILTERED slab while og stays on the
    original frame (rowband_boxes' two phase-tensor families).  The fill
    gate is lowered so the small geometry actually routes the kernels
    (asserted via _RB_ROUTED_LOG)."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce
    from vvc_mip_gpu_tpu.ops.filters import filter_frames

    frame = RNG.integers(0, 1024, size=(192, 128), dtype=np.int64)
    ref = np.asarray(filter_frames(
        frame[None].astype(np.int32),
        "filterFrame_2d_int_quarterCtu", 2))[0]
    old = (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND,
           ce._RB_MIN_FILL, ce._RB_ROUTED_LOG)
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    ce._ROWBAND = "1"
    ce._RB_MIN_FILL = 0.0
    ce._RB_ROUTED_LOG = routed = []
    try:
        got = MipCostEngine(128, 192, max_performance=True)(
            frame.astype(np.int32), ref.astype(np.int32))
    finally:
        (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND,
         ce._RB_MIN_FILL, ce._RB_ROUTED_LOG) = old
    _assert_rowband_routed(routed)
    exp = gm.frame_costs(frame, ref.astype(np.int64))
    valid = np.asarray(got.valid)
    e = gm.flatten_strided(exp, "min_sad_had")
    a = np.asarray(got.min_sad_had, np.int64)
    mism = (e != a) & valid
    assert not mism.any(), f"{mism.sum()} mismatches"


@pytest.mark.parametrize("max_performance", [True, False])
def test_rowband_lever_interpret(max_performance):
    """VVC_ROWBAND=1 (default class set via the phase-space row-band
    kernels, ops/pallas/rowband.py) must be bit-exact through the engine
    in both emit regimes.  192 rows give a partial bottom CTU so the
    padded row bands and edge-replicated windows are exercised.  The
    fill gate is lowered so the small geometry actually routes both
    rowband_distortion (SizeId2) and rowband_distortion_mm (SizeId1)
    — asserted non-vacuous via _RB_ROUTED_LOG."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    frame = RNG.integers(0, 1024, size=(192, 128), dtype=np.int64)
    old = (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND,
           ce._RB_MIN_FILL, ce._RB_ROUTED_LOG)
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    ce._ROWBAND = "1"
    ce._RB_MIN_FILL = 0.0
    ce._RB_ROUTED_LOG = routed = []
    try:
        got = MipCostEngine(128, 192, max_performance=max_performance)(
            frame.astype(np.int32))
    finally:
        (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND,
         ce._RB_MIN_FILL, ce._RB_ROUTED_LOG) = old
    _assert_rowband_routed(routed)
    exp = gm.frame_costs(frame, frame)
    valid = np.asarray(got.valid)
    fields = (("min_sad_had",) if max_performance
              else ("sad", "satd", "min_sad_had"))
    for field in fields:
        e = gm.flatten_strided(exp, field)
        a = np.asarray(getattr(got, field), np.int64)
        mism = (e != a) & valid
        assert not mism.any(), f"{field}: {mism.sum()} mismatches"


def test_rowband_k16_lever_interpret():
    """VVC_RB_K=16 (double band height) must stay bit-exact — the band
    padding (n_r=12 rows at 192 height pads to 16) and the gate's
    k-aware VMEM bound (fixed r5: the r4 gate hardcoded k=8) both ride
    this lever."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    frame = RNG.integers(0, 1024, size=(192, 128), dtype=np.int64)
    old = (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND,
           ce._RB_MIN_FILL, ce._RB_ROUTED_LOG, ce._RB_K)
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    ce._ROWBAND = "1"
    ce._RB_MIN_FILL = 0.0
    ce._RB_K = 16
    ce._RB_ROUTED_LOG = routed = []
    try:
        got = MipCostEngine(128, 192, max_performance=True)(
            frame.astype(np.int32))
    finally:
        (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND,
         ce._RB_MIN_FILL, ce._RB_ROUTED_LOG, ce._RB_K) = old
    _assert_rowband_routed(routed)
    exp = gm.frame_costs(frame, frame)
    valid = np.asarray(got.valid)
    e = gm.flatten_strided(exp, "min_sad_had")
    a = np.asarray(got.min_sad_had, np.int64)
    mism = (e != a) & valid
    assert not mism.any(), f"{mism.sum()} mismatches"


def test_rowband_pack_lever_interpret():
    """VVC_RB_PACK=1 (lane-packing of coarse-stride lattices): with the
    fill bar set between 1x and 2x fill at this geometry, the gate must
    route pack factors 1, 2 AND 4 simultaneously (n_c=16/8/4 lattices at
    128-wide frames) and stay bit-exact — the packed-lane kernel runs,
    and the XLA unpack restores lattice order."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    frame = RNG.integers(0, 1024, size=(192, 128), dtype=np.int64)
    old = (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND,
           ce._RB_MIN_FILL, ce._RB_ROUTED_LOG, ce._RB_PACK)
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    ce._ROWBAND = "1"
    ce._RB_MIN_FILL = 0.12   # n_c=16 passes at p=1; 8 needs p=2; 4 p=4
    ce._RB_PACK = "1"
    ce._RB_ROUTED_LOG = routed = []
    try:
        # Verify the gate really hands out all three pack factors here.
        from vvc_mip_gpu_tpu.ops.geometry import class_plans

        packs = set()
        for cplan in class_plans(128, 192):
            cw, chh = cplan.shape.width, cplan.shape.height
            if f"{cw}x{chh}" not in ce._RB_DEFAULT_CLASSES.split(","):
                continue
            for gp in cplan.groups:
                if ce._group_stride(gp) is not None:
                    p = ce._rb_pack_factor(gp, cw, chh)
                    if p:
                        packs.add(p)
        assert {1, 2, 4} <= packs, f"pack factors exercised: {packs}"
        got = MipCostEngine(128, 192, max_performance=True)(
            frame.astype(np.int32))
    finally:
        (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND,
         ce._RB_MIN_FILL, ce._RB_ROUTED_LOG, ce._RB_PACK) = old
    _assert_rowband_routed(routed)
    exp = gm.frame_costs(frame, frame)
    valid = np.asarray(got.valid)
    e = gm.flatten_strided(exp, "min_sad_had")
    a = np.asarray(got.min_sad_had, np.int64)
    mism = (e != a) & valid
    assert not mism.any(), f"{mism.sum()} mismatches"


def test_rowband_lane_tiling():
    """Over-budget og boxes must LANE-TILE (grid over 128-lane tiles of
    the column axis at full k) rather than shrink the band height below
    8 — Mosaic's block-mapping rule requires the reft block's sublane
    dim (k) to be a multiple of 8, which the first r5 band-shrink fix
    violated (evidence/tpu_batch_r5.log, 4K smoke failure: interpret
    mode does not check block rules, so only hardware lowering saw it).

    Checks the _rb_tiling policy here; the kernel-level cl<C grid
    equivalence lives in test_pallas_distortion.py
    (test_rowband_kernel_lane_tiling)."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    old_budget = ce._RB_VMEM_BUDGET
    try:
        ce._RB_VMEM_BUDGET = 256 << 10
        # 16x8 @128 lanes: box 256KB at (k=8, cl=128) — fits as-is.
        assert ce._rb_tiling(16, 8, 128) == (8, 128)
        # 16x8 @256 lanes: 512KB at cl=256 -> lane-tiles to cl=128.
        assert ce._rb_tiling(16, 8, 256) == (8, 128)
        # 16x16 @128: 512KB even at cl=128, k=8 -> ineligible (k may
        # NOT shrink below 8; the gate must reject, not OOM Mosaic).
        assert ce._rb_tiling(16, 16, 128) is None
    finally:
        ce._RB_VMEM_BUDGET = old_budget
    # Production default budget admits the 4K shapes via lane tiling.
    assert ce._rb_tiling(16, 32, 256) == (8, 128)
    # The scoped estimator must catch the predv-dominated OOM the box
    # proxy missed (4K 8x16 @512 lanes: box 1MB but scoped 17.15M on
    # hardware — evidence/tpu_batch_r5.log part-B 4K re-run).
    assert ce._rb_scoped_est(8, 16, 8, 512) > ce._RB_SCOPED_LIMIT
    assert ce._rb_tiling(8, 16, 512) == (8, 256)
    # VVC_RB_K values that are not multiples of 8 must round down to a
    # legal band height, never reach _band_grid's legality assert
    # (e.g. K=24 halving to 12 would be an illegal sublane block).
    old_k = ce._RB_K
    try:
        for bad_k in (12, 24, 9):
            ce._RB_K = bad_k
            for (w, h, cp) in ((16, 16, 128), (16, 32, 256),
                               (8, 16, 512)):
                t = ce._rb_tiling(w, h, cp)
                assert t is not None and t[0] % 8 == 0, (bad_k, w, h, t)
    finally:
        ce._RB_K = old_k


@pytest.mark.parametrize("res", [(1920, 1080), (3840, 2160)])
@pytest.mark.parametrize("k", [8, 16])
def test_rowband_gate_respects_vmem_budget(res, k):
    """Every group the routing gate admits at production geometry must
    run at a band height whose og box fits the scoped-VMEM budget, for
    the default class set and 'all', across the VVC_RB_K lever and both
    pack settings.  Pins the r5 fixes for two Mosaic stack-OOM escapes:
    the r4 k=8-hardcoded gate (evidence/tpu_tune_r4e_fail1.log) and the
    4K 256-lane partition that sailed through the 2MB box proxy at ~10x
    actual scoped usage (evidence/tpu_batch_r5.log, first 4K run)."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce
    from vvc_mip_gpu_tpu.ops.geometry import class_plans

    w_f, h_f = res
    old = ce._RB_K, ce._RB_PACK
    ce._RB_K = k
    admitted = 0
    try:
        for pack_lever in ("0", "1"):
            ce._RB_PACK = pack_lever
            for cplan in class_plans(w_f, h_f):
                w, h = cplan.shape.width, cplan.shape.height
                for gp in cplan.groups:
                    if ce._group_stride(gp) is None:
                        continue
                    p = ce._rb_pack_factor(gp, w, h)
                    if p is None:
                        continue
                    admitted += 1
                    c_pad = -(-(p * gp.n_cols) // 128) * 128
                    tiling = ce._rb_tiling(w, h, c_pad)
                    assert tiling is not None, (
                        f"{w}x{h} group {gp.group_index}: admitted "
                        "but no legal tiling fits")
                    kk, cl = tiling
                    # Mosaic block-mapping legality (interpret mode
                    # does not check these — the r5 band-shrink escape)
                    assert kk % 8 == 0, (w, h, kk)
                    assert cl % 128 == 0 and c_pad % cl == 0, (
                        w, h, cl, c_pad)
                    box_bytes = w * kk * h * cl * 2
                    assert box_bytes <= ce._RB_VMEM_BUDGET, (
                        f"{w}x{h} group {gp.group_index} k={kk} "
                        f"cl={cl} p={p}: og box {box_bytes}B exceeds "
                        "budget")
                    est = ce._rb_scoped_est(w, h, kk, cl)
                    assert est <= ce._RB_SCOPED_LIMIT, (
                        f"{w}x{h} k={kk} cl={cl}: scoped est {est}B "
                        "exceeds limit")
    finally:
        ce._RB_K, ce._RB_PACK = old
    assert admitted, "gate admitted no groups at production geometry"


@pytest.mark.slow
def test_416x240():
    _check(416, 240)


@pytest.mark.slow
def test_1080p_full_scale():
    """Full-resolution 1080p engine-vs-golden (VERDICT r1: no 1080p frame
    had ever been validated end-to-end; reference workloads are 1080p,
    powerTracer_NVIDIA.py:33-80)."""
    _check(1920, 1080)


@pytest.mark.slow
def test_4k_full_scale():
    """3840x2160 engine-vs-golden, one frame (reference 4K workloads:
    powerTracer_NVIDIA.py:33-80)."""
    _check(3840, 2160)


def test_compute_batch_matches_single():
    """The batched (vmapped) engine dispatch must be bit-identical to the
    per-frame path — the CLI's production dispatch (--BatchFrames)."""
    import jax.numpy as jnp

    from vvc_mip_gpu_tpu.io import frames as fio
    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

    w, h = 256, 192
    frames = fio.synthetic_frames(3, w, h).astype(np.int32)
    engine = MipCostEngine(w, h, max_performance=True)
    batched = engine.compute_batch(jnp.asarray(frames))
    for f in range(3):
        single = engine(frames[f])
        np.testing.assert_array_equal(
            np.asarray(batched.min_sad_had[f]),
            np.asarray(single.min_sad_had))


def test_compute_batch_pallas_interpret():
    """Pallas kernels UNDER vmap (batched grid dims, fetch_rows DMA and
    CTU-direct output scatter included) — the TPU bench/CLI dispatch
    shape — must match the per-frame interpret path bit-for-bit."""
    import jax.numpy as jnp

    from vvc_mip_gpu_tpu.io import frames as fio
    from vvc_mip_gpu_tpu.models import cost_engine as ce
    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

    w, h = 128, 128
    frames = fio.synthetic_frames(2, w, h).astype(np.int32)
    old = ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    try:
        engine = MipCostEngine(w, h, max_performance=True)
        batched = engine.compute_batch(jnp.asarray(frames))
        singles = [engine(frames[f]) for f in range(2)]
    finally:
        ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = old
    for f in range(2):
        np.testing.assert_array_equal(
            np.asarray(batched.min_sad_had[f]),
            np.asarray(singles[f].min_sad_had))


def test_sid0_limbs_lever_interpret():
    """VVC_SID0_LIMBS=xla (4x4-class limb stack precomputed in one wide
    XLA pass instead of per grid step in-kernel) must be bit-exact —
    A/B candidate for the 4x4 class's gap to its roofline floor."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    frame = RNG.integers(0, 1024, size=(192, 128), dtype=np.int64)
    old = (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._SID0_LIMBS)
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    ce._SID0_LIMBS = "xla"
    try:
        got = MipCostEngine(128, 192, max_performance=True)(
            frame.astype(np.int32))
    finally:
        (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET,
         ce._SID0_LIMBS) = old
    exp = gm.frame_costs(frame, frame)
    valid = np.asarray(got.valid)
    e = gm.flatten_strided(exp, "min_sad_had")
    a = np.asarray(got.min_sad_had, np.int64)
    mism = (e != a) & valid
    assert not mism.any(), (
        f"sid0_limbs=xla: {mism.sum()} mismatches")


def test_sid1_limbs_lever_interpret():
    """VVC_SID1_LIMBS=xla (mode-minor classes' limb stack precomputed in
    XLA, including the %4 ref_t un-permute) must be bit-exact."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    frame = RNG.integers(0, 1024, size=(192, 128), dtype=np.int64)
    old = (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._SID1_LIMBS)
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    ce._SID1_LIMBS = "xla"
    try:
        got = MipCostEngine(128, 192, max_performance=True)(
            frame.astype(np.int32))
    finally:
        (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._SID1_LIMBS) = old
    exp = gm.frame_costs(frame, frame)
    valid = np.asarray(got.valid)
    e = gm.flatten_strided(exp, "min_sad_had")
    a = np.asarray(got.min_sad_had, np.int64)
    mism = (e != a) & valid
    assert not mism.any(), f"sid1_limbs=xla: {mism.sum()} mismatches"
