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


def test_rowband_filtered_interpret():
    """VVC_ROWBAND=1 in the alternative-samples regime: the boundary
    boxes must come from the FILTERED slab while og stays on the
    original frame (rowband_boxes' two phase-tensor families)."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce
    from vvc_mip_gpu_tpu.ops.filters import filter_frames

    frame = RNG.integers(0, 1024, size=(192, 128), dtype=np.int64)
    ref = np.asarray(filter_frames(
        frame[None].astype(np.int32),
        "filterFrame_2d_int_quarterCtu", 2))[0]
    old = (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND)
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    ce._ROWBAND = "1"
    try:
        got = MipCostEngine(128, 192, max_performance=True)(
            frame.astype(np.int32), ref.astype(np.int32))
    finally:
        (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND) = old
    exp = gm.frame_costs(frame, ref.astype(np.int64))
    valid = np.asarray(got.valid)
    e = gm.flatten_strided(exp, "min_sad_had")
    a = np.asarray(got.min_sad_had, np.int64)
    mism = (e != a) & valid
    assert not mism.any(), f"{mism.sum()} mismatches"


@pytest.mark.parametrize("max_performance", [True, False])
def test_rowband_lever_interpret(max_performance):
    """VVC_ROWBAND=1 (SizeId2 classes via the phase-space row-band
    kernel, ops/pallas/rowband.py) must be bit-exact through the engine
    in both emit regimes.  192 rows give a partial bottom CTU so the
    padded row bands and edge-replicated windows are exercised."""
    from vvc_mip_gpu_tpu.models import cost_engine as ce

    frame = RNG.integers(0, 1024, size=(192, 128), dtype=np.int64)
    old = (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND)
    ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET = True, True
    ce._ROWBAND = "1"
    try:
        got = MipCostEngine(128, 192, max_performance=max_performance)(
            frame.astype(np.int32))
    finally:
        (ce._PALLAS_OVERRIDE, ce._PALLAS_INTERPRET, ce._ROWBAND) = old
    exp = gm.frame_costs(frame, frame)
    valid = np.asarray(got.valid)
    fields = (("min_sad_had",) if max_performance
              else ("sad", "satd", "min_sad_had"))
    for field in fields:
        e = gm.flatten_strided(exp, field)
        a = np.asarray(getattr(got, field), np.int64)
        mism = (e != a) & valid
        assert not mism.any(), f"{field}: {mism.sum()} mismatches"


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
