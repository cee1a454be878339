"""The fused Pallas upsample+distortion kernel must match the XLA SoA path
bit-for-bit (interpret mode on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
from vvc_mip_gpu_tpu.ops.pallas.distortion import upsample_distortion

RNG = np.random.default_rng(5)

# The COMPLETE shape-class matrix: every (h, w) the engine dispatches —
# all 9 SizeId2 classes (grouped %4 kernel), all 7 SizeId1 classes
# (mode-on-sublanes kernel), and SizeId0 — so a kernel-layout regression
# in any class surfaces here on CPU, not only in the TPU e2e tests.
ALL_CLASSES = [
    # SizeId2 (r=8, 2M=12): (h, w) covering every up_h x up_v combination
    (64, 64, 8, 12), (32, 32, 8, 12),
    (16, 32, 8, 12), (32, 16, 8, 12),
    (8, 32, 8, 12), (32, 8, 8, 12),
    (16, 16, 8, 12), (8, 16, 8, 12), (16, 8, 8, 12),
    # SizeId1 (r=4, 2M=16)
    (4, 32, 4, 16), (32, 4, 4, 16),
    (4, 16, 4, 16), (16, 4, 4, 16),
    (8, 8, 4, 16), (4, 8, 4, 16), (8, 4, 4, 16),
    # SizeId0
    (4, 4, 4, 32),
]


@pytest.mark.parametrize("h,w,r,two_m", ALL_CLASSES)
def test_pallas_matches_soa(h, w, r, two_m):
    n = 256
    pred = jnp.asarray(
        RNG.integers(0, 1024, (two_m, r * r, n)), jnp.int16)
    orig = jnp.asarray(RNG.integers(0, 1024, (h * w, n)), jnp.int32)
    ref_t = jnp.asarray(RNG.integers(0, 1024, (w, n)), jnp.int32)
    ref_l = jnp.asarray(RNG.integers(0, 1024, (h, n)), jnp.int32)

    if (h, w) == (4, 4):
        exp_pred = pred
    else:
        exp_pred = soa.upsample_all(pred, ref_t, ref_l, w, h, r)
    exp_sad, exp_satd = soa.distortion(orig, exp_pred, h, w)

    up_v = h // r
    got_sad, got_satd = upsample_distortion(
        pred, orig.astype(jnp.int16), ref_t.astype(jnp.int16),
        ref_l[up_v - 1::up_v].astype(jnp.int16),
        h=h, w=w, r=r, cu_tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_sad), np.asarray(exp_sad))
    np.testing.assert_array_equal(np.asarray(got_satd), np.asarray(exp_satd))

    # max-performance single-output regime: mode-minor min(2*SAD, SATD)
    got_msh = upsample_distortion(
        pred, orig.astype(jnp.int16), ref_t.astype(jnp.int16),
        ref_l[up_v - 1::up_v].astype(jnp.int16),
        h=h, w=w, r=r, cu_tile=128, interpret=True, emit="msh_t")
    exp_msh = np.minimum(2 * np.asarray(exp_sad), np.asarray(exp_satd)).T
    np.testing.assert_array_equal(np.asarray(got_msh), exp_msh)

    # full-report regime with mode-minor (transposed) outputs
    got_sad_t, got_satd_t = upsample_distortion(
        pred, orig.astype(jnp.int16), ref_t.astype(jnp.int16),
        ref_l[up_v - 1::up_v].astype(jnp.int16),
        h=h, w=w, r=r, cu_tile=128, interpret=True, emit="sad_satd_t")
    np.testing.assert_array_equal(np.asarray(got_sad_t),
                                  np.asarray(exp_sad).T)
    np.testing.assert_array_equal(np.asarray(got_satd_t),
                                  np.asarray(exp_satd).T)


@pytest.mark.parametrize("h,w,r,two_m", ALL_CLASSES)
@pytest.mark.parametrize("emit", ["msh_t", "sad_satd_t"])
def test_fused_pred_matches_soa(h, w, r, two_m, emit):
    """The in-kernel prediction matmul (mat/limbs inputs, pred=None) must
    reproduce the SoA pred -> upsample -> distortion chain bit-for-bit."""
    from vvc_mip_gpu_tpu.ops.pallas import pred as pallas_pred
    from vvc_mip_gpu_tpu.ops.pallas.distortion import input_perms

    size_id = 0 if (h == 4 and w == 4) else (1 if r == 4 else 2)
    mode_minor = r == 4 and size_id != 0
    bs = 2 if size_id == 0 else 4
    n = 300
    orig = jnp.asarray(RNG.integers(0, 1024, (h * w, n)), jnp.int32)
    ref_t = jnp.asarray(RNG.integers(0, 1024, (w, n)), jnp.int32)
    ref_l = jnp.asarray(RNG.integers(0, 1024, (h, n)), jnp.int32)
    # SizeId0/1 fused kernels reduce the boundaries in-kernel, so the
    # reference prediction must use the same reductions.
    red_t = soa.reduce_boundary(ref_t, bs)
    red_l = soa.reduce_boundary(ref_l, bs)

    pred = soa.reduced_prediction_all_modes(red_t, red_l, size_id)
    if size_id == 0:
        up = pred
    else:
        up = soa.upsample_all(pred, ref_t, ref_l, w, h, r)
    exp_sad, exp_satd = soa.distortion(orig, up, h, w)
    exp_msh = np.minimum(2 * np.asarray(exp_sad), np.asarray(exp_satd))

    sample_perm = (tuple(int(v) for v in input_perms(h, w, r)[0])
                   if size_id == 2 else None)
    mat = jnp.asarray(pallas_pred._augmented_matrix(
        size_id, sample_perm, mode_minor or size_id == 0))
    outs = upsample_distortion(
        None, orig.astype(jnp.int16), ref_t.astype(jnp.int16),
        ref_l.astype(jnp.int16),
        h=h, w=w, r=r, cu_tile=128, interpret=True, emit=emit,
        mat=mat, two_m=two_m)
    if emit == "msh_t":
        np.testing.assert_array_equal(np.asarray(outs), exp_msh.T)
    else:
        np.testing.assert_array_equal(np.asarray(outs[0]),
                                      np.asarray(exp_sad).T)
        np.testing.assert_array_equal(np.asarray(outs[1]),
                                      np.asarray(exp_satd).T)


