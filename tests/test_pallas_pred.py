"""The fused Pallas prediction kernel must match the XLA SoA path
bit-for-bit (interpret mode on CPU; the same kernel runs compiled on TPU,
where tests/test_tpu_bit_exact.py covers the end-to-end pipeline)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vvc_mip_gpu_tpu.ops import mip_ops_soa as soa
from vvc_mip_gpu_tpu.ops.pallas import pred as pallas_pred

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("size_id,bnd", [(0, 2), (1, 4), (2, 4)])
@pytest.mark.parametrize("mode_minor", [False, True])
def test_matches_soa(size_id, bnd, mode_minor):
    n = 700  # deliberately not a tile multiple
    tile = 512
    red_t = jnp.asarray(RNG.integers(0, 1024, (bnd, n)), jnp.int32)
    red_l = jnp.asarray(RNG.integers(0, 1024, (bnd, n)), jnp.int32)
    exp = soa.reduced_prediction_all_modes(
        red_t, red_l, size_id, mode_minor=mode_minor)
    got = pallas_pred.reduced_prediction(
        red_t, red_l, size_id, mode_minor=mode_minor, cu_tile=tile,
        interpret=True)
    assert got.shape[-1] == 1024  # tile-padded
    np.testing.assert_array_equal(np.asarray(got[..., :n]), np.asarray(exp))


def test_sample_perm_baked():
    n = 512
    red_t = jnp.asarray(RNG.integers(0, 1024, (4, n)), jnp.int32)
    red_l = jnp.asarray(RNG.integers(0, 1024, (4, n)), jnp.int32)
    perm = tuple(int(v) for v in RNG.permutation(16))
    exp = soa.reduced_prediction_all_modes(red_t, red_l, 1,
                                           sample_perm=perm)
    got = pallas_pred.reduced_prediction(red_t, red_l, 1, sample_perm=perm,
                                         cu_tile=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_distortion_accepts_padded_pred():
    """The padded pred CU axis flows into the distortion kernel unpadded
    inputs (the engine's no-repad path)."""
    from vvc_mip_gpu_tpu.ops.pallas.distortion import upsample_distortion

    h = w = 8
    r = 4
    n, tile = 300, 128
    red_t = jnp.asarray(RNG.integers(0, 1024, (4, n)), jnp.int32)
    red_l = jnp.asarray(RNG.integers(0, 1024, (4, n)), jnp.int32)
    orig = jnp.asarray(RNG.integers(0, 1024, (h * w, n)), jnp.int32)
    ref_t = jnp.asarray(RNG.integers(0, 1024, (w, n)), jnp.int32)
    ref_l = jnp.asarray(RNG.integers(0, 1024, (h, n)), jnp.int32)

    pred = soa.reduced_prediction_all_modes(red_t, red_l, 1)
    exp_sad, exp_satd = soa.distortion(
        orig, soa.upsample_all(pred, ref_t, ref_l, w, h, r), h, w)

    pred_pad = pallas_pred.reduced_prediction(
        red_t, red_l, 1, cu_tile=tile, interpret=True)
    up_v = h // r
    sad, satd = upsample_distortion(
        pred_pad, orig.astype(jnp.int16), ref_t.astype(jnp.int16),
        ref_l[up_v - 1::up_v].astype(jnp.int16), h=h, w=w, r=r,
        cu_tile=tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(sad), np.asarray(exp_sad))
    np.testing.assert_array_equal(np.asarray(satd), np.asarray(exp_satd))
