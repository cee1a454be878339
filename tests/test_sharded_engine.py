"""The sharded (data x space) engine must be bit-identical to the
single-device engine on every valid CU, across shard counts and with
partial CTUs at the frame bottom (halo-exchange correctness)."""

import numpy as np
import pytest

import jax

from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine
from vvc_mip_gpu_tpu.parallel import ShardedMipCostEngine, make_mesh

W, H = 256, 200  # partial bottom CTU row: exercises padding + validity
B = 2
RNG = np.random.default_rng(3)
FRAMES = RNG.integers(0, 1024, size=(B, H, W), dtype=np.int32)


@pytest.fixture(scope="module")
def single_costs():
    eng = MipCostEngine(W, H)
    return [eng(f) for f in FRAMES]


# Each distinct mesh shape costs a full engine compile on the virtual
# 8-device CPU mesh (minutes); the default gate keeps the production
# (data x space) layout as smoke and tiers the rest as `heavy`.
@pytest.mark.parametrize("n_data,n_space", [
    (2, 2),
    pytest.param(1, 4, marks=pytest.mark.heavy),
    pytest.param(2, 1, marks=pytest.mark.heavy),
])
def test_sharded_matches_single(single_costs, n_data, n_space):
    if jax.device_count() < n_data * n_space:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_data, n_space)
    eng = ShardedMipCostEngine(W, H, mesh)
    got = eng(FRAMES)
    n_true_ctus = single_costs[0].sad.shape[0]
    for b in range(B):
        ref = single_costs[b]
        valid = np.asarray(ref.valid)
        for field in ("sad", "satd", "min_sad_had"):
            e = np.asarray(getattr(ref, field))
            a = np.asarray(getattr(got, field))[b, :n_true_ctus]
            mism = (e != a) & valid
            assert not mism.any(), (
                f"{field} b={b} space={n_space}: {mism.sum()} mismatches")
        # Sharded validity must imply single-device validity on true CTUs.
        sv = np.asarray(got.valid)[:n_true_ctus]
        np.testing.assert_array_equal(sv, valid)


@pytest.mark.heavy
def test_sharded_max_performance(single_costs):
    if jax.device_count() < 4:
        pytest.skip("not enough devices")
    mesh = make_mesh(2, 2)
    eng = ShardedMipCostEngine(W, H, mesh, max_performance=True)
    got = eng(FRAMES)
    assert got.sad is None and got.satd is None
    n_true_ctus = single_costs[0].min_sad_had.shape[0]
    for b in range(B):
        ref = single_costs[b]
        valid = np.asarray(ref.valid)
        a = np.asarray(got.min_sad_had)[b, :n_true_ctus]
        mism = (np.asarray(ref.min_sad_had) != a) & valid
        assert not mism.any()
