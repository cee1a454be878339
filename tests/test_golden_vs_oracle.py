"""Cross-check the vectorized NumPy golden model against the pure-Python
scalar oracle on randomly sampled CUs from every size group."""

import numpy as np
import pytest

from vvc_mip_gpu_tpu.constants import GROUPS, num_ctus
from vvc_mip_gpu_tpu.golden import reference_model as gm
from vvc_mip_gpu_tpu.golden import scalar_oracle as so

W, H = 256, 256  # 2x2 CTUs, fully aligned so every CU is valid
RNG = np.random.default_rng(7)
FRAME = RNG.integers(0, 1024, size=(H, W), dtype=np.int64)
REF = RNG.integers(0, 1024, size=(H, W), dtype=np.int64)  # distinct ref frame


@pytest.fixture(scope="module")
def costs():
    return gm.frame_costs(FRAME, REF)


@pytest.mark.parametrize("group_idx", range(len(GROUPS)))
def test_group_vs_oracle(costs, group_idx):
    g = GROUPS[group_idx]
    gc = costs[group_idx]
    _, _, n_ctu = num_ctus(W, H)
    assert gc.sad.shape == (n_ctu, g.cus_per_ctu, g.total_modes)
    assert gc.valid.all()
    rng = np.random.default_rng(group_idx)
    for _ in range(3):
        ctu = int(rng.integers(n_ctu))
        cu = int(rng.integers(g.cus_per_ctu))
        mode = int(rng.integers(g.total_modes))
        xs, ys = gm.global_positions(group_idx, W, H)
        sad, satd, msh = so.cu_cost(
            FRAME, REF, int(xs[ctu, cu]), int(ys[ctu, cu]),
            g.width, g.height, g.size_id, mode)
        assert gc.sad[ctu, cu, mode] == sad, (ctu, cu, mode)
        assert gc.satd[ctu, cu, mode] == satd, (ctu, cu, mode)
        assert gc.min_sad_had[ctu, cu, mode] == msh


def test_edge_padding_rules():
    """Top-left corner CU uses DC boundaries; top edge uses left-sample
    padding; left edge uses top-sample padding."""
    assert so.top_boundary(FRAME, 0, 0, 8) == [512] * 8
    assert so.left_boundary(FRAME, 0, 0, 8) == [512] * 8
    assert so.top_boundary(FRAME, 64, 0, 8) == [int(FRAME[0, 63])] * 8
    assert so.left_boundary(FRAME, 0, 64, 8) == [int(FRAME[63, 0])] * 8
    rt, rl = gm.extract_boundaries(FRAME, np.array([0, 64, 0]),
                                   np.array([0, 0, 64]), 8, 8)
    np.testing.assert_array_equal(rt[0], [512] * 8)
    np.testing.assert_array_equal(rt[1], [int(FRAME[0, 63])] * 8)
    np.testing.assert_array_equal(rl[2], [int(FRAME[63, 0])] * 8)


def test_satd_known_values():
    # All-zero difference -> zero SATD
    z = [[0] * 4] * 4
    assert so.satd_4x4(z, z) == 0
    # Uniform difference of 1: only the DC coefficient (=16) is nonzero:
    # satd = (16 - 16 + (16>>2) + 1) >> 1 = 2
    one = [[1] * 4] * 4
    assert so.satd_4x4(one, z) == 2
    # Single-pixel difference d: |t| = d at all 16 coefficients
    imp = [[5 if (i, j) == (0, 0) else 0 for j in range(4)] for i in range(4)]
    # satd = (16*5 - 5 + (5>>2) + 1) >> 1 = (75 + 1 + 1) >> 1 = 38
    assert so.satd_4x4(imp, z) == 38


def test_strided_flatten(costs):
    flat = gm.flatten_strided(costs, "min_sad_had")
    assert flat.shape == (4, 97840)
    g = GROUPS[6]  # AL_16x16
    from vvc_mip_gpu_tpu.constants import STRIDED_DISTORTIONS_PER_CTU as SD
    start = int(SD[6])
    np.testing.assert_array_equal(
        flat[2, start:start + g.total_modes],
        costs[6].min_sad_had[2, 0])
