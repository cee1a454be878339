"""Verify the generated geometry tables against the reference engine.

Each test cross-checks one generated table in ``vvc_mip_gpu_tpu.constants``
against the corresponding hand-maintained table parsed out of the reference
mount's constants.h (reference: constants.h:572-1632).  Skipped when the
reference mount is absent (the generated tables are self-contained).
"""

import numpy as np
import pytest

from vvc_mip_gpu_tpu import constants as C

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import parse_reference_tables as ref  # noqa: E402

pytestmark = pytest.mark.skipif(
    not ref.reference_available(), reason="reference mount not available")


@pytest.fixture(scope="module")
def src():
    return ref.load_constants_h()


def test_widths_heights(src):
    widths = ref.extract_array("ALL_widths", src)
    heights = ref.extract_array("ALL_heights", src)
    assert [g.width for g in C.GROUPS] == widths
    assert [g.height for g in C.GROUPS] == heights


def test_cu_counts(src):
    cus = ref.extract_array("ALL_cusPerCtu", src)
    cols = ref.extract_array("ALL_cuColumnsPerCtu", src)
    rows = ref.extract_array("ALL_cuRowsPerCtu", src)
    assert [g.cus_per_ctu for g in C.GROUPS] == cus
    assert [g.cu_columns for g in C.GROUPS] == cols
    assert [g.cu_rows for g in C.GROUPS] == rows
    assert C.TOTAL_CUS_PER_CTU == 5380
    assert C.TOTAL_CUS_SIZEID12_PER_CTU == 4356
    assert C.TOTAL_CUS_SIZEID0_PER_CTU == 1024


def test_size_attributes(src):
    size_ids = ref.extract_array("ALL_sizeIds", src)  # only 46 entries
    red_bnd = ref.extract_array("ALL_reducedBoundarySizes", src)
    red_pred = ref.extract_array("ALL_reducedPredSizes", src)
    modes = ref.extract_array("ALL_numPredModes", src)
    assert [g.size_id for g in C.GROUPS[:46]] == size_ids
    assert [g.boundary_size for g in C.GROUPS] == red_bnd
    assert [g.reduced_pred_size for g in C.GROUPS] == red_pred
    assert [g.num_modes for g in C.GROUPS] == modes


def test_positions(src):
    xpos = ref.extract_array("ALL_X_POS", src)
    ypos = ref.extract_array("ALL_Y_POS", src)
    for g in C.GROUPS:
        pos = g.positions()
        if g.index == 46:
            # 4x4 positions are computed arithmetically by the reference
            # (intra.cl:86-90) rather than stored.
            exp = np.stack([4 * (np.arange(1024) % 32),
                            4 * (np.arange(1024) // 32)], axis=1)
            np.testing.assert_array_equal(pos, exp)
            continue
        n = g.cus_per_ctu
        np.testing.assert_array_equal(pos[:, 0], xpos[g.index][:n], err_msg=g.name)
        np.testing.assert_array_equal(pos[:, 1], ypos[g.index][:n], err_msg=g.name)


def test_strided_layouts(src):
    np.testing.assert_array_equal(
        C.STRIDED_CUS_PER_CTU[:-1],
        ref.extract_array("ALL_stridedCusPerCtu", src)[:47])
    np.testing.assert_array_equal(
        C.STRIDED_TOP_BOUNDARIES,
        ref.extract_array("ALL_stridedCompleteTopBoundaries", src))
    np.testing.assert_array_equal(
        C.STRIDED_LEFT_BOUNDARIES,
        ref.extract_array("ALL_stridedCompleteLeftBoundaries", src))
    np.testing.assert_array_equal(
        C.STRIDED_PREDICTIONS_PER_CTU,
        ref.extract_array("ALL_stridedPredictionsPerCtu", src))
    np.testing.assert_array_equal(
        C.STRIDED_DISTORTIONS_PER_CTU,
        ref.extract_array("ALL_stridedDistortionsPerCtu", src))
    assert C.STRIDED_TOP_BOUNDARIES[-1] == 48640
    assert C.STRIDED_LEFT_BOUNDARIES[-1] == 48640
    assert C.STRIDED_PREDICTIONS_PER_CTU[-1] == 2231296
    assert C.STRIDED_DISTORTIONS_PER_CTU[-1] == 97840
    assert C.REDUCED_BOUNDARY_TOTAL_PER_CTU == 4356 * 4 + 1024 * 2


def test_filter_kernels(src):
    np.testing.assert_array_equal(
        C.CONV_KERNELS_3x3, ref.extract_array("convKernelLib", src))
    np.testing.assert_array_equal(
        C.CONV_KERNELS_5x5, ref.extract_array("convKernelLib_5x5", src))
    np.testing.assert_allclose(
        C.CONV_KERNELS_3x3_FLOAT,
        ref.extract_array("convKernelLib_float", src), rtol=0, atol=0)
    np.testing.assert_allclose(
        C.CONV_KERNELS_5x5_FLOAT,
        ref.extract_array("convKernelLib_5x5_float", src), rtol=0, atol=0)


def test_shape_classes_cover_all_groups():
    classes = C.shape_classes()
    seen = [g for cl in classes for g in cl.group_indices]
    assert sorted(seen) == list(range(47))
    assert len(classes) == 17
    for cl in classes:
        assert cl.cus_per_ctu == sum(
            C.GROUPS[g].cus_per_ctu for g in cl.group_indices)
        for g in cl.group_indices:
            assert (C.GROUPS[g].width, C.GROUPS[g].height) == (cl.width, cl.height)
            assert C.GROUPS[g].size_id == cl.size_id
