"""Power-trace alignment / energy computation (tools/compute_energy.py).

Mirrors the reference harness semantics: stage windows come from
START/FINISH stdout markers, average power is the mean of meter samples in
the window, energy = avg power x window length
(reference: computeEnergy_NVIDIA.py:41-100, 154-167).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import compute_energy as ce  # noqa: E402


MARKERS = [
    "garbage line",
    "START ENQUEUE KERNELS,100.0",
    "FINISH ENQUEUE KERNELS,101.0",
    "START READ DISTORTION,101.0",
    "FINISH READ DISTORTION,103.0",
    "START ENQUEUE KERNELS,103.0",
    "FINISH ENQUEUE KERNELS,104.0",
    "FINISH NEVER_STARTED,105.0",
]

POWER = ["timestamp_s,power_w"] + [
    f"{t},{p}" for t, p in [
        (99.5, 100.0),   # before the active window
        (100.2, 10.0), (100.8, 30.0),       # first kernel window
        (101.5, 50.0), (102.5, 70.0),       # read window
        (103.5, 40.0),                       # second kernel window
        (104.5, 999.0),                      # after the active window
    ]
]


def test_parse_markers_pairs_start_finish():
    stages = ce.parse_markers(MARKERS)
    assert stages == {
        "ENQUEUE KERNELS": [(100.0, 101.0), (103.0, 104.0)],
        "READ DISTORTION": [(101.0, 103.0)],
    }


def test_window_energy_sample_average():
    power = ce.parse_power(POWER)
    avg, e = ce.window_energy(power, 100.0, 101.0)
    assert avg == 20.0 and e == 20.0  # mean(10, 30) * 1 s


def test_analyze_active_window_and_stages():
    rep = ce.analyze(MARKERS, POWER)
    assert rep["active_window_s"] == 4.0  # 100.0 .. 104.0
    # samples inside [100, 104]: 10, 30, 50, 70, 40 -> avg 40 W
    assert rep["avg_power_w"] == 40.0
    assert rep["energy_j"] == 160.0
    st = rep["stages"]
    assert st["ENQUEUE KERNELS"]["count"] == 2
    assert st["ENQUEUE KERNELS"]["time_s"] == 2.0
    # windows: mean(10,30)*1 + mean(40)*1 = 20 + 40
    assert st["ENQUEUE KERNELS"]["energy_j"] == 60.0
    assert st["READ DISTORTION"]["energy_j"] == 120.0  # mean(50,70)*2


def test_banded_cpu_filter_matches_whole_frame():
    # The CPU-profiler's band decomposition (halo rows per band) must be
    # bit-identical to the whole-frame golden filter across seam positions.
    import profile_cpu_filtering as pcf

    from vvc_mip_gpu_tpu.golden import filters_golden as fg

    frame = np.random.default_rng(5).integers(
        0, 1024, size=(96, 128)).astype(np.int64)
    for ft in ("filterFrame_2d_int_quarterCtu",
               "filterFrame_2d_float_5x5_quarterCtu",
               "filterFrame_1d_int",
               "filterFrame_1d_float_5x5"):
        ref = fg.filter_frame(frame, ft, 0)
        for n in (2, 3, 7):
            np.testing.assert_array_equal(
                pcf.filter_banded(frame, ft, 0, n), ref, err_msg=f"{ft}/{n}")
