"""Frame ingest round-trip, decisions-CSV schema, and the CLI end-to-end."""

import numpy as np
import pandas as pd

from vvc_mip_gpu_tpu.constants import GROUPS
from vvc_mip_gpu_tpu.io import export, frames as fio


def test_frames_csv_roundtrip(tmp_path):
    fr = fio.synthetic_frames(2, 64, 48)
    p = tmp_path / "frames.csv"
    fio.write_frames_csv(p, fr)
    back = fio.read_frames_csv(p, 64, 48, 2)
    np.testing.assert_array_equal(back, fr)


def test_decisions_csv_schema(tmp_path):
    n_ctu = 2
    rng = np.random.default_rng(0)
    msh = rng.integers(0, 10000, size=(n_ctu, export.DIST_PER_CTU))
    p = tmp_path / "dec.csv"
    export.export_decisions_csv(p, msh, frame_width=256)
    df = pd.read_csv(p)
    assert list(df.columns) == ["CTU", "cuSizeName", "W", "H", "CU", "X", "Y",
                                "Mode", "SAD", "SATD", "minSadHad"]
    assert len(df) == n_ctu * export.DIST_PER_CTU
    # First row: CTU 0, first group, CU 0, mode 0
    r0 = df.iloc[0]
    assert (r0.CTU, r0.cuSizeName, r0.W, r0.H, r0.CU, r0.X, r0.Y, r0.Mode) \
        == (0, "ALL_AL_64x64", 64, 64, 0, 0, 0, 0)
    np.testing.assert_array_equal(df.minSadHad.to_numpy(), msh.ravel())
    # Row ordering within a group: modes fastest, then CU raster
    g = GROUPS[0]
    rows = df.iloc[:g.cus_per_ctu * g.total_modes]
    assert rows.Mode.tolist() == list(range(g.total_modes)) * g.cus_per_ctu
    # Second CTU of a 256-wide frame sits at X=128
    r = df.iloc[export.DIST_PER_CTU]
    assert (r.CTU, r.X, r.Y) == (1, 128, 0)


def test_decide_best_modes():
    rng = np.random.default_rng(1)
    msh = rng.integers(0, 10000, size=(1, export.DIST_PER_CTU))
    best = export.decide_best_modes(msh)
    g = GROUPS[46]
    block = msh[0, -g.cus_per_ctu * g.total_modes:].reshape(
        g.cus_per_ctu, g.total_modes)
    np.testing.assert_array_equal(best[46][0][0], block.argmin(-1))


def test_cli_end_to_end(tmp_path):
    from vvc_mip_gpu_tpu import cli

    rc = cli.main([
        "-f", "1", "-s", "128x128", "--Synthetic",
        "-l", str(tmp_path / "t_"),
    ])
    assert rc == 0
    df = pd.read_csv(tmp_path / "t_mip_decisions.csv")
    assert len(df) == export.DIST_PER_CTU


def test_cli_only_filter(tmp_path):
    from vvc_mip_gpu_tpu import cli

    rc = cli.main([
        "-f", "1", "-s", "64x64", "--Synthetic",
        "--FilterType", "filterFrame_2d_int_quarterCtu", "--KernelIdx", "2",
        "--OnlyFilter", "-l", str(tmp_path / "f_"),
    ])
    assert rc == 0
    filtered = fio.read_frames_csv(tmp_path / "f_filtered.csv", 64, 64, 1)
    from vvc_mip_gpu_tpu.golden import filters_golden as fg

    exp = fg.filter_frame(
        fio.synthetic_frames(1, 64, 64)[0].astype(np.int64),
        "filterFrame_2d_int_quarterCtu", 2)
    np.testing.assert_array_equal(filtered[0].astype(np.int64), exp)


def test_cli_resume_skips_existing(tmp_path, capsys):
    from vvc_mip_gpu_tpu import cli

    args = ["-f", "2", "-s", "128x128", "--Synthetic",
            "-l", str(tmp_path / "r_")]
    assert cli.main(args) == 0
    first = [pd.read_csv(tmp_path / f"r_mip_decisions_poc{f}.csv")
             for f in range(2)]
    capsys.readouterr()
    assert cli.main(args + ["--Resume"]) == 0
    out = capsys.readouterr().out
    assert out.count("skipping frame") == 2
    for f in range(2):  # outputs untouched
        pd.testing.assert_frame_equal(
            pd.read_csv(tmp_path / f"r_mip_decisions_poc{f}.csv"), first[f])


def test_cli_target_ctu_multiframe_file(tmp_path):
    """--TargetCTU writes one POC-columned CSV accumulating the target
    CTU across all frames (reference reportTargetDistortionValues_File,
    main_aux_functions.h:843-906)."""
    from vvc_mip_gpu_tpu import cli

    rc = cli.main(["-f", "2", "-s", "256x128", "--Synthetic",
                   "--TargetCTU", "1", "-l", str(tmp_path / "t_")])
    assert rc == 0
    df = pd.read_csv(tmp_path / "t_target_ctu1.csv")
    assert list(df.columns) == ["POC", "CTU", "cuSizeName", "W", "H", "CU",
                                "X", "Y", "Mode", "SAD", "SATD", "minSadHad"]
    assert len(df) == 2 * export.DIST_PER_CTU
    assert df.POC.tolist() == [0] * export.DIST_PER_CTU + \
        [1] * export.DIST_PER_CTU
    assert (df.CTU == 1).all()
    # Absolute positions: CTU 1 of a 256-wide frame sits at X base 128.
    assert df.iloc[0].X == 128 and df.iloc[0].Y == 0
    # The slab values match the per-frame decisions logs' CTU-1 slabs.
    for f in range(2):
        dec = pd.read_csv(tmp_path / f"t_mip_decisions_poc{f}.csv")
        np.testing.assert_array_equal(
            df.minSadHad[f * export.DIST_PER_CTU:
                         (f + 1) * export.DIST_PER_CTU].to_numpy(),
            dec.minSadHad[export.DIST_PER_CTU:].to_numpy())


def test_cli_sharded_per_frame_resume(tmp_path, capsys):
    import jax
    import pytest

    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    from vvc_mip_gpu_tpu import cli

    args = ["-f", "3", "-s", "128x128", "--Synthetic",
            "--MeshData", "2", "-l", str(tmp_path / "p_")]
    assert cli.main(args) == 0
    first = [pd.read_csv(tmp_path / f"p_mip_decisions_poc{f}.csv")
             for f in range(3)]
    # Drop frame 1's log; per-frame resume must recompute ONLY frame 1
    # (padding the batch to the data-axis multiple internally).
    (tmp_path / "p_mip_decisions_poc1.csv").unlink()
    capsys.readouterr()
    assert cli.main(args + ["--Resume"]) == 0
    out = capsys.readouterr().out
    assert out.count("skipping frame") == 2
    back = pd.read_csv(tmp_path / "p_mip_decisions_poc1.csv")
    pd.testing.assert_frame_equal(back, first[1])


def test_cli_sharded_mesh_and_resume(tmp_path, capsys):
    import jax
    import pytest

    if jax.device_count() < 4:
        pytest.skip("not enough devices")
    from vvc_mip_gpu_tpu import cli

    args = ["-f", "2", "-s", "128x256", "--Synthetic",
            "--MeshData", "2", "--MeshSpace", "2",
            "-l", str(tmp_path / "m_")]
    assert cli.main(args) == 0
    # Sharded output must equal the single-device CLI's output.
    assert cli.main(["-f", "2", "-s", "128x256", "--Synthetic",
                     "-l", str(tmp_path / "s_")]) == 0
    for f in range(2):
        m = pd.read_csv(tmp_path / f"m_mip_decisions_poc{f}.csv")
        s = pd.read_csv(tmp_path / f"s_mip_decisions_poc{f}.csv")
        np.testing.assert_array_equal(m.minSadHad.to_numpy(),
                                      s.minSadHad.to_numpy())
    capsys.readouterr()
    assert cli.main(args + ["--Resume"]) == 0
    assert "nothing to do" in capsys.readouterr().out


def test_cli_ragged_tail_chunk(tmp_path):
    """3 frames with --BatchFrames 2: the tail chunk (1 frame) is padded
    to the SAME compiled batch shape (no second XLA compile) and the
    duplicate result is dropped — all 3 per-frame CSVs must match the
    unbatched engine (ADVICE r2: ragged-tail recompile)."""
    from vvc_mip_gpu_tpu import cli
    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

    w, h = 128, 128
    rc = cli.main([
        "-f", "3", "-s", f"{w}x{h}", "--Synthetic",
        "--BatchFrames", "2", "-l", str(tmp_path / "r_"),
    ])
    assert rc == 0
    frames = fio.synthetic_frames(3, w, h)
    engine = MipCostEngine(w, h, max_performance=True)
    for f in range(3):
        got = pd.read_csv(tmp_path / f"r_mip_decisions_poc{f}.csv")
        exp = engine(frames[f].astype(np.int32))
        valid = np.asarray(exp.valid).ravel()
        e = np.asarray(exp.min_sad_had, np.int64).ravel()
        a = got.minSadHad.to_numpy()
        assert not ((a != e) & valid).any(), f"frame {f} mismatch"


def test_cli_latency_mode(tmp_path):
    """--LatencyMode: class-sharded over the 8 virtual devices, per-frame
    decisions bit-identical to the single-device engine."""
    from vvc_mip_gpu_tpu import cli
    from vvc_mip_gpu_tpu.models.cost_engine import MipCostEngine

    w, h = 128, 128
    rc = cli.main([
        "-f", "2", "-s", f"{w}x{h}", "--Synthetic", "--LatencyMode",
        "-l", str(tmp_path / "lat_"),
    ])
    assert rc == 0
    frames = fio.synthetic_frames(2, w, h)
    engine = MipCostEngine(w, h, max_performance=True)
    for f in range(2):
        got = pd.read_csv(tmp_path / f"lat_mip_decisions_poc{f}.csv")
        exp = engine(frames[f].astype(np.int32))
        valid = np.asarray(exp.valid).ravel()
        e = np.asarray(exp.min_sad_had, np.int64).ravel()
        a = got.minSadHad.to_numpy()
        assert not ((a != e) & valid).any(), f"frame {f} mismatch"
