"""The native C I/O paths must be byte-equivalent to the Python fallbacks."""

import numpy as np
import pandas as pd
import pytest

from vvc_mip_gpu_tpu.io import export, frames as fio

native = pytest.importorskip("vvc_mip_gpu_tpu.io.native")


def test_native_read_matches_python(tmp_path):
    fr = fio.synthetic_frames(2, 96, 64)
    p = tmp_path / "f.csv"
    fio.write_frames_csv(p, fr)
    got = native.read_samples_csv(str(p), 96, 128)
    np.testing.assert_array_equal(got.reshape(2, 64, 96), fr)


import pytest


@pytest.mark.parametrize("full,poc", [
    (True, None),    # SAD/SATD columns populated
    (False, None),   # max-performance zero-costs fast path
    (False, 3),      # POC-columned multi-frame log (native since r3)
    (True, 0),
    ("sad_only", None),   # exactly one column present: the other must
    ("satd_only", None),  # be REAL zeros, not placeholder data
])
def test_native_export_matches_pandas(tmp_path, monkeypatch, full, poc):
    rng = np.random.default_rng(2)
    msh = rng.integers(0, 100000, size=(2, export.DIST_PER_CTU))
    sad = rng.integers(0, 50000, size=(2, export.DIST_PER_CTU))
    satd = rng.integers(0, 50000, size=(2, export.DIST_PER_CTU))
    kw = (dict(sad=sad, satd=satd) if full is True
          else dict(sad=sad) if full == "sad_only"
          else dict(satd=satd) if full == "satd_only" else {})
    p_nat = tmp_path / "nat.csv"
    p_pd = tmp_path / "pd.csv"
    export.export_decisions_csv(p_nat, msh, 256, poc=poc, **kw)

    # Force the pandas path by hiding the native module.
    monkeypatch.setitem(
        __import__("sys").modules, "vvc_mip_gpu_tpu.io.native", None)
    export.export_decisions_csv(p_pd, msh, 256, poc=poc, **kw)

    a = pd.read_csv(p_nat)
    b = pd.read_csv(p_pd)
    pd.testing.assert_frame_equal(a, b)


def test_native_samples_writer_matches_python(tmp_path):
    """write_frames_csv's native fast path must emit byte-identical CSV
    to the Python fallback."""
    rng = np.random.default_rng(7)
    fr = rng.integers(0, 1024, size=(2, 16, 24), dtype=np.uint16)
    p_nat = tmp_path / "nat.csv"
    p_py = tmp_path / "py.csv"
    native.write_samples_csv(str(p_nat), fr.reshape(-1, 24), 24)
    flat = fr.reshape(-1, 24)
    with open(p_py, "w") as f:
        for row in flat:
            f.write(",".join(map(str, row.tolist())))
            f.write("\n")
    assert p_nat.read_bytes() == p_py.read_bytes()
