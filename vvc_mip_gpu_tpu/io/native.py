"""Wrappers for the native I/O extension (native/io_ext.c).

Importing this module raises ImportError when the extension is not built
(`make native`); callers fall back to the pandas paths.
"""

from __future__ import annotations

import numpy as np

from vvc_mip_gpu_tpu.io import _native_ext  # noqa: F401  (built extension)


def read_samples_csv(path: str, width: int, rows: int) -> np.ndarray:
    raw = _native_ext.read_samples_csv(path, width, rows)
    return np.frombuffer(raw, np.uint16).reshape(rows, width)


def write_samples_csv(path: str, samples: np.ndarray, width: int) -> None:
    """Write uint16 samples ([.., width]-shaped) in the reference frame-CSV
    format (one pixel row per line)."""
    _native_ext.write_samples_csv(
        path, np.ascontiguousarray(samples, np.uint16), width)


def write_decisions_csv(path: str, header: str, prefixes: bytes,
                        x_in: np.ndarray, y_in: np.ndarray,
                        sad: np.ndarray, satd: np.ndarray, msh: np.ndarray,
                        n_ctu: int, ctu_cols: int, ctu_size: int,
                        zero_costs: bool = False, poc: int = -1) -> None:
    """``zero_costs``: emit literal 0,0 SAD/SATD columns without reading
    the buffers (max-performance logs).  ``poc`` >= 0 adds the leading
    POC column (multi-frame logs)."""
    _native_ext.write_decisions_csv(
        path, header, prefixes,
        np.ascontiguousarray(x_in, np.int32),
        np.ascontiguousarray(y_in, np.int32),
        np.ascontiguousarray(sad, np.int64),
        np.ascontiguousarray(satd, np.int64),
        np.ascontiguousarray(msh, np.int64),
        n_ctu, ctu_cols, ctu_size, int(zero_costs), poc)
