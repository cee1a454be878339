"""Extract the VVC-standard MIP weight matrices into the package data file.

The MIP weight matrices are normative constants from the VVC/H.266 standard
(shipped by the reference as mip_matrix.cl and originally from VTM).  This
tool parses the numeric tables from the reference mount once and stores them
as ``vvc_mip_gpu_tpu/data/mip_weights.npz`` so the package is standalone.

Shapes (reference: mip_matrix.cl:1,293,441):
  size_id0: [16 modes][16 out samples][4 coeffs]
  size_id1: [ 8 modes][16 out samples][8 coeffs]
  size_id2: [ 6 modes][64 out samples][7 coeffs]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from parse_reference_tables import REFERENCE_DIR, extract_array  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "vvc_mip_gpu_tpu/data/mip_weights.npz"


def main() -> None:
    src = (REFERENCE_DIR / "mip_matrix.cl").read_text()
    m0 = np.asarray(extract_array("mipMatrix4x4", src), np.uint8)
    m1 = np.asarray(extract_array("mipMatrix8x8", src), np.uint8)
    m2 = np.asarray(extract_array("mipMatrix16x16", src), np.uint8)
    assert m0.shape == (16, 16, 4), m0.shape
    assert m1.shape == (8, 16, 8), m1.shape
    assert m2.shape == (6, 64, 7), m2.shape
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, size_id0=m0, size_id1=m1, size_id2=m2)
    print(f"wrote {OUT}: {m0.shape}, {m1.shape}, {m2.shape}")


if __name__ == "__main__":
    main()
