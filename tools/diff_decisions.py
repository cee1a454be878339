"""Diff two decisions-log CSVs (migration/validation aid).

A user of the reference engine validates by eyeballing printed tables
(reference: main.cpp:868-876, 1254-1259 enableTerminalReport paths);
this tool makes the comparison mechanical: align two decisions logs
(ours vs the reference's, or two runs across lever settings/devices) on
their identity columns and report cost mismatches.

Usage:
    python tools/diff_decisions.py a.csv b.csv [--fields minSadHad]
        [--ignore-invalid WxH]

``--ignore-invalid WxH``: mask rows whose CU extends beyond the given
frame (the reference leaves stale buffer contents for out-of-frame CUs,
intra.cl:96-98, while this engine computes deterministic padded values —
those rows legitimately differ).

Exit code 0 = equal (within the compared fields), 1 = differences.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import pandas as pd

KEYS = ["CTU", "cuSizeName", "W", "H", "CU", "X", "Y", "Mode"]


def load(path: str) -> pd.DataFrame:
    df = pd.read_csv(path)
    missing = [k for k in KEYS if k not in df.columns]
    if missing:
        raise SystemExit(f"{path}: missing identity columns {missing}")
    if "POC" in df.columns:
        df = df.sort_values(["POC"] + KEYS, kind="stable")
    return df


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--fields", nargs="+",
                   default=["SAD", "SATD", "minSadHad"])
    p.add_argument("--ignore-invalid", default=None, metavar="WxH",
                   help="mask CUs extending beyond this frame size")
    p.add_argument("--limit", type=int, default=10,
                   help="mismatching rows to print per field")
    args = p.parse_args()

    a, b = load(args.a), load(args.b)
    if len(a) != len(b):
        print(f"row-count mismatch: {len(a)} vs {len(b)}")
        return 1
    for k in KEYS:
        if not (a[k].to_numpy() == b[k].to_numpy()).all():
            bad = np.nonzero(a[k].to_numpy() != b[k].to_numpy())[0][:3]
            print(f"identity column {k} differs at rows {bad.tolist()} — "
                  "not the same schema/order; aborting")
            return 1

    mask = np.ones(len(a), bool)
    if args.ignore_invalid:
        w, h = (int(v) for v in args.ignore_invalid.lower().split("x"))
        mask = ((a.X.to_numpy() + a.W.to_numpy() <= w)
                & (a.Y.to_numpy() + a.H.to_numpy() <= h))
        print(f"comparing {int(mask.sum())}/{len(a)} in-frame rows")

    rc = 0
    for f in args.fields:
        if f not in a.columns or f not in b.columns:
            print(f"{f}: absent, skipped")
            continue
        av, bv = a[f].to_numpy(np.int64), b[f].to_numpy(np.int64)
        mism = (av != bv) & mask
        n = int(mism.sum())
        if n == 0:
            print(f"{f}: OK ({int(mask.sum())} rows)")
            continue
        rc = 1
        print(f"{f}: {n} mismatches")
        idx = np.nonzero(mism)[0][:args.limit]
        cols = (["POC"] if "POC" in a.columns else []) + KEYS
        for i in idx:
            ident = ",".join(str(a.iloc[i][c]) for c in cols)
            print(f"  [{ident}] {av[i]} != {bv[i]}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
