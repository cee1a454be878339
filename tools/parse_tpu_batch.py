"""Summarize a tools/tpu_batch_r{2,3}.sh log into one A/B decision table.

Usage: python tools/parse_tpu_batch.py /tmp/tpu_batch_r3.log

Reads the `== e2e-max VVC_FETCH=..` / `== bench ..` section markers the batch script writes and pairs each with the
measurement line that follows (profile_stages prints `... ms`, bench
prints a JSON line), then prints ranked tables so the winning lever
combo — the one the engine defaults should be flipped to — is obvious.
"""

from __future__ import annotations

import json
import re
import sys


def main(path: str) -> None:
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]

    e2e: list[tuple[str, float]] = []   # (config, ms/frame)
    bench: list[tuple[str, float]] = []  # (config, fps)
    other: list[str] = []
    pending: str | None = None

    for ln in lines:
        m = re.match(r"== (e2e-max|bench) ((?:VVC_FETCH=\S+"
                     r"(?: VVC_CTU_EMIT=\S+)?"
                     r"|VVC_SID0_LIMBS=\S+(?: VVC_SID1_LIMBS=\S+)?))", ln)
        if m:
            pending = f"{m.group(1)}|{m.group(2)}"
            continue
        if ln.startswith("=="):
            if pending is not None:
                other.append(f"(no result for {pending})")
            pending = None
            if not re.match(r"== (probe|done|.* \d\d:\d\d:\d\d$)", ln):
                other.append(ln)
            continue
        if pending is None:
            continue
        kind, cfg = pending.split("|", 1)
        mm = re.search(r"(\d+\.\d+) ms", ln)
        if kind == "e2e-max" and mm:
            e2e.append((cfg, float(mm.group(1))))
            pending = None
        elif kind == "bench" and ln.lstrip().startswith("{"):
            try:
                val = json.loads(ln)["value"]
                # bench emits {"value": null, "error": ...} on relay
                # failure — keep the table alive, surface the error.
                if val is None:
                    other.append(f"{cfg}: bench errored: {ln}")
                else:
                    bench.append((cfg, val))
            except (json.JSONDecodeError, KeyError):
                other.append(f"{cfg}: unparseable bench line: {ln}")
            pending = None

    if e2e:
        print("in-jit e2e (max-perf, ms/frame — lower is better):")
        for cfg, ms in sorted(e2e, key=lambda t: t[1]):
            print(f"  {ms:8.2f} ms  {cfg}")
        best = min(e2e, key=lambda t: t[1])
        print(f"  -> winner: {best[0]}  ({1000.0 / best[1]:.1f} fps in-jit "
              f"ceiling)")
    if bench:
        print("bench (dispatch-inclusive fps — higher is better):")
        for cfg, fps in sorted(bench, key=lambda t: -t[1]):
            print(f"  {fps:8.1f} fps  {cfg}")

    # Non-A/B lines worth eyeballing (bit-exact test tail, default bench,
    # side benches, per-class profile) are left in the log; surface only
    # the JSON lines and pytest summary here.
    print("other JSON / pytest lines:")
    for ln in lines:
        if ln.lstrip().startswith("{") or " passed" in ln or "failed" in ln:
            print(f"  {ln.strip()}")
    for ln in other:
        print(f"  ! {ln}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_batch.log")
