"""bench.py is the driver's measurement artifact: its contract (ONE
parseable JSON line with metric/value/unit/vs_baseline) must not rot.
Runs the real script in a subprocess on the CPU backend at a tiny
resolution."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("extra", [
    [],
    ["--window", "reference"],
    ["--window", "r1"],
    ["--with-export"],
    ["--latency"],
])
def test_bench_emits_one_json_line(extra):
    env = dict(os.environ, VVC_MIP_PLATFORM="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, "bench.py", "--resolution", "128x64",
         "--batch", "1", *extra],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    json_lines = [ln for ln in r.stdout.splitlines()
                  if ln.lstrip().startswith("{")]
    assert len(json_lines) == 1, r.stdout
    rec = json.loads(json_lines[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == ("ms" if "--latency" in extra else "frames/s")
    assert rec["value"] and rec["value"] > 0
    assert "error" not in rec
