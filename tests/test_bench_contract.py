"""bench.py is a driver contract (one JSON line: metric/value/unit/
queries/sf) — a breakage there silently costs a round of BENCH data,
so smoke-run it at sf0.001 in a subprocess and validate the shape.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout[-2000:]
    out = json.loads(lines[0])
    assert out["metric"] == "headline_queries_total"
    assert out["unit"] == "sec"
    assert out["sf"] == 0.001
    assert out["value"] > 0
    assert len(out["queries"]) >= 25
    assert all(v >= 0 for v in out["queries"].values())
    assert abs(sum(out["queries"].values()) - out["value"]) < 0.01
