"""bench.py is a driver contract (one JSON line: metric/value/unit/
queries/sf) — a breakage there silently costs a round of BENCH data.
Default run: a fast subset smoke (one query per family incl. events,
pandas-UDF, and cached-intermediate paths, 1 trial). --runslow: the
full headline sweep (pinned >= 55 queries since round 6), exactly
what the driver executes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

# spans the failure modes that have actually bitten: events loader
# (window_tumbling_counts), Python/Arrow workers (multimodal), eager
# persist (ngram_jaccard_prefixfilter), graph iteration, TPC-H join
FAST_SUBSET = (
    "tpch_q1_pricing_summary,window_tumbling_counts,multimodal_decode_stub,"
    "ngram_jaccard_prefixfilter,graph_reachability,incremental_changed"
)


def _run_bench(extra_env: dict[str, str]) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # r13 contract: STDOUT is exactly ONE compact JSON line, so a
    # recorder keeping only a bounded stdout tail can json.loads it
    # directly; the rich contention-audit line goes to STDERR
    # (VERDICT r12 #1/#8)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout[-2000:]
    assert proc.stdout.splitlines()[-1] == lines[0]
    compact = json.loads(lines[0])
    rich_lines = [l for l in proc.stderr.splitlines() if l.startswith('{"metric"')]
    assert len(rich_lines) == 1, proc.stderr[-2000:]
    rich = json.loads(rich_lines[0])
    assert set(rich["meta"]) == set(rich["queries"])
    for m in rich["meta"].values():
        assert {
            "loadavg",
            "ext_cores",
            "io_cores",
            "steal_cores",
            "canary_sec",
            "contended",
            "trials",
        } <= set(m)
        assert isinstance(m["contended"], bool)
        assert m["canary_sec"] > 0
    assert compact["queries"] == rich["queries"]
    # host-speed summary (r15, additions-only): lets the judge normalize
    # cross-round comparisons for hypervisor-level slowdowns
    assert {"canary_sec_min", "canary_sec_max", "steal_cores_max"} <= set(
        compact["host"]
    )
    assert 0 < compact["host"]["canary_sec_min"] <= compact["host"]["canary_sec_max"]
    return compact


def _check_contract(out: dict, min_queries: int) -> None:
    assert out["metric"] == "headline_queries_total"
    assert out["unit"] == "sec"
    assert out["sf"] == 0.001
    assert out["value"] > 0
    assert len(out["queries"]) >= min_queries
    assert all(v >= 0 for v in out["queries"].values())
    assert abs(sum(out["queries"].values()) - out["value"]) < 0.01


def test_bench_emits_contract_json_fast_subset():
    out = _run_bench(
        {"SPARK_GRAFT_BENCH_QUERIES": FAST_SUBSET, "SPARK_GRAFT_BENCH_TRIALS": "1"}
    )
    _check_contract(out, min_queries=6)


def test_headline_set_pinned():
    """The r6 headline enlargement (40 -> 56: strings, incremental,
    mapInArrow, setops, pivot/unpivot, semi-structured) is part of the
    recorded bench surface — a silent shrink would make later rounds
    look faster by measuring less. Pin size and the one-per-family
    sentinels; every name must resolve in the registry."""
    import bench
    from notion_vector_store_etl_pipeline_spark.plans import load_registry

    reg = load_registry()
    assert len(bench.HEADLINE) >= 56
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    # flagship_pipeline is the driver's entry() contract, resolved by
    # bench.py itself (VERDICT r11 #4), not a registry query
    missing = [
        n for n in bench.HEADLINE if n not in reg and n != "flagship_pipeline"
    ]
    assert not missing, f"headline names not registered: {missing}"
    assert "flagship_pipeline" in bench.HEADLINE
    for sentinel in (
        "title_coalesce",
        "left_join_state",
        "multimodal_decode_arrow",
        "setop_except",
        "pivot_counts",
        "json_extract_props",
    ):
        assert sentinel in bench.HEADLINE


def test_contention_probes_sane():
    """The /proc-based contention probes must return sane values — a
    kernel /proc format drift should fail HERE, loudly, not silently
    mis-flag every bench entry."""
    import bench

    busy, iow, steal = bench._busy_jiffies()
    assert busy > 0 and iow >= 0 and steal >= 0
    tree = bench._tree_jiffies()
    assert tree > 0  # at least this very process has burned CPU
    elapsed, ext, io_c, load1, steal_c = bench._timed_trial(
        lambda: sum(range(10**6))
    )
    assert elapsed > 0 and ext >= 0 and io_c >= 0 and load1 >= 0 and steal_c >= 0
    canary = bench._cpu_canary()
    assert 0 < canary < 30  # fixed work; finite even on a contended box


@pytest.mark.slow
def test_bench_emits_contract_json():
    out = _run_bench({})
    _check_contract(out, min_queries=55)
