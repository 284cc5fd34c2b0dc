"""Local replica of the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle at sf0.001, compare row count,
column names, and order-insensitive values. Catches engine-semantics
drift before the driver does (driver runs the same at sf0.01).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from notion_vector_store_etl_pipeline_spark.plans import load_registry
from notion_vector_store_etl_pipeline_spark.sources import TABLES

from tests.conftest import SF_SMOKE

REGISTRY = load_registry()

# Queries whose oracle is legitimately EMPTY at the sf0.001 smoke
# fixture (600 orders / 15-ish customers make these selective TPC-H
# shapes return nothing) but non-empty at the driver's sf0.01 gate
# (1/366/6 rows) — anything else returning an empty oracle result here
# makes its parity comparison vacuous and FAILS the suite loudly (r10
# test review: 4 queries had silently-vacuous green rows).
EXPECTED_EMPTY_AT_SMOKE = {
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_values",
    "tpch_q20_part_promotion",
}


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "\x00<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and sub-ulp formatting noise
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", [n for n, q in REGISTRY.items() if q.oracle])
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMOKE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    cur = con.execute(q.oracle)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    if name not in EXPECTED_EMPTY_AT_SMOKE:
        assert duck_rows, (
            f"{name}: oracle returns 0 rows at this SF — the parity "
            "comparison is vacuous; fix the query's selectivity or add "
            "it to EXPECTED_EMPTY_AT_SMOKE with justification"
        )
    else:
        assert not duck_rows, (
            f"{name}: listed EXPECTED_EMPTY_AT_SMOKE but the oracle now "
            "returns rows — remove it from the allowlist"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _rows_to_set(spark_cols, spark_rows)
    d = _rows_to_set(duck_cols, duck_rows)
    if s != d:
        only_s = [r for r in s if r not in d][:5]
        only_d = [r for r in d if r not in s][:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={only_s} duck-only={only_d}"
        )


@pytest.mark.parametrize("name", [n for n, q in REGISTRY.items() if q.oracle is None])
def test_rows_only_queries_run(spark, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMOKE)
    # > 0, not >= 0 (count can't be negative — that assert was vacuous):
    # a rows-only query has no oracle, so non-emptiness is the only
    # signal distinguishing 'runs' from 'regressed to empty output'
    assert sdf.count() > 0, f"{name}: rows-only query returned 0 rows"
    assert len(sdf.columns) > 0
