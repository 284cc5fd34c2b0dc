"""Fixture-format canary.

The driver regenerates /root/testdata between rounds and has changed
parquet physical types before (round 4: events.ts went timestamp[ns] →
timestamp[us], which silently broke 25 queries and the whole bench).
This test loads every table at every scale factor through the engine's
own reader and materializes one row, so any future format drift fails
the FIRST pytest run with a table-and-sf-specific message instead of
zeroing a round.
"""

from __future__ import annotations

import os

import pytest

from notion_vector_store_etl_pipeline_spark.sources.tables import TABLES, load_table

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        # derived decade (scripts/make_scale_decade.py), when materialized:
        # it must honor the same physical schema contract (ADVICE r6
        # caught an int32 n_chars divergence exactly here)
        os.path.join(_REPO, ".scale/sf1"),
    )
    if os.path.isdir(d)
]


# Arrow physical types every query family assumes, captured from the
# round-5/6 driver-generated parquet. The round-4 incident was exactly
# one of these drifting (events.ts timestamp[ns] -> timestamp[us])
# and surfacing as 25 broken queries mid-round; pinning ALL tables
# makes the next regeneration (decimal precision, nullability, int
# width, list element type) fail in ONE targeted test with the table
# and column named. `load_table` adapts ts-precision drift at read
# time — this canary is the loud early warning, not the adapter.
EXPECTED_ARROW = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": ("timestamp[us]", "timestamp[ns]"),
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": ("timestamp[us]", "timestamp[ns]"),
    },
    "events": {
        "event_id": "int64",
        "ts": ("timestamp[us]", "timestamp[ns]"),
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_arrow_physical_schema_pinned(sf_dir):
    """Spark-free (pure pyarrow footer read), so it runs first and
    fails fast even when the SparkSession fixture itself would choke
    on the drifted data."""
    import pyarrow.parquet as pq

    problems = []
    for name, want in EXPECTED_ARROW.items():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # Spark-written tables (.scale decades) are directories of
            # part files; the driver fixtures are single files. Any one
            # part carries the full schema.
            parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
            if not parts:
                problems.append(
                    f"{name} at {sf_dir}: directory has no part files "
                    "(interrupted decade generation? re-run "
                    "scripts/make_scale_decade.py)"
                )
                continue
            path = os.path.join(path, parts[0])
        schema = pq.read_schema(path)
        got = {f.name: str(f.type) for f in schema}
        if list(got) != list(want):
            problems.append(f"{name}: columns {list(got)} != expected {list(want)}")
            continue
        for col, exp in want.items():
            allowed = exp if isinstance(exp, tuple) else (exp,)
            if got[col] not in allowed:
                problems.append(f"{name}.{col}: {got[col]} not in {allowed}")
    assert not problems, (
        "fixture parquet physical schema drifted (driver regenerated "
        "testdata with different types?):\n  " + "\n  ".join(problems)
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_all_tables_load_and_materialize(spark, sf_dir):
    for name in TABLES:
        try:
            df = load_table(spark, sf_dir, name)
            rows = df.limit(1).collect()
        except Exception as exc:  # pragma: no cover - the message IS the test
            pytest.fail(
                f"fixture canary: {name} at {sf_dir} failed to load/materialize "
                f"(driver may have changed the parquet layout): {exc}"
            )
        assert rows, f"fixture canary: {name} at {sf_dir} is empty"


def test_events_contract(spark):
    """The engine-level events contract all 25 event queries rely on:
    ts is TIMESTAMP (UTC session), ts_ns is BIGINT nanoseconds, and they
    agree with each other to microsecond precision."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = load_table(spark, SF_DIRS[0], "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), df.schema["ts"]
    assert isinstance(df.schema["ts_ns"].dataType, T.LongType), df.schema["ts_ns"]
    bad = df.filter(F.unix_micros("ts") * 1000 != F.col("ts_ns")).count()
    assert bad == 0, f"{bad} rows where ts and ts_ns disagree"


def test_driver_window_prefix_is_deliberate():
    """The correctness driver samples a prefix window of the registry;
    plans/__init__._PRIORITY spends it deliberately (fixes-to-prove
    first, then never-sampled families). An accidental reordering would
    silently waste a round's worth of driver rows — pin the head."""
    from notion_vector_store_etl_pipeline_spark.plans import _PRIORITY, load_registry

    names = list(load_registry())
    assert names[: len(_PRIORITY)] == list(_PRIORITY)
    assert len(_PRIORITY) == 50


def test_legacy_ns_parquet_branch_and_conf_hygiene(spark, tmp_path):
    """The legacy timestamp[ns] reader branch: a ns-physical parquet
    (the rounds-1-3 fixture layout) loads through load_table's fallback
    with the same (ts TIMESTAMP, ts_ns BIGINT) surface — and the
    session-global nanosAsLong conf is NOT touched by reading the
    current us fixtures (set only when a ns fixture is actually hit,
    because session-wide it silently turns every later ns column into
    BIGINT instead of a loud unsupported-type error)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from notion_vector_store_etl_pipeline_spark.sources import load_table

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(conf_key)
    load_table(spark, "/root/testdata/sf0.001", "events").limit(1).collect()
    assert spark.conf.get(conf_key, None) in (None, "false")  # us path: untouched

    ns_dir = str(tmp_path / "legacy")
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000_001, 1_700_000_000_000_002_000],
                           pa.timestamp("ns")),
        }
    )
    import os

    os.makedirs(ns_dir, exist_ok=True)
    pq.write_table(tbl, f"{ns_dir}/events.parquet", use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None)
    try:
        got = {r.event_id: (r.ts_ns, r.ts) for r in
               load_table(spark, ns_dir, "events").collect()}
        assert got[1][0] == 1_700_000_000_000_000_001  # exact nanos preserved
        assert got[2][0] == 1_700_000_000_000_002_000
        assert got[1][1] is not None  # micros-truncated timestamp surface
    finally:
        spark.conf.unset(conf_key)  # don't leak the legacy conf to later tests
