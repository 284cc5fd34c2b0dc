"""Fixture-table readers.

Tables are driver-generated parquet (TESTDATA.md). The parquet footer
is the authoritative schema; readers here stay declarative
(``spark.read.parquet``) so Catalyst gets column pruning + filter
pushdown into the scan for free. At 100 TB these would be
partitioned/bucketed table locations instead of single files — the
reader API is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive reader for `events.ts` across fixture layouts (the
    reference tolerates shape drift the same way — ``.get(…, default)``
    everywhere, Notion_openai_vector_etl.py:684-706). Two observed forms:

    - ``timestamp[us]`` parquet (current): Spark loads TIMESTAMP_NTZ.
      Session tz is UTC so the NTZ→TZ cast is exact; ``ts_ns`` is then
      ``unix_micros(ts) * 1000`` — bit-identical to DuckDB
      ``epoch_us(ts)*1000``.
    - ``timestamp[ns]`` parquet (legacy): Spark's vectorized reader
      rejects it; read nanos as long, keep the exact value as ``ts_ns``
      and truncate to micros for ``ts`` (same truncation DuckDB's
      ``epoch_us`` applies).

    Both branches expose the same (ts TIMESTAMP, ts_ns BIGINT) surface so
    all 25 downstream event queries are layout-agnostic.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    try:
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    except Exception as e:  # legacy timestamp[ns] layout
        if "NANOS" not in str(e) and "nanos" not in str(e):
            raise
        # The legacy conf is set ONLY when a ns fixture is actually
        # encountered — NOT unconditionally: session-global, it changes
        # every later timestamp[ns] parquet read in the session from a
        # loud unsupported-type error into a silent BIGINT column. It
        # cannot be scoped-and-restored around the read either (the
        # scan consults it again at execution, after this function
        # returns), so after touching a legacy fixture it stays set —
        # the lesser evil, and irrelevant on the current us fixtures
        # where this branch never runs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        ts = F.col("ts").cast("timestamp")
        return raw.withColumn("ts_ns", F.unix_micros(ts) * 1000).withColumn(
            "ts", ts
        )
    return raw.withColumn("ts_ns", F.col("ts").cast("long")).withColumn(
        "ts", F.timestamp_micros(F.expr("CAST(ts AS BIGINT) div 1000"))
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
