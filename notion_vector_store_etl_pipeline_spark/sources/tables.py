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
    """`events.ts` is nanosecond parquet, which Spark's vectorized reader
    rejects. Read nanos as long (legacy conf), keep the exact value as
    ``ts_ns`` and expose ``ts`` as a microsecond-truncated timestamp —
    the same truncation DuckDB's ``epoch_us`` applies, so oracle
    comparisons stay exact."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn("ts_ns", F.col("ts").cast("long")).withColumn(
        "ts", F.timestamp_micros(F.expr("CAST(ts AS BIGINT) div 1000"))
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
