"""Physical layout: bucketed joins must be exchange-free; compaction
must hit the target file count without losing rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from notion_vector_store_etl_pipeline_spark.operators.layout import (
    bucketed_join,
    compact_small_files,
    dir_bytes,
    n_data_files,
    write_bucketed,
)
from notion_vector_store_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(lineitem, "t_lineitem_b", "o_orderkey", 8, sort_col="o_orderkey")
    # bucketing's target scenario is two BIG tables (at 100 TB neither
    # side broadcasts) -> force the sort-merge path like the planner
    # would at scale, and require it to be exchange-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is still the plain join result
        expected = orders.join(lineitem, "o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join without bucketing shuffles (so the
    assertion above is meaningful, not vacuous)."""
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            orders.join(lineitem, "o_orderkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_compaction_reduces_file_count(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "many")
    docs.repartition(32).write.parquet(path)
    assert n_data_files(path) == 32
    before = docs.count()

    # huge target -> everything compacts into one file
    got = compact_small_files(spark, path, target_bytes=1 << 30)
    assert got == 1
    assert n_data_files(path) == 1
    after = spark.read.parquet(path)
    assert after.count() == before
    assert after.agg(F.sum("doc_id")).first()[0] == docs.agg(F.sum("doc_id")).first()[0]


def test_compaction_rebalance_path(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "skewed")
    docs.repartition(16).write.parquet(path)
    total = docs.count()
    # small target -> several output files, via the shuffle path
    target = max(1, dir_bytes(path) // 4)
    got = compact_small_files(spark, path, target_bytes=target, rebalance=True)
    assert 2 <= got <= 8
    assert spark.read.parquet(path).count() == total


def test_compaction_recovers_from_crashed_swap(spark, tmp_path):
    """compact_small_files shares commit_state's `.old-` swap naming, so
    a crash between its two renames is recoverable — and the next
    compaction performs that recovery itself before reading (r10
    review: the old code left nothing at the path and no code path
    consulted the sibling)."""
    import os

    from notion_vector_store_etl_pipeline_spark.operators.layout import (
        compact_small_files,
    )

    path = str(tmp_path / "t")
    spark.range(1000).repartition(8).write.parquet(path)
    # simulate the crash window: data renamed away, rewrite never landed
    os.rename(path, f"{path}.old-deadbeef")

    n = compact_small_files(spark, path)
    assert n >= 1
    assert spark.read.parquet(path).count() == 1000
    assert not os.path.exists(f"{path}.old-deadbeef")
