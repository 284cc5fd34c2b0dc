"""Physical-layout tests for the 100 TB path: bucketed tables make the
co-located join shuffle-free, and partitioned writes give the scan
partition pruning. Assertions are on the physical plan itself.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _plan_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", str(tmp_path / "orders_b")).mode("overwrite").saveAsTable("orders_b"))
    (cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", str(tmp_path / "cust_b")).mode("overwrite").saveAsTable("cust_b"))

    ob = spark.table("orders_b")
    cb = spark.table("cust_b")
    joined = ob.join(cb, ob.o_custkey == cb.c_custkey).select("o_orderkey", "c_name")
    # disable broadcast so the join strategy decision is bucket-driven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan_str(joined)
        assert "SortMergeJoin" in plan
        # bucketed layout co-locates both sides: no shuffle exchange
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == orders.count()  # every order has a customer
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_partitioned_write_prunes_scan(spark, tmp_path):
    events = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_date")
    events.write.partitionBy("event_date").mode("overwrite").parquet(path)

    back = spark.read.parquet(path)
    one_day = back.filter(F.col("event_date") == "2024-01-03")
    plan = _plan_str(one_day)
    # the date predicate must be a partition filter, not a data filter
    assert "PartitionFilters" in plan and "2024-01-03" in plan
    want = events.filter(F.to_date("ts") == "2024-01-03").count()
    assert one_day.count() == want and want > 0


def test_repartition_controls_output_files(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "docs4")
    docs.repartition(4).write.mode("overwrite").parquet(out)
    import glob

    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == 4
