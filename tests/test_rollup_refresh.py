"""Incremental view maintenance: refreshing a materialized rollup from
deltas must equal recomputing it from the full base table — including
retractions (negative deltas) and group disappearance.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from notion_vector_store_etl_pipeline_spark.operators.incremental import refresh_rollup
from notion_vector_store_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"
KEYS = ["l_returnflag", "l_linestatus"]


def _base(spark):
    li = load_table(spark, SF, "lineitem")
    return li.select(*KEYS, "l_quantity", "l_extendedprice", "l_orderkey")


def _full_rollup(df):
    return df.groupBy(*KEYS).agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


def _as_delta(df, sign=1):
    return df.select(
        *KEYS,
        (F.lit(sign) * F.col("l_quantity")).alias("sum_qty"),
        (F.lit(sign) * F.col("l_extendedprice")).alias("sum_price"),
        F.lit(sign).alias("n"),
    )


def _canon(df):
    return sorted(
        (r.l_returnflag, r.l_linestatus, round(r.sum_qty, 4), round(r.sum_price, 2), r.n)
        for r in df.collect()
    )


def test_insert_delta_matches_full_recompute(spark):
    base = _base(spark)
    old_part = base.filter(F.col("l_orderkey") % 5 != 0)
    new_part = base.filter(F.col("l_orderkey") % 5 == 0)

    refreshed = refresh_rollup(
        _full_rollup(old_part),
        _as_delta(new_part),
        KEYS,
        ["sum_qty", "sum_price"],
    )
    assert _canon(refreshed) == _canon(_full_rollup(base))


def test_retraction_delta_matches_full_recompute(spark):
    base = _base(spark)
    gone = base.filter(F.col("l_orderkey") % 7 == 0)
    remaining = base.filter(F.col("l_orderkey") % 7 != 0)

    refreshed = refresh_rollup(
        _full_rollup(base),
        _as_delta(gone, sign=-1),
        KEYS,
        ["sum_qty", "sum_price"],
    )
    assert _canon(refreshed) == _canon(_full_rollup(remaining))


def test_group_disappears_when_count_hits_zero(spark):
    base = _base(spark)
    one_group = base.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")
    )
    assert one_group.count() > 0
    refreshed = refresh_rollup(
        _full_rollup(base),
        _as_delta(one_group, sign=-1),
        KEYS,
        ["sum_qty", "sum_price"],
    )
    assert refreshed.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")
    ).count() == 0
    # all other groups unchanged
    others = _full_rollup(base.filter(
        (F.col("l_returnflag") != "R") | (F.col("l_linestatus") != "F")
    ))
    assert _canon(refreshed) == _canon(others)
