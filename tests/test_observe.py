"""Observation metrics (the reference's run-outcome tallies,
`Notion_openai_vector_etl.py:673-676`, done the Spark way): counters
ride along on the action itself via `df.observe()` — no second pass
over the data, no driver-side accumulation loop.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_observe_pipeline_counters(spark):
    docs = load_table(spark, SF, "documents")
    obs = Observation("run_summary")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.length("text") > 300, 1).otherwise(0)).alias("n_long"),
        # DISTINCT aggregates are disallowed in observed metrics
        F.approx_count_distinct("lang").alias("n_langs"),
    )
    # one action drives both the query result and the metrics
    kept = observed.filter(F.col("lang") == "en").count()

    m = obs.get
    assert m["n_rows"] == docs.count()
    assert m["n_langs"] == 5
    assert 0 < kept < m["n_rows"]
    assert 0 < m["n_long"] < m["n_rows"]
