"""Source/format coverage beyond parquet/JSON: ORC, CSV (with schema +
header), and Spark 4's native XML — write/read round-trips preserve
values, and the columnar formats keep predicate pushdown.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "lang", "n_chars")


def _assert_same(a, b):
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = spark.read.orc(path)
    _assert_same(docs, back)

    filtered = back.filter(F.col("doc_id") < 100).select("doc_id")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(doc_id,100)" in plan, plan
    assert filtered.count() == docs.filter("doc_id < 100").count()


def test_csv_roundtrip_with_schema(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_csv")
    docs.write.option("header", True).csv(path)
    back = spark.read.schema(docs.schema).option("header", True).csv(path)
    _assert_same(docs, back)
    # schema-on-read, not inference: dtypes match the source exactly
    assert back.dtypes == docs.dtypes


def test_xml_roundtrip(spark, tmp_path):
    docs = _docs(spark).limit(50)
    path = str(tmp_path / "docs_xml")
    docs.write.format("xml").option("rootTag", "docs").option("rowTag", "doc").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema(docs.schema)
        .load(path)
    )
    _assert_same(docs, back)
