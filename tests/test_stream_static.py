"""Stream-static joins: the incremental-ingest shape where a document
stream is (a) enriched against a static dimension and (b) filtered
against the static already-ingested manifest — the reference's
per-page cache check (`Notion_openai_vector_etl.py:668-688`) as a
continuous query.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_stream_static_enrich_and_skip_known(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "n_chars")
    staged = str(tmp_path / "incoming")
    docs.write.parquet(staged)

    # static sides: a tiny lang dimension, and the manifest of already-
    # ingested ids (every doc_id < 200)
    lang_dim = spark.createDataFrame(
        [("en", "English"), ("de", "German"), ("es", "Spanish"), ("zh", "Chinese")],
        "lang string, lang_name string",
    )
    seen = docs.filter(F.col("doc_id") < 200).select(F.col("doc_id").alias("seen_id"))

    stream = spark.readStream.schema(docs.schema).parquet(staged)
    fresh = (
        stream.join(F.broadcast(lang_dim), "lang", "left")
        # stream-static LEFT ANTI is unsupported -> left outer + null filter
        .join(F.broadcast(seen), stream.doc_id == seen.seen_id, "left_outer")
        .filter(F.col("seen_id").isNull())
        .select("doc_id", "lang", "lang_name", "n_chars")
    )
    q = (
        fresh.writeStream.format("memory")
        .queryName("fresh_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM fresh_docs")
    expect = (
        docs.filter(F.col("doc_id") >= 200)
        .join(lang_dim, "lang", "left")
        .select("doc_id", "lang", "lang_name", "n_chars")
    )
    assert got.count() == expect.count()
    assert got.filter(F.col("doc_id") < 200).count() == 0
    # enrichment joined: every known lang got its name
    assert got.filter(F.col("lang").isin("en", "de", "es", "zh") & F.col("lang_name").isNull()).count() == 0
    assert sorted((r.doc_id, r.lang_name) for r in got.collect()) == sorted(
        (r.doc_id, r.lang_name) for r in expect.collect()
    )
