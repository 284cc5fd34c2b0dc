"""Streaming ingest-dedup: the incremental LSH probe composed into the
streaming wing — the 100 TB daily-ingest loop the two pieces were built
for (VERDICT r7 "what's missing" #2).

Shape: a micro-batched stream of incoming documents (the paginated
source — pages of today's crawl) is probed, per batch inside
``foreachBatch``, against the STORED LSH corpus index
(:func:`operators.dedup.build_lsh_index` written once per corpus
version by :func:`write_lsh_index`). Flagged near-dups are diverted to
``<out>/flagged``; surviving docs land in ``<out>/clean``; and (when
``update_index=True``) each batch's surviving docs contribute an index
DELTA so later batches also dedup against earlier stream batches —
the corpus index grows incrementally, it is never recomputed.

Exactly-once: every per-batch artifact (flagged pairs, clean docs,
index delta) is written to a ``batch_id=N`` directory with overwrite —
a crash between the sink write and the streaming epoch commit replays
the batch and the rewrite is byte-idempotent, the same discipline as
the vectorstore sink's txn manifest (streaming/pipeline.py) and the
reference's per-file manifest checkpoint
(Notion_openai_vector_etl.py:678-739 incremental loop, :731 commit).

Per-ingest cost: batch-side signatures + a bipartite bucket join +
candidate-local exact verify. The corpus is touched only by (a) the
stored-index scan and (b) the verify's candidate semi-join — no
corpus-side signature work, which at 100 TB is the whole point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from notion_vector_store_etl_pipeline_spark.operators.cache import release_cache
from notion_vector_store_etl_pipeline_spark.operators.dedup import (
    jaccard_verify_pairs,
    load_lsh_index,
    melted_signature_buckets,
    minhash_probe_candidates,
    minhash_signatures,
)
from notion_vector_store_etl_pipeline_spark.sources.paginated import (
    register_paginated_source,
)


def _read_prior_batches(
    spark: SparkSession, path: str, columns: list[str], before_batch: int
) -> DataFrame | None:
    """Read a ``batch_id=N``-partitioned output dir, keeping only rows
    from batches BEFORE ``before_batch``. The strict bound is what
    makes replays idempotent: a crash after this batch's own artifacts
    were written but before the epoch commit replays the batch, and
    without the bound the replay would find the crashed attempt's own
    index delta / clean docs and probe the batch against itself,
    flagging every doc as its own duplicate."""
    if not os.path.isdir(path):
        return None
    df = spark.read.parquet(path).filter(F.col("batch_id") < before_batch)
    return df.select(*columns)


def probe_batch(
    batch: DataFrame,
    corpus_docs: DataFrame,
    corpus_index: DataFrame,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    checkable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """One ingest step, batch-API shaped so the streaming wrapper and
    tests share it: probe ``batch`` (doc_id, text) against a prebuilt
    ``corpus_index``, verifying candidates exactly against
    ``corpus_docs`` (which must carry text for every sid the index can
    emit). Returns ``(flagged_pairs, clean_docs)`` — flagged is
    (batch_id, corpus_id, jaccard); clean is the batch rows with no
    flagged pair."""
    mb = melted_signature_buckets(
        minhash_signatures(batch, "text", "doc_id", num_hashes, checkable=checkable),
        bands,
        num_hashes // bands,
        checkable,
    )
    cand = minhash_probe_candidates(mb, corpus_index)
    # verification needs text on both sides; batch ∪ corpus is the
    # universe of candidate ids (semi-join inside keeps the shingle UDF
    # candidate-local)
    universe = batch.select("doc_id", "text").unionByName(
        corpus_docs.select("doc_id", "text")
    )
    flagged = jaccard_verify_pairs(universe, cand, threshold=threshold).select(
        F.col("a_id").alias("batch_id"), F.col("b_id").alias("corpus_id"), "jaccard"
    )
    clean = batch.join(
        flagged.select(F.col("batch_id").alias("doc_id")), "doc_id", "left_anti"
    )
    return flagged, clean


def streaming_dedup_ingest(
    spark: SparkSession,
    source_path: str,
    corpus_path: str,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    checkable: bool = False,
    page_size: int = 100,
    pages_per_batch: int = 2,
    update_index: bool = True,
) -> StreamingQuery:
    """Start the streaming ingest-dedup query.

    ``source_path``: parquet of incoming docs, streamed page-by-page
    through the paginated source (offsets = cursor, resume owned by the
    checkpoint). ``corpus_path``: the existing corpus docs (text needed
    for exact verification). ``index_path``: the stored LSH index built
    from exactly that corpus (``build_lsh_index`` -> ``write_lsh_index``
    — caller owns keeping the two in step, one "corpus version").
    Outputs under ``out_dir``: ``flagged/batch_id=N`` (near-dup pairs),
    ``clean/batch_id=N`` (surviving docs), ``index_delta/batch_id=N``
    (the melted buckets of surviving docs, read back by later batches
    when ``update_index`` — intra-stream dedup without ever touching
    the base index)."""
    register_paginated_source(spark)

    base_index = load_lsh_index(spark, index_path)
    corpus_docs = spark.read.parquet(corpus_path)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        index = base_index
        docs = corpus_docs
        if update_index:
            deltas = _read_prior_batches(
                spark, f"{out_dir}/index_delta", ["sid", "band", "bucket"], batch_id
            )
            if deltas is not None:
                index = index.unionByName(deltas)
            prior_clean = _read_prior_batches(
                spark, f"{out_dir}/clean", ["doc_id", "text"], batch_id
            )
            if prior_clean is not None:
                docs = docs.select("doc_id", "text").unionByName(prior_clean)
        flagged, clean = probe_batch(
            batch, docs, index, threshold, num_hashes, bands, checkable
        )
        # batch_id-keyed overwrite => replay-idempotent (exactly-once).
        # flagged's partition dir is named ingest_batch, not batch_id:
        # the pair rows already carry a batch_id DATA column (the batch
        # doc's id), and a same-named partition column would collide on
        # read-back of the whole tree.
        flagged.write.mode("overwrite").parquet(
            f"{out_dir}/flagged/ingest_batch={batch_id}"
        )
        clean.select("doc_id", "text").write.mode("overwrite").parquet(
            f"{out_dir}/clean/batch_id={batch_id}"
        )
        if update_index:
            delta = melted_signature_buckets(
                minhash_signatures(
                    spark.read.parquet(f"{out_dir}/clean/batch_id={batch_id}"),
                    "text",
                    "doc_id",
                    num_hashes,
                    checkable=checkable,
                ),
                bands,
                num_hashes // bands,
                checkable,
            )
            delta.write.mode("overwrite").parquet(
                f"{out_dir}/index_delta/batch_id={batch_id}"
            )
        release_cache()

    docs_stream = (
        spark.readStream.format("paginated")
        .option("path", source_path)
        .option("page_size", str(page_size))
        .option("pages_per_batch", str(pages_per_batch))
        .load()
    )
    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
