"""Chunker queries (SURVEY.md §2.5 X1, §2.4 P2) — the UDTF-shaped core.

`chunk_explode` runs the exact reference algorithm (greedy line-packing
at CHUNK_CHAR_LEN=1200). Fixture texts are single-line and < 1200 chars,
so each doc yields exactly one chunk there; `chunk_explode_words` remaps
words->lines with max_len=80 so the greedy packing genuinely fans out,
and its DuckDB oracle replays the same greedy loop as a recursive CTE —
exact SQL-level parity for the algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.operators.chunker import chunk_id, explode_chunks
from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table

# Greedy line-packing as a recursive CTE over word-index order. The
# CASE arms mirror the kernel exactly: a chunk closes when adding the
# next word would push the packed length (word chars only, separators
# uncounted) past the limit; the final open chunk is flushed at end.
_WORDS_GREEDY_ORACLE = """
WITH RECURSIVE words AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents) t
), rec AS (
  SELECT doc_id, i, w AS cur, length(w) AS cur_len, CAST(NULL AS VARCHAR) AS emitted
  FROM words WHERE i = 1
  UNION ALL
  SELECT w.doc_id, w.i,
         CASE WHEN r.cur_len + length(w.w) > 80 THEN w.w
              ELSE r.cur || chr(10) || w.w END,
         CASE WHEN r.cur_len + length(w.w) > 80 THEN length(w.w)
              ELSE r.cur_len + length(w.w) END,
         CASE WHEN r.cur_len + length(w.w) > 80 THEN r.cur END
  FROM rec r JOIN words w ON w.doc_id = r.doc_id AND w.i = r.i + 1
), emitted AS (
  SELECT doc_id, i, emitted AS chunk FROM rec WHERE emitted IS NOT NULL
  UNION ALL
  SELECT r.doc_id, r.i + 1, r.cur FROM rec r
  JOIN (SELECT doc_id, max(i) AS max_i FROM words GROUP BY doc_id) m
    ON m.doc_id = r.doc_id AND m.max_i = r.i
), cleaned AS (
  SELECT doc_id, i, trim(chunk, ' ' || chr(10)) AS chunk_text FROM emitted
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INTEGER) AS chunk_index,
       chunk_text
FROM cleaned WHERE chunk_text <> ''
"""


@register(
    "chunk_explode",
    oracle="""
    SELECT doc_id, 0 AS chunk_index, trim(text) AS chunk_text
    FROM documents WHERE length(trim(text)) > 0
    """,
    doc="Reference chunker at CHUNK_CHAR_LEN=1200 (X1). Fixture docs are "
    "single-line < 1200 chars -> exactly one chunk each; the greedy loop "
    "itself is oracle-checked by chunk_explode_words and pytest/hypothesis.",
)
def chunk_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return explode_chunks(docs.select("doc_id", "text"), max_len=1200).select(
        "doc_id", "chunk_index", "chunk_text"
    )


@register(
    "chunk_explode_words",
    oracle=_WORDS_GREEDY_ORACLE,
    doc="Exact greedy-packing parity check: words-as-lines at max_len=80 vs "
    "a recursive-CTE replay of the same algorithm in DuckDB.",
)
def chunk_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lines = F.translate(F.trim(F.col("text")), " ", "\n").alias("text")
    return explode_chunks(docs.select("doc_id", lines), max_len=80).select(
        "doc_id", "chunk_index", "chunk_text"
    )


@register(
    "chunk_explode_udtf",
    oracle=_WORDS_GREEDY_ORACLE,
    doc="The same greedy chunker as a NATIVE Python UDTF (Spark 4 "
    "lateral-join table function) instead of pandas_udf+posexplode — "
    "one row in, N rows out, yielded directly from the eval generator. "
    "Same recursive-CTE oracle as chunk_explode_words; the "
    "pandas_udf+posexplode formulation remains the throughput path "
    "(Arrow-batched vs per-row eval).",
)
def chunk_explode_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    from notion_vector_store_etl_pipeline_spark.operators.chunker import greedy_chunk_text

    @udtf(returnType="chunk_index: int, chunk_text: string")
    class ChunkTable:
        def eval(self, text: str):
            for i, c in enumerate(greedy_chunk_text(text, 80)):
                yield i, c

    spark.udtf.register("chunk_table", ChunkTable)
    docs = load_table(spark, sf_dir, "documents")
    docs.select(
        "doc_id", F.translate(F.trim(F.col("text")), " ", "\n").alias("lines")
    ).createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_index, c.chunk_text
        FROM docs_for_udtf d, LATERAL chunk_table(d.lines) c
        """
    )


@register(
    "chunk_ids",
    oracle="""
    SELECT doc_id,
           sha256(source || '|' || sha256(text) || '|' || '0') AS chunk_id,
           0 AS chunk_index
    FROM documents WHERE length(trim(text)) > 0
    """,
    doc="Deterministic chunk ids: sha256(source|content_hash|index) (reference P2 `:312`).",
)
def chunk_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chunks = explode_chunks(docs.select("doc_id", "source", "text"), max_len=1200)
    content_hash = F.sha2("text", 256)
    return chunks.select(
        "doc_id",
        chunk_id(F.col("source"), content_hash, F.col("chunk_index")).alias("chunk_id"),
        "chunk_index",
    )
