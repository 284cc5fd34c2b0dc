"""Deduplication queries (north star, SURVEY.md §2.11): exact hash
dedup, exact n-gram Jaccard self-join, MinHash-LSH near-dup, SimHash
buckets. MinHash/SimHash rely on xxhash64 (engine-specific) so they are
rows-only for the oracle and verified against exact Jaccard in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.operators import dedup as D
from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "dedup_exact_hash",
    oracle="""
    SELECT content_hash, min(doc_id) AS doc_id, count(*) AS group_size
    FROM (
      SELECT doc_id,
             sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash
      FROM documents
    )
    GROUP BY content_hash
    """,
    doc="Exact dedup on normalized-content hash; first (min-id) row wins.",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    survivors = D.exact_dedup(docs, "text", "doc_id")
    return survivors.select("content_hash", "doc_id", F.col("group_size").cast("bigint").alias("group_size"))


_SHINGLES_CTE = """
WITH words AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws,1) AS i
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents)
), sh AS (
  SELECT DISTINCT w1.doc_id AS sid, w1.w || ' ' || w2.w || ' ' || w3.w AS shingle
  FROM words w1
  JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.i = w1.i + 1
  JOIN words w3 ON w1.doc_id = w3.doc_id AND w3.i = w1.i + 2
), sizes AS (
  SELECT sid, count(*) AS n FROM sh GROUP BY sid
)
"""


_HOT_SHINGLE_CAP = 100  # drop shingles occurring in > this many docs


_SHINGLES_CAPPED_CTE = (
    _SHINGLES_CTE.replace("), sizes AS (", f"""), shfreq AS (
  SELECT shingle, count(*) AS c FROM sh GROUP BY shingle
), shc AS (
  SELECT sh.sid, sh.shingle FROM sh JOIN shfreq USING (shingle)
  WHERE shfreq.c <= {_HOT_SHINGLE_CAP}
), sizes AS (""").replace(
        "SELECT sid, count(*) AS n FROM sh GROUP BY sid",
        "SELECT sid, count(*) AS n FROM shc GROUP BY sid",
    )
)


@register(
    "ngram_jaccard_selfjoin",
    oracle=_SHINGLES_CAPPED_CTE
    + """
    SELECT a_id, b_id, jaccard FROM (
      SELECT i.a_id, i.b_id,
             round(i.n_common * 1.0 / (sa.n + sb.n - i.n_common), 6) AS jaccard
      FROM (
        SELECT a.sid AS a_id, b.sid AS b_id, count(*) AS n_common
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.sid < b.sid
        GROUP BY 1, 2
      ) i
      JOIN sizes sa ON sa.sid = i.a_id
      JOIN sizes sb ON sb.sid = i.b_id
    ) WHERE jaccard >= 0.2
    """,
    doc="Exact 3-gram Jaccard near-dup self-join: explode distinct shingles, "
    "join on shingle (candidate pairs only), group per pair. Shingles in "
    f"> {_HOT_SHINGLE_CAP} docs are dropped before the join (stop-shingle "
    "cap, mirrored in the oracle) — one boilerplate shingle shared by f "
    "docs would otherwise contribute f^2 join rows, the classic quadratic "
    "blowup on skewed keys at 100 TB.",
)
def ngram_jaccard_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.2, max_shingle_freq=_HOT_SHINGLE_CAP
    )


@register(
    "minhash_lsh_neardup",
    oracle=None,  # xxhash64-based; validated vs exact Jaccard in pytest
    doc="MinHash(32 perms) + LSH(8 bands x 4 rows) candidates, verified "
    "with exact Jaccard — the sub-quadratic near-dup path for 100 TB.",
)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_neardup(docs, "text", "doc_id", threshold=0.2)


@register(
    "simhash_buckets",
    oracle=None,  # xxhash64-based; determinism + bucket behavior in pytest
    doc="64-bit SimHash fingerprints bucketed by the top 16 bits.",
)
def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", D.simhash64(F.col("text")).alias("simhash"))
    return sh.withColumn("bucket", F.shiftrightunsigned("simhash", 48))


@register(
    "simhash_neardup",
    oracle=None,  # xxhash64-based; determinism checked in pytest
    doc="SimHash near-dup: bucket by top-16 bits, pair within bucket, "
    "keep Hamming distance <= 12 of 64 — sub-quadratic because only "
    "bucket collisions are compared.",
)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", D.simhash64(F.col("text")).alias("simhash"))
    sh = sh.withColumn("bucket", F.shiftrightunsigned("simhash", 48))
    a = sh.select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("sh_a"), "bucket"
    )
    b = sh.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("sh_b"), "bucket"
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", D.hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= 12)
        .select("a_id", "b_id", "hamming")
    )


@register(
    "levenshtein_neardup_titles",
    oracle="""
    SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM part a JOIN part b
      ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
     AND CAST(floor(length(a.p_name) / 8) AS BIGINT)
         = CAST(floor(length(b.p_name) / 8) AS BIGINT)
     AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey % 7 = 0 AND b.p_partkey % 7 = 0
      AND levenshtein(a.p_name, b.p_name) <= 3
      AND a.p_name <> b.p_name
    """,
    doc="Edit-distance fuzzy matching (levenshtein <= 3) over short "
    "titles — the near-dup signal for strings too short for shingling "
    "(names, titles, SKUs). Candidate pairs come from a BLOCKING KEY "
    "(first char + length div 8), equi-joined — the plan is a hash "
    "join on the key, never a cross product, so it scales as "
    "sum(block^2) instead of n^2. The key is part of the query's "
    "semantics (mirrored in the oracle): pairs whose edit touches the "
    "first character or crosses a length-bucket boundary are out of "
    "scope by definition — the standard recall/cost trade of blocked "
    "record linkage; production raises recall with multiple key "
    "passes, not a bigger block.",
)
def levenshtein_neardup_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)

    def keyed(side: str) -> DataFrame:
        return part.select(
            F.col("p_partkey").alias(f"{side}_id"),
            F.col("p_name").alias(f"{side}_name"),
            F.substring("p_name", 1, 1).alias("blk_c"),
            F.floor(F.length("p_name") / 8).alias("blk_l"),
        )

    dist = F.levenshtein("a_name", "b_name")
    return (
        keyed("a")
        .join(keyed("b"), ["blk_c", "blk_l"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter((dist <= 3) & (F.col("a_name") != F.col("b_name")))
        .select("a_id", "b_id", dist.cast("int").alias("dist"))
    )


@register(
    "ngram_jaccard_prefixfilter",
    oracle=_SHINGLES_CTE
    + """
    SELECT a_id, b_id, jaccard FROM (
      SELECT i.a_id, i.b_id,
             round(i.n_common * 1.0 / (sa.n + sb.n - i.n_common), 6) AS jaccard
      FROM (
        SELECT a.sid AS a_id, b.sid AS b_id, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.sid < b.sid
        GROUP BY 1, 2
      ) i
      JOIN sizes sa ON sa.sid = i.a_id
      JOIN sizes sb ON sb.sid = i.b_id
    ) WHERE jaccard >= 0.5
    """,
    doc="EXACT Jaccard >= 0.5 self-join via AllPairs prefix filtering "
    "(Bayardo et al., WWW'07): rarest-first canonical order, join only "
    "on each set's (1-t)n+1 prefix shingles, length-ratio filter, then "
    "exact verify. Same answer as the brute-force oracle with a "
    "fraction of the candidate pairs — the exact-dedup scale path when "
    "approximation (MinHash) is not acceptable.",
)
def ngram_jaccard_prefixfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs_prefix(docs, "text", "doc_id", k=3, threshold=0.5)
