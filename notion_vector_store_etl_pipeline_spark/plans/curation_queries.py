"""Training-data pipeline operators, wave 3: benchmark-contamination
detection, Gopher-style repetition profiling, sequence packing, mixture
rebalancing, and deterministic export shuffle — the corpus-curation
steps between dedup (dedup_queries.py) and training export that a
100 TB pretraining pipeline runs on every snapshot.

Scale notes are inline per operator; the common theme is that every
"global" statistic (benchmark n-gram set, per-language rates) is a
tiny aggregate that broadcasts, so the big table is touched by narrow
map-side work plus at most one keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_vector_store_etl_pipeline_spark.operators import dedup as D
from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table

# 5-word shingles for contamination (standard n-gram overlap check);
# DuckDB side built on 1-based inclusive list slicing.
_SH5_CTE = """
WITH words AS (
  -- list_filter: drop empty edge tokens (non-space edge whitespace
  -- survives trim) to match the engine's Python str.split() — see
  -- the note on _SHINGLES_CTE in dedup_queries.py
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM documents
), pos AS (
  SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws)-4, 0))) AS i
  FROM words
), sh AS (
  SELECT DISTINCT doc_id AS sid, array_to_string(ws[i:i+4], ' ') AS shingle
  FROM pos
)
"""


@register(
    "contamination_ngram_overlap",
    oracle=_SH5_CTE
    + """
    , bench AS (
      SELECT DISTINCT shingle FROM sh WHERE sid % 97 = 0
    ), totals AS (
      SELECT sid, count(*) AS n_grams FROM sh WHERE sid % 97 <> 0 GROUP BY sid
    ), hits AS (
      SELECT sh.sid, count(*) AS n_hit
      FROM sh JOIN bench USING (shingle)
      WHERE sh.sid % 97 <> 0
      GROUP BY sh.sid
    )
    SELECT t.sid AS doc_id, t.n_grams,
           coalesce(h.n_hit, 0) AS n_hit,
           round(coalesce(h.n_hit, 0) * 1.0 / t.n_grams, 6) AS overlap_frac,
           coalesce(h.n_hit, 0) * 2 >= t.n_grams AS contaminated
    FROM totals t LEFT JOIN hits h ON h.sid = t.sid
    """,
    doc="Benchmark-contamination check: distinct 5-gram overlap of every "
    "corpus doc against the benchmark set (here: doc_id % 97 == 0 as the "
    "held-out marker). The benchmark n-gram set is the distinct-gram "
    "aggregate of a tiny doc subset — broadcast to the corpus side, so "
    "the big table sees one map-side semi-match + one groupBy(doc) "
    "shuffle. This is how eval-suite decontamination runs at 100 TB: "
    "eval n-grams are millions of rows, corpus n-grams are trillions; "
    "only the small side is ever collected/broadcast.",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id").alias("sid"),
        F.explode(D.word_shingles(F.col("text"), 5)).alias("shingle"),
    )
    is_bench = F.col("sid") % 97 == 0
    bench = sh.filter(is_bench).select("shingle").distinct()
    corpus = sh.filter(~is_bench)
    # ONE corpus pass (r14): totals and hits used to be two separate
    # consumers of the un-persisted shingle explosion — the Python
    # shingle UDF ran over the full corpus twice and the two aggregates
    # joined back on sid. A left-outer broadcast join against the
    # DISTINCT benchmark grams (at most one match per corpus row, so
    # row multiplicity is preserved) lets one groupBy(sid) produce both
    # counts: count(*) = n_grams, count(_hit) = matching grams. Guide
    # §2.3 (aggregate before you shuffle) + §4.1 (opaque UDF stages are
    # not deduplicated by the optimizer): one UDF pass and one shuffle
    # replace two passes, two shuffles, and a join.
    marked = corpus.join(
        F.broadcast(bench.withColumn("_hit", F.lit(1))), "shingle", "left_outer"
    )
    return marked.groupBy("sid").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("_hit").alias("n_hit"),
    ).select(
        F.col("sid").alias("doc_id"),
        "n_grams",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("overlap_frac"),
        (F.col("n_hit") * 2 >= F.col("n_grams")).alias("contaminated"),
    )


@register(
    "repetition_profile",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
            FROM documents)
    ), wc AS (
      SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
    ), wstats AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
             round(max(c) * 1.0 / sum(c), 6) AS top_word_frac,
             round((sum(c) - count(*)) * 1.0 / sum(c), 6) AS dup_word_frac
      FROM wc GROUP BY doc_id
    ), bigrams AS (
      SELECT w1.doc_id, w1.w || ' ' || w2.w AS bg
      FROM words w1 JOIN words w2
        ON w1.doc_id = w2.doc_id AND w2.i = w1.i + 1
    ), bc AS (
      SELECT doc_id, bg, count(*) AS c FROM bigrams GROUP BY doc_id, bg
    ), bstats AS (
      SELECT doc_id,
             round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac,
             round((sum(c) - count(*)) * 1.0 / sum(c), 6) AS dup_bigram_frac
      FROM bc GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_tok, w.top_word_frac, w.dup_word_frac,
           b.top_bigram_frac, b.dup_bigram_frac,
           (w.top_word_frac >= 0.2 OR b.dup_bigram_frac >= 0.5) AS flagged
    FROM wstats w JOIN bstats b USING (doc_id)
    """,
    doc="Gopher-style repetition filters per document: top-word fraction, "
    "duplicate-word fraction, top-/duplicate-bigram fraction, and the "
    "flag their thresholds imply (Rae et al. 2021 quality heuristics, "
    "word-level because the fixtures are single-line). Bigrams are built "
    "with zip_with over two array slices — no positional self-join; the "
    "four exchanges are the (doc,term)/(doc) agg pairs of the two "
    "branches, all partial-aggregated map-side, joined by doc_id at "
    "per-doc cardinality (broadcast at this SF).",
)
def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim("text"), r"\s+")
    toks = docs.select("doc_id", F.explode(ws).alias("w"))
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    wstats = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_word_frac"),
        F.round((F.sum("c") - F.count(F.lit(1))) / F.sum("c"), 6).alias(
            "dup_word_frac"
        ),
    )
    n = F.size(ws)
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )
    bc = bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    bstats = bc.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"),
        F.round((F.sum("c") - F.count(F.lit(1))) / F.sum("c"), 6).alias(
            "dup_bigram_frac"
        ),
    )
    return (
        wstats.join(bstats, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            "top_word_frac",
            "dup_word_frac",
            "top_bigram_frac",
            "dup_bigram_frac",
            (
                (F.col("top_word_frac") >= 0.2)
                | (F.col("dup_bigram_frac") >= 0.5)
            ).alias("flagged"),
        )
    )


_PACK_BUDGET = 512  # tokens per training sequence


@register(
    "sequence_packing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM documents
    ), packed AS (
      SELECT doc_id, source, n_tok,
             CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - n_tok AS BIGINT) AS off
      FROM tok
    )
    SELECT doc_id, source, n_tok, off,
           CAST(floor(off / {_PACK_BUDGET}.0) AS BIGINT) AS seq_first,
           CAST(floor((off + n_tok - 1) / {_PACK_BUDGET}.0) AS BIGINT)
             AS seq_last
    FROM packed
    """,
    doc="Concat-and-chunk sequence packing for LM training: within each "
    f"source shard, docs concatenate in doc_id order and split into "
    f"{_PACK_BUDGET}-token sequences; each doc's byte-offset arithmetic "
    "(offset, first/last sequence id) comes from one running-sum window "
    "per shard. Sharded packing is the 100 TB shape: the window "
    "partitions by source, so every shard's prefix-sum runs in parallel "
    "and no global single-partition window exists (a corpus-global pack "
    "would instead do per-partition partials + a broadcast prefix "
    "offset join — same math, two stages).",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("off")
    packed = tok.select("doc_id", "source", "n_tok", off)
    return packed.select(
        "doc_id",
        "source",
        "n_tok",
        "off",
        F.floor(F.col("off") / _PACK_BUDGET).alias("seq_first"),
        F.floor((F.col("off") + F.col("n_tok") - 1) / _PACK_BUDGET).alias(
            "seq_last"
        ),
    )


@register(
    "mixture_rebalance_lang",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n_before FROM documents GROUP BY lang
    ), rates AS (
      SELECT lang, n_before,
             CAST((SELECT min(n_before) FROM counts) AS DOUBLE) / n_before
               AS rate
      FROM counts
    ), kept AS (
      SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN rates r USING (lang)
      WHERE ((d.doc_id % 1000003) * 1103515245 + 12345) % 1000000
            < CAST(floor(r.rate * 1000000) AS BIGINT)
      GROUP BY d.lang
    )
    SELECT r.lang, r.n_before, coalesce(k.n_kept, 0) AS n_kept,
           round(r.rate, 6) AS rate
    FROM rates r LEFT JOIN kept k USING (lang)
    """,
    doc="Mixture rebalancing to a uniform language target: per-language "
    "keep-rate = min(count)/count, applied as a deterministic Bernoulli "
    "gate on a multiplicative hash of doc_id (LCG constants; pure "
    "integer arithmetic so both engines agree bit-for-bit, and the "
    "pre-mod by 1000003 keeps the product inside BIGINT under ANSI "
    "overflow checks at any id scale — reproducible across runs, "
    "unlike sample()). The rates table is a "
    "per-language aggregate (dozens of rows) broadcast back onto the "
    "corpus, so rebalancing any size corpus is one agg + one map-side "
    "filtered pass — the downsample never shuffles the big table.",
)
def mixture_rebalance_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    min_n = counts.agg(F.min("n_before").cast("double").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "lang", "n_before", (F.col("min_n") / F.col("n_before")).alias("rate")
    )
    kept = (
        docs.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(
            F.pmod(
                F.pmod("doc_id", F.lit(1000003)) * 1103515245 + 12345,
                F.lit(1000000),
            )
            < F.floor(F.col("rate") * 1000000)
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "lang", "left_outer")
        .select(
            "lang",
            "n_before",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round("rate", 6).alias("rate"),
        )
    )


@register(
    "train_export_shuffle",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents ORDER BY shuffle_key, doc_id LIMIT 100
    """,
    doc="Deterministic global training-export shuffle: order by "
    "md5(doc_id) — reproducible across engines/runs (sample seeds are "
    "not) — taking the first 100 as the checked prefix. The plan is "
    "TakeOrderedAndProject: per-partition top-k heaps merged at the "
    "driver, never a full global sort; the full-export variant writes "
    "repartitionByRange(shuffle_key) files, same key, no driver "
    "bottleneck.",
)
def train_export_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string")).alias("shuffle_key")
    return (
        docs.select("doc_id", key)
        .orderBy("shuffle_key", "doc_id")
        .limit(100)
    )
