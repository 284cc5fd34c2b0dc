"""Training-data pipeline operators, wave 2: TF-IDF term scoring,
deterministic stratified sampling, hypertable-style multi-granularity
time rollup, and dataset profiling — the curation/QA surface a
large-scale corpus pipeline needs around the core dedup/similarity
operators (north-star scope, extends `text_queries.py`/`dedup_queries.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rn FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    doc="Per-document top-3 TF-IDF terms: tokenize -> tf (doc,term) -> "
    "document frequency -> idf join -> ranked window. The df table is "
    "broadcast-size after aggregation; tf never leaves its doc_id "
    "partitioning between the groupBy and the window.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row scalar inside the SAME plan — no
    # separate count() action, so the whole thing is one job at any scale
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    # tf feeds two consumers (the df aggregate and the scoring join),
    # but NO persist: both branches shuffle on the same (doc_id, term)
    # key, so ReuseExchange dedups the tokenize + tf exchange already —
    # an explicit eager persist was A/B'd in r14 and measured 2.5x
    # SLOWER (0.69 -> 1.74 s at sf0.1): it added a materialization pass
    # for work the planner was not repeating (OPTIMIZATION_r14.md).
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@register(
    "stratified_sample_per_group",
    oracle="""
    SELECT doc_id, lang, rn FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
    doc="Deterministic stratified sampling: fixed per-language quota, "
    "selection order = content-independent hash of the id (reproducible "
    "across runs/engines, unlike rand()-based sampleBy). One shuffle on "
    "the stratum key; WindowGroupLimit prunes per partition at scale.",
)
def stratified_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.sha2(F.col("doc_id").cast("string"), 256), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "rn")
    )


@register(
    "time_rollup_multi",
    oracle="""
    WITH base AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
             strftime(date_trunc('day',  ts), '%Y-%m-%d %H:%M:%S') AS day_bucket,
             value
      FROM events
    )
    SELECT event_type, hour_bucket, day_bucket,
           grouping(hour_bucket) + 2 * grouping(day_bucket) AS gid,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM base
    GROUP BY GROUPING SETS ((event_type, hour_bucket), (event_type, day_bucket))
    """,
    doc="Hypertable-style continuous-aggregate rollup: hourly AND daily "
    "per-type aggregates in ONE pass via GROUPING SETS (one shuffle, "
    "Expand feeds the partial aggregate) instead of two scans.",
)
def time_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    events.select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss").alias("day_bucket"),
        "value",
    ).createOrReplaceTempView("events_rollup_base")
    return spark.sql(
        """
        SELECT event_type, hour_bucket, day_bucket,
               grouping(hour_bucket) + 2 * grouping(day_bucket) AS gid,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events_rollup_base
        GROUP BY GROUPING SETS ((event_type, hour_bucket), (event_type, day_bucket))
        """
    )


@register(
    "profile_columns",
    oracle="""
    SELECT 'documents' AS tbl, count(*) AS n_rows,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT source) AS n_sources,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_texts,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    """,
    doc="Dataset profiling in one pass (row count, cardinalities, null "
    "counts, min/max/avg) — the QA gate before a training run; all "
    "conditional aggregation, single shuffle to one reducer.",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.lit("documents").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).cast("long").alias("null_texts"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "curation_funnel",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, text,
             round(0.4 * least(CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INTEGER) / 100.0, 1.0)
                 + 0.4 * (len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
                       ['the','a','an','of','and','to','in','is','on','for'])) * 1.0
                     / greatest(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))), 1))
                 + 0.2 * least(n_chars / 400.0, 1.0), 6) AS quality
      FROM documents
    ),
    kept AS (SELECT * FROM scored WHERE quality >= 0.5),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
          ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT doc_id, lang, quality, qrank FROM (
      SELECT doc_id, lang, quality,
             CAST(row_number() OVER (
               PARTITION BY lang ORDER BY quality DESC, doc_id) AS INTEGER) AS qrank
      FROM deduped
    ) WHERE qrank <= 25
    """,
    doc="The full curation funnel in ONE declarative pipeline: quality "
    "scoring -> threshold filter -> exact near-dup removal (normalized "
    "content hash, first-wins) -> per-language top-25 by quality. Each "
    "stage shrinks the data before the next shuffle; the expensive "
    "stages (hash, window) only ever see survivors.",
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from notion_vector_store_etl_pipeline_spark.functions import text as T
    from notion_vector_store_etl_pipeline_spark.operators.dedup import normalized_text

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    dtoks = F.array_distinct(toks)
    stop_ratio = (
        F.size(F.filter(dtoks, lambda t: t.isin(*T.STOPWORDS))).cast("double")
        / F.greatest(F.size(dtoks), F.lit(1)).cast("double")
    )
    quality = F.round(
        0.4 * F.least(F.size(toks) / F.lit(100.0), F.lit(1.0))
        + 0.4 * stop_ratio
        + 0.2 * F.least(F.col("n_chars") / F.lit(400.0), F.lit(1.0)),
        6,
    )
    kept = docs.select("doc_id", "lang", "text", quality.alias("quality")).filter(
        F.col("quality") >= 0.5
    )
    w_dedup = Window.partitionBy(F.sha2(normalized_text(F.col("text")), 256)).orderBy(
        "doc_id"
    )
    deduped = kept.withColumn("rn", F.row_number().over(w_dedup)).filter(F.col("rn") == 1)
    w_rank = Window.partitionBy("lang").orderBy(F.col("quality").desc(), F.col("doc_id"))
    return (
        deduped.withColumn("qrank", F.row_number().over(w_rank))
        .filter(F.col("qrank") <= 25)
        .select("doc_id", "lang", "quality", "qrank")
    )


@register(
    "label_centroids",
    oracle="""
    SELECT label, pos, round(avg(component), 6) AS centroid_val, count(*) AS n_vectors
    FROM (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS component
      FROM embeddings
    )
    GROUP BY label, pos
    """,
    doc="Per-label embedding centroids via posexplode -> (label, dim) "
    "mean: the reshape that turns array columns into a long form Spark "
    "can aggregate natively (no Python, one shuffle keyed by label+dim). "
    "The inverse gather (array_agg ordered by pos) rebuilds vectors; "
    "centroid tables feed the IVF index (`knn_ivf_approx`).",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "comp"))
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg(F.col("comp").cast("double")), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )
