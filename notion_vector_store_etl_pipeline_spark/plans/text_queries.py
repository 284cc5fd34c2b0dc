"""Text-analysis queries (north star, SURVEY.md §2.11): token stats,
BPE-ish token counting, language-ID heuristic, quality scoring,
document fingerprinting. All JVM-side built-ins (split / higher-order
array fns / regexp_extract_all) — zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.functions import text as T
from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "text_token_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
           round(avg(len(string_split_regex(trim(text), '\\s+'))), 4) AS avg_tokens,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
    doc="Per-language token statistics (tokenize -> aggregate).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.trim("text"), r"\s+"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).cast("bigint").alias("total_tokens"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{T.TOKEN_PATTERN}')) AS INTEGER) AS n_tokens
    FROM documents
    """,
    doc="BPE-ish regex token counting (letter runs | digit runs | symbols).",
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(T.regex_tokens(F.col("text"))).alias("n_tokens")
    )


def _marker_list_sql(markers: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{m}'" for m in markers) + "]"


_LANG_HITS_SQL = ",\n".join(
    f"       len(list_intersect(toks, {_marker_list_sql(m)})) AS h_{lang}"
    for lang, m in T.LANG_MARKERS.items()
)

_LANG_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN h_{lang} >= GREATEST(h_en, h_de, h_es, h_fr, h_zh) THEN '{lang}'"
        for lang in T.LANG_MARKERS
    )
    + " END"
)


@register(
    "lang_id_heuristic",
    oracle=f"""
    SELECT doc_id, lang, {_LANG_CASE_SQL} AS pred_lang
    FROM (
      SELECT doc_id, lang,
{_LANG_HITS_SQL}
      FROM (SELECT doc_id, lang,
                   list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks
            FROM documents)
    )
    """,
    doc="Marker-lexicon language ID: argmax of distinct marker-word hits, "
    "fixed priority order on ties.",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = {
        lang: T.marker_hits(F.col("text"), markers).alias(f"h_{lang}")
        for lang, markers in T.LANG_MARKERS.items()
    }
    with_hits = docs.select("doc_id", "lang", *hits.values())
    best = F.greatest(*[F.col(f"h_{lang}") for lang in T.LANG_MARKERS])
    pred = F
    expr = None
    for lang in T.LANG_MARKERS:
        cond = F.col(f"h_{lang}") >= best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return with_hits.select("doc_id", "lang", expr.alias("pred_lang"))


@register(
    "quality_score",
    oracle="""
    SELECT doc_id,
           n_chars,
           n_tokens,
           round(stop_ratio, 6) AS stopword_ratio,
           round(0.4 * least(n_tokens / 100.0, 1.0)
                 + 0.4 * stop_ratio
                 + 0.2 * least(n_chars / 400.0, 1.0), 6) AS quality
    FROM (
      SELECT doc_id, n_chars,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             len(list_intersect(list_distinct(toks),
                 ['the','a','an','of','and','to','in','is','on','for'])) * 1.0
               / greatest(len(list_distinct(toks)), 1) AS stop_ratio
      FROM (SELECT doc_id, n_chars,
                   string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    )
    """,
    doc="Heuristic quality scoring: length + stopword-presence features "
    "(distinct-token stopword ratio so both engines agree exactly).",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    dtoks = F.array_distinct(toks)
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(dtoks, lambda t: t.isin(*T.STOPWORDS))).cast("double")
        / F.greatest(F.size(dtoks), F.lit(1)).cast("double")
    )
    quality = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.4 * stop_ratio
        + 0.2 * F.least(F.col("n_chars") / F.lit(400.0), F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT s.doc_id,
           sha256(array_to_string(list_sort(list(DISTINCT s.shingle)), chr(31))) AS fingerprint
    FROM (
      -- list_filter drops empty edge tokens (non-space edge whitespace
      -- survives trim) to match the engine's Python str.split() — see
      -- the note on _SHINGLES_CTE in dedup_queries.py
      SELECT w1.doc_id, w1.w || ' ' || w2.w || ' ' || w3.w AS shingle
      FROM (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws,1) AS i
            FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws FROM documents)) w1
      JOIN (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws,1) AS i
            FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws FROM documents)) w2
        ON w1.doc_id = w2.doc_id AND w2.i = w1.i + 1
      JOIN (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws,1) AS i
            FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws FROM documents)) w3
        ON w1.doc_id = w3.doc_id AND w3.i = w1.i + 2
    ) s
    GROUP BY s.doc_id
    """,
    doc="Document fingerprint: sha256 over the sorted distinct 3-gram "
    "shingle set (set-semantics fingerprint, order-insensitive).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    shingles = word_shingles(F.col("text"), 3)
    fp = F.sha2(F.concat_ws("\x1f", F.array_sort(shingles)), 256)
    return docs.filter(F.size(shingles) > 0).select("doc_id", fp.alias("fingerprint"))
