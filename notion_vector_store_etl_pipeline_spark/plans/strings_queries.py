"""Scalar string/projection queries (SURVEY.md §2.4 P1-P9): coalesce
projections, title fallback, url basename, uuid normalization, regex id
extraction, safe filenames, bool/int parsing, sha256 hashing.

URL-ish inputs are synthesized deterministically from `documents`
columns with identical expressions on both engines, so the oracle is
self-contained over the registered views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.functions import strings as S
from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "regexp_extract_all_numbers",
    oracle="""
    SELECT doc_id,
           -- DuckDB array_to_string yields NULL for an empty list; Spark's
           -- array_join yields '' — coalesce to match
           coalesce(array_to_string(regexp_extract_all(text, '[0-9]+'), ','), '') AS nums_csv,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_nums,
           coalesce(try_cast(regexp_extract_all(text, '[0-9]+')[1] AS BIGINT), -1) AS first_num
    FROM documents
    """,
    doc="regexp_extract_all into an ARRAY<STRING> column + element access "
    "with a try_cast/-1 default — multi-match extraction stays one "
    "JVM-side expression (vs the reference's re.search single match, `:81`). "
    "The array is emitted as a canonical csv string (array_join) so the "
    "driver's value hasher — which cannot hash python lists — can check it.",
)
def regexp_extract_all_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nums = F.regexp_extract_all("text", F.lit("[0-9]+"))
    return docs.select(
        "doc_id",
        F.array_join(nums, ",").alias("nums_csv"),
        F.size(nums).alias("n_nums"),
        F.coalesce(F.try_element_at(nums, F.lit(1)).cast("bigint"), F.lit(-1)).alias("first_num"),
    )


@register(
    "map_explode_props",
    oracle="""
    SELECT k AS key, count(*) AS n,
           -- DuckDB sum(BIGINT) widens to HUGEINT (int128); cast back so the
           -- driver's value hash agrees with Spark's int64
           CAST(sum(CAST(json_extract(props, '$.' || k) AS BIGINT)) AS BIGINT) AS sum_value
    FROM events, unnest(json_keys(props)) AS t(k)
    GROUP BY k
    """,
    doc="MapType end-to-end: parse the JSON payload into MAP<STRING,BIGINT> "
    "with from_json, explode to (key, value) rows, aggregate per key — "
    "schema-on-read for payloads whose keys are data, not schema.",
)
def map_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        events.select(F.explode(m).alias("key", "value"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


@register(
    "hash_sha2",
    oracle="""
    SELECT doc_id, sha256(text) AS text_sha FROM documents
    """,
    doc="Content hashing (reference A3 hash_file) — sha2 is bit-identical to hashlib.",
)
def hash_sha2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2("text", 256).alias("text_sha"))


@register(
    "url_basename",
    oracle="""
    SELECT doc_id,
           url,
           -- DuckDB has no percent-decoder; replace('%20',' ') is exact
           -- here because the URL is constructed in-query (source is
           -- srcN, doc_id numeric) so %20 is the only escape present.
           -- The engine helper's full unquote semantics ('+' literal,
           -- any %XX, malformed passthrough) are pinned in
           -- tests/test_operator_edges.py.
           replace(regexp_extract(regexp_replace(string_split(url, '?')[1], '/+$', ''),
                                  '([^/]*)$', 1), '%20', ' ') AS display_name
    FROM (
      SELECT doc_id,
             'https://files.example.com/' || source || '/doc%20' || CAST(doc_id AS VARCHAR)
               || '.pdf?sig=abc&x=1' AS url
      FROM documents
    )
    """,
    doc="Display-name derivation (reference P4 `:63-69`): strip query, basename, decode.",
)
def url_basename(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://files.example.com/"),
        F.col("source"),
        F.lit("/doc%20"),
        F.col("doc_id").cast("string"),
        F.lit(".pdf?sig=abc&x=1"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        S.url_basename(url).alias("display_name"),
    )


@register(
    "uuid_normalize",
    oracle="""
    SELECT doc_id, raw_id,
           CASE WHEN regexp_matches(bare, '^[0-9a-f]{32}$') THEN
             substr(bare,1,8) || '-' || substr(bare,9,4) || '-' || substr(bare,13,4)
               || '-' || substr(bare,17,4) || '-' || substr(bare,21,12)
           END AS normalized_id
    FROM (
      SELECT doc_id, raw_id, lower(replace(raw_id, '-', '')) AS bare FROM (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0 THEN substr(sha256(text), 1, 30)
                    ELSE upper(substr(sha256(text),1,8)) || '-' || substr(sha256(text),9,24)
               END AS raw_id
        FROM documents
      )
    )
    """,
    doc="UUID re-hyphenation with invalid->NULL error channel (reference P5 `:72-76`).",
)
def uuid_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.sha2("text", 256)
    raw = F.when(
        F.col("doc_id") % 10 == 0, F.substring(h, 1, 30)
    ).otherwise(
        F.concat(F.upper(F.substring(h, 1, 8)), F.lit("-"), F.substring(h, 9, 24))
    )
    return docs.select(
        "doc_id", raw.alias("raw_id"), S.normalize_uuid(raw).alias("normalized_id")
    )


@register(
    "regex_extract_id",
    oracle="""
    SELECT doc_id, nullif(regexp_extract(replace(url, '-', ''), '([0-9a-fA-F]{32})', 1), '')
             AS page_id
    FROM (
      SELECT doc_id,
             'https://notion.example.com/Page-' || substr(sha256(text),1,8) || '-'
               || substr(sha256(text),9,24) || CASE WHEN doc_id % 9 = 0 THEN 'zz' ELSE '' END
               AS url
      FROM documents
    )
    """,
    doc="32-hex id extraction from de-hyphenated url (reference P6 `:79-84`).",
)
def regex_extract_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.sha2("text", 256)
    url = F.concat(
        F.lit("https://notion.example.com/Page-"),
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 24),
        F.when(F.col("doc_id") % 9 == 0, F.lit("zz")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", S.extract_id_from_url(url).alias("page_id"))


@register(
    "safe_filename",
    oracle="""
    SELECT doc_id, name,
           coalesce(nullif(string_split(trim(name), '/')[-1], ''), 'file') AS filename
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN '  /downloads/' || source || '/  '
                  WHEN doc_id % 4 = 1 THEN 'report-' || CAST(doc_id AS VARCHAR) || '.pdf'
                  WHEN doc_id % 4 = 2 THEN '/a/b/c/img' || CAST(doc_id AS VARCHAR) || '.png'
                  ELSE '' END AS name
      FROM documents
    )
    """,
    doc="Safe-filename fallback chain (reference P7 `:152-154`).",
)
def safe_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    name = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("  /downloads/"), F.col("source"), F.lit("/  ")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("report-"), F.col("doc_id").cast("string"), F.lit(".pdf")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("/a/b/c/img"), F.col("doc_id").cast("string"), F.lit(".png")))
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", name.alias("name"), S.safe_filename(name).alias("filename"))


@register(
    "parse_bool_int",
    oracle="""
    SELECT doc_id,
           lower(trim(flag_str)) IN ('1','true','yes','y','on') AS flag,
           coalesce(TRY_CAST(trim(int_str) AS BIGINT), 42) AS int_val
    FROM (
      SELECT doc_id,
             CASE doc_id % 5 WHEN 0 THEN 'TRUE' WHEN 1 THEN ' on ' WHEN 2 THEN 'no'
                             WHEN 3 THEN '1' ELSE 'off' END AS flag_str,
             CASE doc_id % 3 WHEN 0 THEN CAST(doc_id AS VARCHAR) WHEN 1 THEN ' 17 '
                             ELSE 'not-a-number' END AS int_str
      FROM documents
    )
    """,
    doc="Env-style bool/int parsing with defaults (reference P8 `:52-55`, `:639-646`).",
)
def parse_bool_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flag_str = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("TRUE"))
        .when(F.col("doc_id") % 5 == 1, F.lit(" on "))
        .when(F.col("doc_id") % 5 == 2, F.lit("no"))
        .when(F.col("doc_id") % 5 == 3, F.lit("1"))
        .otherwise(F.lit("off"))
    )
    int_str = (
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id").cast("string"))
        .when(F.col("doc_id") % 3 == 1, F.lit(" 17 "))
        .otherwise(F.lit("not-a-number"))
    )
    return docs.select(
        "doc_id",
        S.parse_bool(flag_str).alias("flag"),
        S.parse_int(int_str, 42).alias("int_val"),
    )


@register(
    "project_coalesce",
    oracle="""
    SELECT doc_id,
           coalesce(page_id, database_id, block_id) AS parent_id,
           coalesce(nullif(trim(title), ''), 'doc-' || CAST(doc_id AS VARCHAR)) AS title,
           source AS src,
           n_chars
    FROM (
      SELECT doc_id, source, n_chars,
             CASE WHEN doc_id % 3 = 0 THEN 'pg-' || CAST(doc_id AS VARCHAR) END AS page_id,
             CASE WHEN doc_id % 3 = 1 THEN 'db-' || CAST(doc_id AS VARCHAR) END AS database_id,
             'blk-' || CAST(doc_id AS VARCHAR) AS block_id,
             CASE WHEN doc_id % 7 = 0 THEN '   ' ELSE substr(text, 1, 24) END AS title
      FROM documents
    )
    """,
    doc="Source-record projection with coalesce fallback chains "
    "(reference P1 `:550-579`, P3 title fallback `:131-138`).",
)
def project_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    page_id = F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("pg-"), sid))
    database_id = F.when(F.col("doc_id") % 3 == 1, F.concat(F.lit("db-"), sid))
    block_id = F.concat(F.lit("blk-"), sid)
    title = F.when(F.col("doc_id") % 7 == 0, F.lit("   ")).otherwise(F.substring("text", 1, 24))
    return docs.select(
        "doc_id",
        F.coalesce(page_id, database_id, block_id).alias("parent_id"),
        F.coalesce(F.nullif(F.trim(title), F.lit("")), F.concat(F.lit("doc-"), sid)).alias("title"),
        F.col("source").alias("src"),
        "n_chars",
    )


@register(
    "title_coalesce",
    oracle="""
    SELECT doc_id,
           coalesce(nullif(trim(array_to_string(list_transform(list_filter(props,
                      x -> x['type'] = 'title'), x -> x['text']), ' ')), ''),
                    CAST(doc_id AS VARCHAR)) AS title
    FROM (
      SELECT doc_id,
             [{'type': 'rich_text', 'text': source},
              {'type': 'title', 'text': CASE WHEN doc_id % 6 = 0 THEN '  ' ELSE substr(text, 1, 12) END},
              {'type': 'title', 'text': 'pt2'}] AS props
      FROM documents
    )
    """,
    doc="Title extraction from a rich-property array (reference P3 `:131-138`): "
    "filter array-of-structs to type='title', concat fragments, trim, "
    "fall back to the id — array HOFs end to end.",
)
def title_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frag = F.when(F.col("doc_id") % 6 == 0, F.lit("  ")).otherwise(F.substring("text", 1, 12))
    props = F.array(
        F.struct(F.lit("rich_text").alias("type"), F.col("source").alias("text")),
        F.struct(F.lit("title").alias("type"), frag.alias("text")),
        F.struct(F.lit("title").alias("type"), F.lit("pt2").alias("text")),
    )
    titles = F.transform(
        F.filter(props, lambda x: x.getField("type") == "title"),
        lambda x: x.getField("text"),
    )
    title = F.coalesce(
        F.nullif(F.trim(F.array_join(titles, " ")), F.lit("")),
        F.col("doc_id").cast("string"),
    )
    return docs.select("doc_id", title.alias("title"))
