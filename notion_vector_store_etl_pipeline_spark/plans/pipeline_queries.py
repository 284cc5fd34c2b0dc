"""Training-data pipeline queries, wave 4: deterministic splits,
domain blocklists, linear quality-classifier scoring, winnowing
fingerprints, Z-order layout keys, and Bloom-filter pre-join pruning.

These extend the reference's curation surface (the ETL pipeline selects
and transforms documents before embedding — `Notion_openai_vector_etl.py`
filters by block type and dedups by content hash) with the operations a
100 TB training-data pipeline runs between ingestion and export. All
cross-engine hashes use the md5-prefix convention (first 15 hex chars as
a 60-bit bigint) so the DuckDB oracle computes bit-identical values.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


def _md5_bigint(col) -> F.Column:
    """Portable 60-bit hash: identical in Spark (conv) and DuckDB
    (CAST('0x'||substr(md5(x),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


_MD5_SQL = "CAST(CONCAT('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT doc_id, bucket,
           CASE WHEN bucket < 980 THEN 'train'
                WHEN bucket < 990 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             {_MD5_SQL.format(x="'split42|' || CAST(doc_id AS VARCHAR)")} % 1000 AS bucket
      FROM documents
    )
    """,
    doc="Deterministic train/val/test split by salted content-key hash "
    "(98/1/1): the split is a pure function of the id, so re-running the "
    "pipeline, adding data, or changing cluster size never moves a "
    "document across splits (no sampling state to store). Narrow, "
    "zero-shuffle, scales to any size; the salt isolates this split "
    "from other hash uses of the same key.",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = _md5_bigint(F.concat(F.lit("split42|"), F.col("doc_id").cast("string")))
    bucket = F.pmod(h, F.lit(1000))
    split = (
        F.when(bucket < 980, "train").when(bucket < 990, "val").otherwise("test")
    )
    return docs.select("doc_id", bucket.alias("bucket"), split.alias("split"))


@register(
    "domain_blocklist_filter",
    oracle="""
    SELECT doc_id, domain
    FROM (
      SELECT doc_id, source || '.cdn.example.org' AS domain
      FROM documents
    )
    WHERE domain NOT IN ('src2.cdn.example.org', 'src4.cdn.example.org',
                         'spam.example.net')
    """,
    doc="Domain blocklist filtering (the C4/RefinedWeb curation step): "
    "parse the host out of each document URL, anti-join against the "
    "blocklist. The blocklist is a tiny dimension -> broadcast anti-join, "
    "no shuffle of the 100 TB side; the URL parse is a JVM expression "
    "(parse_url), not a Python UDF.",
)
def domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".cdn.example.org/p/"),
        F.col("doc_id").cast("string"),
    )
    with_domain = docs.select(
        "doc_id", F.parse_url(url, F.lit("HOST")).alias("domain")
    )
    blocklist = spark.createDataFrame(
        [("src2.cdn.example.org",), ("src4.cdn.example.org",), ("spam.example.net",)],
        "domain string",
    )
    return with_domain.join(F.broadcast(blocklist), "domain", "left_anti").select(
        "doc_id", "domain"
    )


@register(
    "classifier_score_linear",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), tf AS (
      SELECT tok, count(DISTINCT doc_id) AS df
      FROM toks WHERE tok <> '' GROUP BY tok
    ), vocab AS (
      SELECT tok, round(ln(1 + df) / 10 - 0.25, 6) AS w
      FROM (SELECT tok, df, row_number() OVER (ORDER BY df DESC, tok) AS rn FROM tf)
      WHERE rn <= 40
    ), s AS (
      SELECT t.doc_id, count(*) AS n_hits, sum(v.w) AS sw
      FROM toks t JOIN vocab v USING (tok)
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(s.n_hits, 0) AS BIGINT) AS n_hits,
           round(1 / (1 + exp(-coalesce(s.sw, 0.0))), 6) AS score
    FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
    doc="Linear quality-classifier scoring (the fastText-style filter "
    "used to curate web corpora): tokenize, join a small vocabulary of "
    "(token, weight) rows, sum weights per document, squash with a "
    "sigmoid. The vocabulary here is derived in-plan (top-40 tokens by "
    "document frequency, weight = ln(1+df)/10 - 0.25) so the whole query "
    "is deterministic and oracle-checkable; in production the weights "
    "table is a trained artifact loaded the same way. Scale shape: the "
    "vocabulary is broadcast (never a shuffle of the corpus side), the "
    "per-doc sum is one partial-aggregated shuffle on doc_id.",
)
def classifier_score_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    from pyspark.sql import Window

    rn = F.row_number().over(Window.orderBy(F.col("df").desc(), F.col("tok").asc()))
    vocab = (
        tf.withColumn("rn", rn)
        .filter(F.col("rn") <= 40)
        .select("tok", F.round(F.log(F.lit(1) + F.col("df")) / 10 - 0.25, 6).alias("w"))
    )
    s = (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"), F.sum("w").alias("sw"))
    )
    return docs.join(s, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        F.round(F.lit(1) / (F.lit(1) + F.exp(-F.coalesce("sw", F.lit(0.0)))), 6).alias(
            "score"
        ),
    )


_WINNOW_W = 4  # window size (guarantee: every gap of >= W shingles is fingerprinted)


@register(
    "winnowing_fingerprint",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ), hs AS (
      SELECT doc_id,
             list_transform(
               range(1, len(ws) - 1),
               i -> {_MD5_SQL.format(x="ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")}
             ) AS h
      FROM words WHERE len(ws) >= 3 + {_WINNOW_W} - 1
    ), sel AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(1, len(h) - {_WINNOW_W} + 2),
               i -> list_aggregate(list_slice(h, i, i + {_WINNOW_W} - 1), 'min')
             ))) AS fps
      FROM hs
    )
    SELECT doc_id,
           CAST(len(fps) AS INTEGER) AS n_selected,
           sha256(array_to_string(fps, chr(31))) AS fingerprint
    FROM sel
    """,
    doc="Winnowing fingerprint (Schleimer et al., SIGMOD'03 — the MOSS "
    "local fingerprinting scheme): hash every word 3-gram, slide a "
    f"window of {_WINNOW_W} hashes, keep each window's minimum. Guarantees "
    "every match of length >= w+k-1 shares a selected hash, at ~2/(w+1) "
    "sampling density — the robust fingerprint for partial-overlap "
    "detection (vs doc_fingerprint's whole-set hash). Pure array HOFs: "
    "narrow, zero-shuffle, stays in codegen per document.",
)
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Each derived array (`ws`, `h`) MUST be materialized as its own
    # projection before the next stage references it inside a lambda:
    # codegen subexpression elimination does not reach inside
    # higher-order-function lambdas, so an inlined array expression
    # re-evaluates once PER LAMBDA INVOCATION — inlining `h` into the
    # window-min slice made the hashing O(n_words^2) per doc (56 s vs
    # 0.5 s at sf0.001), and inlining `ws` into the shingle lambda
    # re-split the text 3x per shingle (8.2 s vs 1.1 s at sf0.1). As
    # bound attributes each evaluates once per row; the projects stay
    # uncollapsed because the non-cheap columns are multiply referenced.
    ws = F.split(F.trim("text"), r"\s+")
    words = docs.select("doc_id", ws.alias("ws")).filter(
        F.size("ws") >= 3 + _WINNOW_W - 1
    )
    wsc = F.col("ws")
    # ordered 3-gram shingle hashes (1-based element_at)
    h = F.transform(
        F.sequence(F.lit(1), F.size(wsc) - 2),
        lambda i: _md5_bigint(
            F.concat_ws(
                " ",
                F.element_at(wsc, i),
                F.element_at(wsc, i + 1),
                F.element_at(wsc, i + 2),
            )
        ),
    )
    hashed = words.select("doc_id", h.alias("h"))
    hh = F.col("h")
    win_mins = F.transform(
        F.sequence(F.lit(1), F.size(hh) - (_WINNOW_W - 1)),
        lambda i: F.array_min(F.slice(hh, i, _WINNOW_W)),
    )
    sel = F.array_sort(F.array_distinct(win_mins))
    return (
        hashed.select("doc_id", sel.alias("fps"))
        .select(
            "doc_id",
            F.size("fps").alias("n_selected"),
            F.sha2(
                F.concat_ws("\x1f", F.transform("fps", lambda x: x.cast("string"))), 256
            ).alias("fingerprint"),
        )
    )


_ZBITS = 8


def _interleave_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "zorder_layout",
    oracle=f"""
    SELECT o_orderkey, x, y, zval, zval >> 8 AS zbucket
    FROM (
      SELECT o_orderkey,
             o_custkey % 256 AS x,
             CAST(floor(o_totalprice) AS BIGINT) % 256 AS y,
             ({_interleave_sql("(o_custkey % 256)", "(CAST(floor(o_totalprice) AS BIGINT) % 256)")}) AS zval
      FROM orders
    )
    """,
    doc="Z-order (Morton) layout key: interleave the low 8 bits of two "
    "filter columns into one clustering value. Sorting/range-partitioning "
    "the table by zval co-locates rows that are close in BOTH dimensions, "
    "so min/max zone maps prune scans for predicates on either column — "
    "the data-layout optimization behind Delta/Iceberg Z-ordering, "
    "expressed as pure integer bit arithmetic (codegen, zero shuffle to "
    "compute; one range exchange to actually lay out, which is the point).",
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = F.pmod(F.col("o_custkey"), F.lit(256))
    y = F.pmod(F.floor("o_totalprice"), F.lit(256))
    z = reduce(
        lambda a, b: a.bitwiseOR(b),
        [
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            for i in range(_ZBITS)
        ]
        + [
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            for i in range(_ZBITS)
        ],
    )
    return orders.select(
        "o_orderkey",
        x.alias("x"),
        y.alias("y"),
        z.alias("zval"),
        F.shiftright(z, 8).alias("zbucket"),
    )


@register(
    "bloom_prejoin_filter",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
    doc="Bloom-filter pre-join pruning (the runtime-filter pattern), "
    "built distributed from pure JVM expressions: the filtered build "
    "side's keys hash to k=3 bit positions (xxhash64 with distinct "
    "seeds), positions bit_or-aggregate into (word_idx, word) rows — a "
    "distributed Bloom build densified into one m/8-byte array shipped "
    "as a ONE-ROW broadcast. Each probe row then tests its own k bits "
    "ROW-LOCALLY (O(1) element_at + shiftright in the probe's filter) "
    "— no explode, no row-expanding join, no shuffle before the final "
    "exact semi-join that removes false positives; every probe column "
    "is a pure row function, so speculative/retried stages reproduce "
    "identical rows. At 100 TB "
    "this is the difference between shuffling the full probe table and "
    "shuffling the fraction that survives — what AQE's runtime filters "
    "do, made explicit and testable (Spark 4.1 does not expose "
    "bloom_filter_agg in SQL, so the sketch is composed from "
    "shiftleft/bit_or/pmod).",
)
def bloom_prejoin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.bloom import (
        bloom_prejoin_semi,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    exact = bloom_prejoin_semi(
        customer.select("c_custkey", "c_mktsegment"), urgent, "c_custkey", "o_custkey"
    )
    return exact.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_customers"))


_ISLAND_GAP_US = 30_000_000  # 30s activity envelope per event


@register(
    "interval_merge_islands",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s, epoch_us(ts) + {_ISLAND_GAP_US} AS e
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
      FROM flagged
    )
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
           min(s) AS start_us, max(e) AS end_us,
           count(*) AS n_events
    FROM islands GROUP BY user_id, island_id
    """,
    doc="Gaps-and-islands interval coalescing: each event opens a 30s "
    "activity envelope; overlapping envelopes per user merge into "
    "islands (the running-max trick: an interval starts a new island "
    "iff its start exceeds the max end of ALL preceding intervals — "
    "plain lag(end) is wrong when an earlier long interval swallows a "
    "later short one). One hash partition per user, one window pass, "
    "no self-join — the scalable form of interval merging; the same "
    "shape backs session repair, downtime stitching, and time-range "
    "compaction of hypertable chunks.",
)
def interval_merge_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_ISLAND_GAP_US)).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "is_new", (prev_max_end.isNull() | (F.col("s") > prev_max_end)).cast("int")
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("start_us"),
        F.max("e").alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "dq_expectations",
    oracle="""
    SELECT 'l_quantity_in_range' AS rule,
           (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50) AS n_violations
    UNION ALL
    SELECT 'l_discount_in_range',
           (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1)
    UNION ALL
    SELECT 'o_totalprice_nonnegative',
           (SELECT count(*) FROM orders WHERE o_totalprice < 0)
    UNION ALL
    SELECT 'orders_pk_unique',
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
    UNION ALL
    SELECT 'lineitem_fk_orders',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    """,
    doc="Data-quality expectation gate (the Deequ/Great-Expectations "
    "pattern): range checks, primary-key uniqueness, and referential "
    "integrity computed as a handful of aggregates — the range rules "
    "fold into ONE pass over each table (conditional count_if-style "
    "sums, not one scan per rule), uniqueness is one agg, and the FK "
    "check is a single anti-join. Output is (rule, n_violations) rows: "
    "a pipeline quarantines or aborts on any nonzero row before "
    "publishing a snapshot downstream.",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    li_rules = lineitem.agg(
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("bigint")
        ).alias("l_quantity_in_range"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("bigint")
        ).alias("l_discount_in_range"),
    )
    o_rules = orders.agg(
        F.sum((F.col("o_totalprice") < 0).cast("bigint")).alias("o_totalprice_nonnegative"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("orders_pk_unique"),
    )
    fk = lineitem.join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == orders.o_orderkey,
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("lineitem_fk_orders"))

    def melt(df: DataFrame) -> DataFrame:
        return df.unpivot([], df.columns, "rule", "n_violations")

    return melt(li_rules).unionByName(melt(o_rules)).unionByName(melt(fk))


@register(
    "heavy_hitters_topk",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), counts AS (
      SELECT tok, count(*) AS n FROM toks WHERE tok <> '' GROUP BY tok
    ), exact AS (
      SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rn FROM counts
    )
    SELECT tok, n, TRUE AS in_sketch FROM exact WHERE rn <= 9
    """,
    doc="Heavy hitters via the approx_top_k sketch (Spark 4's "
    "frequent-items aggregate — mergeable across partitions, the 100 TB "
    "path for 'hot domains / hot tokens' monitoring where an exact "
    "global group-by is wasteful). Checked like the HLL query: the "
    "output rows are the EXACT top-9 tokens (deterministic), plus a "
    "boolean asserting each one appears in the sketch's result with "
    "the same count — the sketch tracks far more slots (65536) than "
    "the fixture vocabulary, so agreement is required, and a sketch "
    "regression fails the driver check instead of hiding behind "
    "rows-only. k=9 keeps the exact boundary tie-free at all fixture "
    "scales (rank 10/11 tie at sf0.01).",
)
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")

    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    rn = F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("tok").asc()))
    exact9 = counts.withColumn("rn", rn).filter(F.col("rn") <= 9).select("tok", "n")

    sketch = toks.agg(
        F.explode(F.expr("approx_top_k(tok, 9, 65536)")).alias("item")
    ).select(
        F.col("item.item").alias("s_tok"), F.col("item.count").alias("s_n")
    )
    return exact9.join(
        F.broadcast(sketch), exact9.tok == sketch.s_tok, "left"
    ).select(
        "tok",
        "n",
        (F.col("s_n").isNotNull() & (F.col("s_n") == F.col("n"))).alias("in_sketch"),
    )


@register(
    "outlier_mad_filter",
    oracle="""
    WITH med AS (
      SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars) AS m FROM documents
    ), mad AS (
      SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(n_chars - (SELECT m FROM med))) AS d
      FROM documents
    )
    SELECT doc_id, n_chars,
           round((SELECT m FROM med), 6) AS median_chars,
           round((SELECT d FROM mad), 6) AS mad_chars,
           abs(n_chars - (SELECT m FROM med)) > 3 * (SELECT d FROM mad) AS is_outlier
    FROM documents
    """,
    doc="Robust outlier filtering by median absolute deviation (the "
    "length-outlier pass of corpus cleaning — MAD tolerates the heavy "
    "tail that makes mean/stddev cutoffs useless on web text): two "
    "scalar aggregates (median, then median absolute deviation) "
    "broadcast back over the table; the 100 TB shape is two reduce "
    "passes + one narrow map, no shuffle of the corpus. Exact "
    "interpolated percentile in both engines.",
)
def outlier_mad_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(n_chars, 0.5)").alias("m"))
    dev = docs.join(F.broadcast(med)).select(
        "doc_id", "n_chars", "m", F.abs(F.col("n_chars") - F.col("m")).alias("ad")
    )
    mad = dev.agg(F.expr("percentile(ad, 0.5)").alias("d"))
    return dev.join(F.broadcast(mad)).select(
        "doc_id",
        "n_chars",
        F.round("m", 6).alias("median_chars"),
        F.round("d", 6).alias("mad_chars"),
        (F.col("ad") > 3 * F.col("d")).alias("is_outlier"),
    )
