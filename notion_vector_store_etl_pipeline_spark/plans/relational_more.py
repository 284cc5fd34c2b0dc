"""Second wave of engine-added relational surface (SURVEY.md §2.7-§2.8
"absent in reference → add anyway"): ranking-window family
(ntile/cume_dist/percent_rank), GROUPING SETS with grouping_id,
full-outer join with both-sided null coalescing, running totals over
an ordered frame, and array higher-order functions (the Spark-native
way to express per-row list analytics without a Python UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "window_ntile_cume",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ntile(4)        OVER w AS price_quartile,
           round(cume_dist()    OVER w, 6) AS cume,
           round(percent_rank() OVER w, 6) AS pct_rank
    FROM orders
    WHERE o_orderkey <= 1000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Ranking-window family: ntile/cume_dist/percent_rank with a unique "
    "(o_totalprice, o_orderkey) sort so tile assignment is deterministic.",
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT n.n_name, c.c_mktsegment,
           grouping(n.n_name) + 2 * grouping(c.c_mktsegment) AS gid,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), (n.n_name, c.c_mktsegment), ())
    """,
    doc="GROUPING SETS with grouping_id disambiguation of the NULL-filled "
    "grouping columns (per-nation, per-segment, cross, and grand total in one pass).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust.join(nation, cust.c_nationkey == nation.n_nationkey).createOrReplaceTempView(
        "cust_nation_gs"
    )
    return spark.sql(
        """
        SELECT n_name, c_mktsegment,
               grouping(n_name) + 2 * grouping(c_mktsegment) AS gid,
               count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_bal
        FROM cust_nation_gs
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment), ())
        """
    )


@register(
    "join_full_outer_coalesce",
    oracle="""
    WITH o AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                      count(*) AS n_orders
               FROM orders GROUP BY 1),
         s AS (SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
                      count(*) AS n_shipments
               FROM lineitem GROUP BY 1)
    SELECT coalesce(o.yr, s.yr) AS yr,
           coalesce(o.n_orders, 0)    AS n_orders,
           coalesce(s.n_shipments, 0) AS n_shipments
    FROM o FULL OUTER JOIN s ON o.yr = s.yr
    """,
    doc="Full-outer join of two aggregates with both-sided null coalescing "
    "(order years vs ship years diverge at the range edges).",
)
def join_full_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("o_yr"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ships = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.year("l_shipdate").alias("s_yr"))
        .agg(F.count(F.lit(1)).alias("n_shipments"))
    )
    return orders.join(ships, orders.o_yr == ships.s_yr, "full_outer").select(
        F.coalesce("o_yr", "s_yr").alias("yr"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_shipments", F.lit(0)).alias("n_shipments"),
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    WHERE o_custkey <= 200
    """,
    doc="Running total over an ordered ROWS frame with a unique tie-break — "
    "the cumulative-state shape (per-customer lifetime spend).",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_spend"
        ),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "array_hof_ops",
    oracle="""
    SELECT doc_id,
           len(str_split(text, ' ')) AS n_tokens,
           len(list_filter(str_split(text, ' '), t -> length(t) > 5)) AS n_long_tokens,
           len(list_distinct(list_transform(str_split(text, ' '), t -> lower(t)))) AS n_unique_lower,
           round(list_aggregate(list_transform(str_split(text, ' '), t -> length(t)),
                                'sum') * 1.0 / len(str_split(text, ' ')), 4) AS avg_token_len
    FROM documents
    WHERE doc_id <= 200
    """,
    doc="Array higher-order functions (transform/filter/aggregate/distinct) — "
    "per-row list analytics fully JVM-side, no Python UDF.",
)
def array_hof_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
        F.size(F.array_distinct(F.transform(toks, lambda t: F.lower(t)))).alias(
            "n_unique_lower"
        ),
        F.round(
            F.aggregate(F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x)
            * 1.0
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


@register(
    "lateral_top_item",
    oracle="""
    SELECT o.o_orderkey, li.l_linenumber, round(li.l_extendedprice, 2) AS top_price
    FROM orders o, LATERAL (
      SELECT l_linenumber, l_extendedprice
      FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
      ORDER BY l_extendedprice DESC, l_linenumber
      LIMIT 1
    ) li
    WHERE o.o_orderdate >= TIMESTAMP '1999-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-02-01'
    """,
    doc="Correlated LATERAL subquery: per-order most-expensive line item "
    "via an inner ordered LIMIT 1 — the correlated-top-1 shape Catalyst "
    "decorrelates into a join + per-key aggregation rather than executing "
    "per-row (the naive nested-loop reading would be O(orders x lineitem)).",
)
def lateral_top_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_lat")
    return spark.sql(
        """
        SELECT o.o_orderkey, li.l_linenumber, round(li.l_extendedprice, 2) AS top_price
        FROM orders_lat o, LATERAL (
          SELECT l_linenumber, l_extendedprice
          FROM lineitem_lat l
          WHERE l.l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber
          LIMIT 1
        ) li
        WHERE o.o_orderdate >= TIMESTAMP '1999-01-01'
          AND o.o_orderdate <  TIMESTAMP '1999-02-01'
        """
    )
