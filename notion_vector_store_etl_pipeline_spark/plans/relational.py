"""Relational core queries over the star schema (SURVEY.md §2.3, §2.6-2.8,
§2.12): joins (inner/broadcast/semi/anti), grouped + rollup aggregation,
sorts/limits/top-k, set ops, point lookups, first-wins dedup.

All pure Catalyst built-ins — predicate pushdown, column pruning and
join-strategy selection (broadcast for dims, sort-merge at scale, AQE
skew splitting) come for free. Floating-point aggregates are rounded in
BOTH engines so partial-aggregation order can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


# --- A: grouped aggregation (TPC-H Q1 shape; reference A1 counters analogue) ---

@register(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS exact_customers,
           TRUE                      AS approx_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="approx_count_distinct (HLL) — the 100 TB path for A2-style counters. "
    "HLL sketches are engine-specific, so the checked output is the exact "
    "count plus a tolerance boolean: |approx-exact|/exact <= 0.05 (rsd=0.02 "
    "-> ~2%% expected error; rsd=0.01 cost 4.5x as much for no gate benefit "
    "— the register array grows ~1/rsd^2 and dominates the merge); the "
    "oracle computes the exact count and the literal TRUE.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_customers"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.02) - F.countDistinct("o_custkey")
            )
            / F.countDistinct("o_custkey")
            <= F.lit(0.05)
        ).alias("approx_within_5pct"),
    )


@register(
    "agg_group_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Pricing-summary aggregation (map-side partial agg; one shuffle on the 2-col key).",
)
def agg_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1999-12-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- J: joins ---

@register(
    "join_inner_equi",
    oracle="""
    SELECT c.c_mktsegment,
           count(*)                                              AS n_rows,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="3-way equi join fact->fact->dim; AQE picks broadcast for customer side.",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT r.r_name,
           count(*)                  AS n_customers,
           round(sum(c.c_acctbal), 2) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Explicit broadcast of the small dims: zero-shuffle map-side join chain.",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


@register(
    "semi_join_filter",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
    doc="Left-semi join: the reference's page-id filter (F2/J3) as a relational op.",
)
def semi_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "point_lookup",
    oracle="""
    SELECT k.lookup_key, o.o_orderstatus, round(o.o_totalprice, 2) AS o_totalprice
    FROM (VALUES (CAST(1 AS BIGINT)), (CAST(7 AS BIGINT)), (CAST(999999999 AS BIGINT))) k(lookup_key)
    LEFT JOIN orders o ON k.lookup_key = o.o_orderkey
    """,
    doc="Broadcast key lookup with error-skip-as-null (reference S4 skip-on-error).",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = spark.createDataFrame([(1,), (7,), (999999999,)], "lookup_key: bigint")
    orders = load_table(spark, sf_dir, "orders")
    return F.broadcast(keys).join(
        orders, keys.lookup_key == orders.o_orderkey, "left_outer"
    ).select("lookup_key", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice"))


# --- L/S: sorts, limits, top-k ---

@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
    doc="Global top-k: Spark runs per-partition top-k then merges (TakeOrderedAndProject).",
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS c_acctbal, rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS rn
      FROM customer
    )
    WHERE rn <= 5
    """,
    doc="Per-group top-k via ranking window; one shuffle on the group key.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"), "rn")
    )


@register(
    "limit_pages",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    ORDER BY o_orderkey
    LIMIT 50
    """,
    doc="Deterministic limit (MAX_PAGES analogue, reference L1/L2 early exit).",
)
def limit_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .limit(50)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
    )


# --- set ops / union-with-seed / dedup ---

@register(
    "scan_union_seed",
    oracle="""
    SELECT DISTINCT r_regionkey, r_name FROM (
      SELECT r_regionkey, r_name FROM region
      UNION ALL
      SELECT CAST(-1 AS INTEGER) AS r_regionkey, 'SEED-REGION' AS r_name
    )
    """,
    doc="Scan unioned with a seed row (reference S1 seed-page append).",
)
def scan_union_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    seed = spark.createDataFrame([(-1, "SEED-REGION")], "r_regionkey: int, r_name: string")
    return region.unionByName(seed).dropDuplicates()


@register(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
    doc="Set difference: positive-balance customers who never placed a "
    "large (>300k) order. The right side is predicated so the "
    "difference is NON-EMPTY at every fixture SF (3/29/278 rows at "
    "sf0.001/0.01/0.1) — the original 'customers with no orders at "
    "all' was empty at every gate SF on these fixtures (nearly every "
    "customer has orders), making its parity row vacuous (r10 test "
    "review).",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select("c_custkey")
    have = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # subtract == EXCEPT DISTINCT unconditionally; exceptAll+dropDuplicates
    # only matches when the left side is duplicate-free (it is here — PK —
    # but the direct form can't silently break if the pattern is reused)
    return cust.subtract(have)


@register(
    "agg_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*)                    AS n_customers,
           round(sum(c.c_acctbal), 2)  AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="Hierarchical rollup (region -> nation -> grand total).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT o_orderpriority,
           count(*)                   AS n_orders,
           count(DISTINCT o_custkey)  AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Distinct aggregation (reference A2 crawl counters).",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "dedup_first_wins",
    oracle="""
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Order-sensitive first-wins dedup (reference A4 visited-sets).",
)
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@register(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    """,
    doc="Set intersection: big-spending customers that are in good standing.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    good = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return big.intersect(good)


@register(
    "join_salted_skew",
    oracle="""
    SELECT n.n_name, count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Skew-salted join (operators.skew.salted_join): identical semantics "
    "to the plain equi join — the oracle IS the unsalted query — while the "
    "shuffle key is (key, salt) so a hot key spreads over N reducers.",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = salted_join(orders, cust, "o_custkey", "c_custkey", salt_buckets=8)
    return (
        joined.join(nation, joined.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "setop_except_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="Bag-semantics set difference (EXCEPT ALL): multiplicities "
    "subtract instead of collapsing — a part shipped 5 times post-1999 "
    "with 2 returned rows survives 3 times. Distinct operator from "
    "setop_except's EXCEPT DISTINCT.",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    recent = li.filter(
        F.col("l_shipdate") >= F.to_timestamp(F.lit("1999-01-01"))
    ).select("l_partkey")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return recent.exceptAll(returned)


@register(
    "union_schema_evolution",
    oracle="""
    SELECT event_id, event_type, round(value, 2) AS value, src
    FROM (
      SELECT event_id, event_type, NULL::DOUBLE AS value, 'v1' AS src
      FROM events WHERE event_id % 2 = 0
      UNION ALL BY NAME
      SELECT event_id, event_type, value, 'v2' AS src
      FROM events WHERE event_id % 2 = 1
    )
    """,
    doc="Schema-evolution union (unionByName allowMissingColumns): an "
    "old snapshot written before the `value` column existed unions with "
    "the new shape, absent fields null-filled — the append-only data "
    "lake pattern where historical partitions never get rewritten.",
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v1 = events.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", F.lit("v1").alias("src")
    )
    v2 = events.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type", F.round("value", 2).alias("value"), F.lit("v2").alias("src")
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "event_id", "event_type", "value", "src"
    )


@register(
    "setop_intersect_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="Bag-semantics intersection (INTERSECT ALL): each part key "
    "survives min(multiplicity in recent shipments, multiplicity in "
    "returns) times — the sibling of setop_except_all.",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    recent = li.filter(
        F.col("l_shipdate") >= F.to_timestamp(F.lit("1999-01-01"))
    ).select("l_partkey")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return recent.intersectAll(returned)
