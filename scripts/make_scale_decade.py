"""Materialize a 10x decade of the sf0.1 fixtures at .scale/sf1 so the
scale smoke gets one more order of magnitude (sf0.01 -> sf0.1 -> sf1).

Derivation is strictly from the driver-provided sf0.1 parquet — no new
synthetic distributions. Fact tables are replicated `mult` times with
per-replica key shifts so joins keep 1:1/1:N fan-outs:

- lineitem/orders: order keys shifted per replica (same stride on both
  sides), so every lineitem still joins exactly one order; customers,
  suppliers, parts are reused as dimensions (10x fan-in — the scale-up
  shape of a real star schema).
- events: event ids shifted; user ids shifted per replica so distinct
  counts (HLL targets) scale ~10x instead of saturating.
- documents: doc ids shifted AND every word suffixed with the replica
  tag. Without the suffix each doc would gain 9 verbatim copies, so
  shingle/minhash/jaccard queries would measure a 10x-duplicate corpus
  (quadratic within clone groups), not 10x more data. With it,
  replicas share no shingles: the honest "10x corpus" workload.
  n_chars is recomputed to stay consistent with the rewritten text.
- embeddings: vec ids shifted, vectors kept (clone vectors would skew
  near-dup components, so embedding queries are NOT part of the sf1
  subset — see SCALE_SMOKE_R6.md).
- dims (region nation customer supplier part): copied unchanged.

Usage: python scripts/make_scale_decade.py [mult] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from notion_vector_store_etl_pipeline_spark import get_spark
from notion_vector_store_etl_pipeline_spark.sources import load_table

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 10_000_000  # > every key in sf0.1 by a wide margin


def replicated(df: DataFrame, mult: int, shift_cols: tuple[str, ...]) -> DataFrame:
    out = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
    )
    for col in shift_cols:
        out = out.withColumn(col, F.col(col) + F.col("rep") * F.lit(KEY_STRIDE))
    return out


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ".scale/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="make-scale-decade")
    spark.sparkContext.setLogLevel("ERROR")

    def write(name: str, df: DataFrame, parts: int) -> None:
        path = os.path.join(out_dir, f"{name}.parquet")
        df.repartition(parts).write.mode("overwrite").parquet(path)
        print(f"{name}: {spark.read.parquet(path).count():,} rows -> {path}")

    for dim in ("region", "nation", "customer", "supplier", "part"):
        write(dim, load_table(spark, SRC, dim), 1)

    orders = load_table(spark, SRC, "orders")
    write("orders", replicated(orders, mult, ("o_orderkey",)).drop("rep"), 8)

    li = load_table(spark, SRC, "lineitem")
    write("lineitem", replicated(li, mult, ("l_orderkey",)).drop("rep"), 16)

    ev = load_table(spark, SRC, "events")
    ev_big = replicated(ev, mult, ("event_id", "user_id"))
    # load_table's events adapter exposes ts/ts_ns from the raw file;
    # write back the raw layout (ts only) so the adapter reapplies
    write("events", ev_big.drop("rep", "ts_ns"), 8)

    docs = load_table(spark, SRC, "documents")
    docs_big = replicated(docs, mult, ("doc_id",))
    tagged = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda w: F.concat(w, F.lit("~"), F.col("rep").cast("string")),
        ),
        " ",
    )
    docs_big = docs_big.withColumn("text", tagged).withColumn(
        "n_chars", F.length("text")
    )
    write("documents", docs_big.drop("rep"), 16)

    emb = load_table(spark, SRC, "embeddings")
    write("embeddings", replicated(emb, mult, ("vec_id",)).drop("rep"), 8)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
