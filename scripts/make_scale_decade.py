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
- embeddings: vec ids shifted AND each replica's vectors pushed
  through a per-replica signed permutation of the 64 dims (an
  orthogonal transform): within a replica every pairwise cosine is
  EXACTLY preserved (each replica is an honest copy of the corpus
  geometry, so near-dup structure scales linearly), while
  cross-replica cosines are scrambled to ~random (no degenerate
  10x clone clusters). Replica 0 is the identity, so sf1 embeds
  sf0.1 verbatim. This unblocks the embedding families that
  SCALE_SMOKE_R6.md had to exclude.
- dims (region nation customer supplier part): copied unchanged.

Usage: python scripts/make_scale_decade.py [mult] [out_dir] [tables]

``tables`` (optional, comma-separated) restricts which tables are
materialized — e.g. the sf10 smoke (mult=100) only needs
``documents,embeddings,orders`` plus the dims for the six heavy
families, not a 600M-row lineitem nobody times at that scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

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
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    def wanted(name: str) -> bool:
        return only is None or name in only

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="make-scale-decade")
    spark.sparkContext.setLogLevel("ERROR")

    def write(name: str, df: DataFrame, parts: int) -> None:
        path = os.path.join(out_dir, f"{name}.parquet")
        df.repartition(parts).write.mode("overwrite").parquet(path)
        print(f"{name}: {spark.read.parquet(path).count():,} rows -> {path}")

    for dim in ("region", "nation", "customer", "supplier", "part"):
        if wanted(dim):
            write(dim, load_table(spark, SRC, dim), 1)

    if wanted("orders"):
        orders = load_table(spark, SRC, "orders")
        write("orders", replicated(orders, mult, ("o_orderkey",)).drop("rep"), 8)

    if wanted("lineitem"):
        li = load_table(spark, SRC, "lineitem")
        write("lineitem", replicated(li, mult, ("l_orderkey",)).drop("rep"), 16)

    if wanted("events"):
        ev = load_table(spark, SRC, "events")
        ev_big = replicated(ev, mult, ("event_id", "user_id"))
        # load_table's events adapter exposes ts/ts_ns from the raw file;
        # write back the raw layout (ts only) so the adapter reapplies
        write("events", ev_big.drop("rep", "ts_ns"), 8)

    if wanted("documents"):
        docs = load_table(spark, SRC, "documents")
        docs_big = replicated(docs, mult, ("doc_id",))
        tagged = F.array_join(
            F.transform(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda w: F.concat(w, F.lit("~"), F.col("rep").cast("string")),
            ),
            " ",
        )
        # empty/whitespace docs: split('') yields [''], which would gain a
        # bare "~N" token (ADVICE r6) — keep them empty instead
        tagged = F.when(F.length(F.trim(F.col("text"))) == 0, F.col("text")).otherwise(
            tagged
        )
        # n_chars is int64 in the driver parquet (pinned by
        # tests/test_fixture_canary.py); F.length alone would write int32
        docs_big = docs_big.withColumn("text", tagged).withColumn(
            "n_chars", F.length("text").cast("long")
        )
        write("documents", docs_big.drop("rep"), max(16, mult // 4))

    if not wanted("embeddings"):
        spark.stop()
        return 0

    emb = load_table(spark, SRC, "embeddings")
    dims = len(emb.select("embedding").first()[0])
    rng = np.random.RandomState(7)  # fixed seed: fully deterministic output
    parts = []
    for rep in range(mult):
        if rep == 0:
            perm, signs = np.arange(dims), np.ones(dims)
        else:
            perm = rng.permutation(dims)
            signs = rng.choice([-1.0, 1.0], size=dims)
        rotated = F.array(
            *[
                (F.element_at("embedding", int(perm[i]) + 1) * float(signs[i])).cast(
                    "float"
                )
                for i in range(dims)
            ]
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + rep * KEY_STRIDE).alias("vec_id"),
                rotated.alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    emb_big = parts[0]
    for p in parts[1:]:
        emb_big = emb_big.unionByName(p)
    write("embeddings", emb_big, max(8, mult // 4))

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
