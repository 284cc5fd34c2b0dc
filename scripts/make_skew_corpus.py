"""Materialize an ADVERSARIALLY SKEWED variant of the sf1 decade at
.scale/sf1skew: the duplicate-cluster shape a real 100 TB web corpus
guarantees but the honest sf1 generator deliberately avoids.

- documents: 5% of docs (doc_id % 20 == 0 -> ~2,500 of 50,000) have
  their text replaced by ONE shared 60-word boilerplate template plus
  three doc-unique trailing words. NOT exact duplicates (exact dedup
  keeps them all), pairwise Jaccard ~0.9 -> a single ~2,500-doc
  near-dup cluster. This is the pathological input for shingle joins
  (one hot shingle shared by 2,500 docs -> 6.25M join rows per
  shingle without a cap) and for LSH bucket joins (one bucket of
  2,500 colliding docs -> 3.1M candidate pairs without the dense-
  bucket star guard).
- embeddings: 5% of vectors (vec_id % 20 == 0 -> ~1,000 of 20,000)
  replaced by one shared unit template vector plus tiny deterministic
  per-vector noise (pairwise cosine > 0.99) -> a single ~1,000-vector
  near-dup clique feeding neardup_components a dense component.
- all other tables: symlinked to the sf1 decade (unchanged).

The round-7 smoke (SCALE_SMOKE_R7.md) runs the near-dup family on
.scale/sf1 vs .scale/sf1skew and asserts the skewed times stay within
~2x, naming the mechanism per query (hot-shingle cap, dense-bucket
star guard, prefix-filter frequency ordering).

Usage: python scripts/make_skew_corpus.py [src_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark import get_spark
from notion_vector_store_etl_pipeline_spark.sources import load_table

TEMPLATE = " ".join(f"boilerplate{i}" for i in range(60))
SKEW_MOD = 20  # 1-in-20 rows -> 5% cluster


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".scale/sf1skew"
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make-skew-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
    ):
        link = os.path.join(out, f"{name}.parquet")
        target = os.path.abspath(os.path.join(src, f"{name}.parquet"))
        if not os.path.lexists(link):
            os.symlink(target, link)

    docs = load_table(spark, src, "documents")
    in_cluster = F.col("doc_id") % SKEW_MOD == 0
    templated = F.concat_ws(
        " ",
        F.lit(TEMPLATE),
        F.concat(F.lit("uniq"), F.col("doc_id").cast("string")),
        F.concat(F.lit("uniq"), F.col("doc_id").cast("string"), F.lit("x")),
        F.concat(F.lit("uniq"), F.col("doc_id").cast("string"), F.lit("y")),
    )
    docs_skew = docs.withColumn(
        "text", F.when(in_cluster, templated).otherwise(F.col("text"))
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs_skew.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    n = spark.read.parquet(os.path.join(out, "documents.parquet")).count()
    print(f"documents: {n:,} rows ({n // SKEW_MOD:,}-doc template cluster)")

    emb = load_table(spark, src, "embeddings")
    dims = len(emb.select("embedding").first()[0])
    in_clique = F.col("vec_id") % SKEW_MOD == 0
    # template = unit vector along a fixed diagonal; noise = tiny
    # deterministic per-vec offset in one dimension keeping pairwise
    # cosine > 0.99. The (vec_id % dims, vec_id % 7) scheme can repeat
    # across replicas, so a few clique vectors are exact duplicates —
    # harmless here: the clique exercises the near-dup/components
    # paths either way, and nothing in the smoke assumes distinctness
    base = 1.0 / (dims ** 0.5)
    noise_dim = (F.col("vec_id") % dims).cast("int")
    clique_vec = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda i: (
            F.lit(base)
            + F.when(i == noise_dim, (F.col("vec_id") % 7 + 1) * 0.01).otherwise(0.0)
        ).cast("float"),
    )
    emb_skew = emb.withColumn(
        "embedding", F.when(in_clique, clique_vec).otherwise(F.col("embedding"))
    )
    emb_skew.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    n = spark.read.parquet(os.path.join(out, "embeddings.parquet")).count()
    print(f"embeddings: {n:,} rows ({n // SKEW_MOD:,}-vector clique)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
