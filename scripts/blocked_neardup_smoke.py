"""Blocked vs exact near-dup at scale (VERDICT r9 next-round #7: the
sub-quadratic replacement measured BESIDE the exact baseline).

For a given scale dir, runs the exact all-pairs baseline
(cosine_selfjoin_pairs) and the IVF-blocked twin (ivf_blocked_pairs)
at probes=1..3, and reports, all computed distributively (only counts
reach the driver):

- wall-clock for each,
- pair recall  = |blocked ∩ exact| / |exact| (subset property makes
  this just count(blocked)/count(exact)),
- connectivity recall = fraction of exact pairs whose two ends land in
  the SAME blocked component (transitive closure recovers edges the
  blocking missed — the metric that matters for dedup survivors),
- assignment list-size histogram (the per-task work bound).

Usage: python scripts/blocked_neardup_smoke.py [sf_dir] [probes...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark import get_spark
from notion_vector_store_etl_pipeline_spark.operators.similarity import (
    cosine_selfjoin_pairs,
    ivf_blocked_pairs,
    nearest_lists,
)
from notion_vector_store_etl_pipeline_spark.operators.traversal import (
    connected_components,
)
from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
    _SEMDEDUP_THR,
    _ivf_centroids,
)
from notion_vector_store_etl_pipeline_spark.sources import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    probe_list = [int(p) for p in sys.argv[2:]] or [1, 2, 3]

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    c_ids, c_mat = _ivf_centroids(spark, sf_dir)
    print(f"n={n} centroids={len(c_ids)} threshold={_SEMDEDUP_THR}")

    # exact baseline (block-partitioned GEMM all-pairs)
    t0 = time.time()
    exact = cosine_selfjoin_pairs(emb, _SEMDEDUP_THR).select("a_id", "b_id")
    exact.persist()
    n_exact = exact.count()
    t_exact = time.time() - t0
    print(f"exact: pairs={n_exact} t={t_exact:.1f}s")

    nodes = emb.select(F.col("vec_id").alias("node"))
    rows = []
    for probes in probe_list:
        # assignment fan-out histogram: per-list sizes at this probe count
        sizes = (
            nearest_lists(vecs, c_ids, c_mat, probes, emb_col="emb")
            .groupBy("list_id")
            .count()
        )
        q = sizes.agg(
            F.max("count").alias("mx"),
            F.expr("percentile(count, 0.5)").alias("p50"),
            F.expr("percentile(count, 0.99)").alias("p99"),
        ).collect()[0]

        t0 = time.time()
        blocked = ivf_blocked_pairs(
            vecs, c_ids, c_mat, _SEMDEDUP_THR, probes=probes
        ).select("a_id", "b_id")
        blocked.persist()
        n_blocked = blocked.count()
        t_blocked = time.time() - t0

        # connectivity recall: exact pairs whose ends share a blocked comp
        comp = connected_components(
            blocked.withColumnRenamed("a_id", "src").withColumnRenamed(
                "b_id", "dst"
            ),
            nodes,
        )
        lab = comp.select(
            F.col("node").alias("vec_id"), F.col("component_id").alias("lab")
        )
        joined = (
            exact.join(
                lab.withColumnRenamed("vec_id", "a_id").withColumnRenamed(
                    "lab", "la"
                ),
                "a_id",
            )
            .join(
                lab.withColumnRenamed("vec_id", "b_id").withColumnRenamed(
                    "lab", "lb"
                ),
                "b_id",
            )
        )
        n_conn = joined.filter(F.col("la") == F.col("lb")).count()
        blocked.unpersist()

        rows.append(
            f"| probes={probes} | {n_blocked} | {n_blocked / n_exact:.3f} "
            f"| {n_conn / n_exact:.3f} | {t_blocked:.1f}s "
            f"| p50={int(q.p50)} p99={int(q.p99)} max={q.mx} |"
        )
        print(rows[-1])

    print()
    print(f"exact baseline: {n_exact} pairs, {t_exact:.1f}s")
    print("| config | pairs | pair recall | connectivity recall | t | list sizes |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
