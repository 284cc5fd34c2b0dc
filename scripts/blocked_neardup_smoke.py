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

Measurement hygiene (r10 scripts review): every wall-clock is
min-of-2 AFTER one untimed JIT-warmup trial — the same methodology as
the sibling smokes — and every trial starts from a clean cache state
(release_cache + clearCache), so the exact baseline isn't penalized
for running first/cold and later probe configs aren't penalized by
earlier configs' leftover component caches. The pair sets the recall
joins consume are written to scratch parquet (immune to the
clearCache between trials) instead of persisted.

Usage: python scripts/blocked_neardup_smoke.py [sf_dir] [probes...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark import get_spark
from notion_vector_store_etl_pipeline_spark.operators.cache import release_cache
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
    work = tempfile.mkdtemp(prefix="blocked_smoke_")

    def timed_min2(mk_count):
        """trial 0 = untimed JIT warmup, then min of 2 timed runs; every
        trial starts cache-clean so no config inherits another's warmth
        or pressure."""
        best, n = float("inf"), None
        for trial in range(3):
            release_cache()
            spark.catalog.clearCache()
            t0 = time.time()
            n = mk_count()
            el = time.time() - t0
            if trial:
                best = min(best, el)
        return n, best

    try:
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        vecs = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        c_ids, c_mat = _ivf_centroids(spark, sf_dir)
        print(f"n={n} centroids={len(c_ids)} threshold={_SEMDEDUP_THR}")

        # exact baseline (block-partitioned GEMM all-pairs), warm min-of-2
        n_exact, t_exact = timed_min2(
            lambda: cosine_selfjoin_pairs(emb, _SEMDEDUP_THR).count()
        )
        print(f"exact: pairs={n_exact} t={t_exact:.1f}s (warm min-of-2)")
        # the artifact the recall joins read — on disk, immune to the
        # clearCache each later timing trial performs
        cosine_selfjoin_pairs(emb, _SEMDEDUP_THR).select("a_id", "b_id").write.mode(
            "overwrite"
        ).parquet(f"{work}/exact")
        release_cache()
        exact = spark.read.parquet(f"{work}/exact")

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

            n_blocked, t_blocked = timed_min2(
                lambda: ivf_blocked_pairs(
                    vecs, c_ids, c_mat, _SEMDEDUP_THR, probes=probes
                ).count()
            )

            # connectivity recall: exact pairs whose ends share a blocked
            # component (untimed; scratch parquet as above)
            ivf_blocked_pairs(
                vecs, c_ids, c_mat, _SEMDEDUP_THR, probes=probes
            ).select("a_id", "b_id").write.mode("overwrite").parquet(
                f"{work}/blocked"
            )
            release_cache()
            blocked = spark.read.parquet(f"{work}/blocked")
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
            # drop the component walk's tracked caches before the next config
            release_cache()

            rows.append(
                f"| probes={probes} | {n_blocked} | {n_blocked / n_exact:.3f} "
                f"| {n_conn / n_exact:.3f} | {t_blocked:.1f}s "
                f"| p50={int(q.p50)} p99={int(q.p99)} max={q.mx} |"
            )
            print(rows[-1])

        print()
        print(f"exact baseline: {n_exact} pairs, {t_exact:.1f}s (warm min-of-2)")
        print("| config | pairs | pair recall | connectivity recall | t | list sizes |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(r)
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
