"""Quantify the sha60 oracle-parity hash tax (VERDICT r7 item 4): the
registered MinHash family runs ``checkable=True`` (sha60 base hash +
replayable band fold) so DuckDB replays it bit-for-bit; production
runs ``checkable=False`` (xxhash64, JVM codegen). This smoke times the
end-to-end dedup pipeline (LSH pairs -> components) and the pair query
BOTH ways on the same corpus so the recorded registry numbers can be
read as "production cost + documented tax", not as the plan's cost.

Method mirrors bench.py: noop sink, tracked-persist + catalog cache
cleared before every timed trial, min of 2 trials, optional untimed
warmup trial per configuration (SPARK_GRAFT_BENCH_WARM=1 — the
iterative components loop is JIT-dominated cold, see memory r7).

Usage: python scripts/hash_tax_smoke.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark import get_spark
from notion_vector_store_etl_pipeline_spark.operators import dedup as D
from notion_vector_store_etl_pipeline_spark.operators.cache import release_cache
from notion_vector_store_etl_pipeline_spark.operators.traversal import (
    connected_components,
)


def _pairs(spark, sf_dir: str, checkable: bool):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return D.minhash_neardup(docs, "text", "doc_id", threshold=0.2, checkable=checkable)


def _components(spark, sf_dir: str, checkable: bool):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    pairs = D.minhash_neardup(docs, "text", "doc_id", threshold=0.2, checkable=checkable)
    edges = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    nodes = docs.select(F.col("doc_id").alias("node"))
    return connected_components(edges, nodes)


QUERIES = {
    "minhash_lsh_neardup": _pairs,
    "minhash_neardup_components": _components,
}


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".scale/sf1"]
    spark = get_spark(app_name="hash-tax-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    out = {}
    for sf_dir in sf_dirs:
        for name, fn in QUERIES.items():
            for checkable in (False, True):
                key = f"{sf_dir}:{name}:{'sha60' if checkable else 'xxhash64'}"
                if os.environ.get("SPARK_GRAFT_BENCH_WARM") == "1":
                    release_cache()
                    spark.catalog.clearCache()
                    run(fn(spark, sf_dir, checkable))
                trials = []
                for _ in range(2):
                    release_cache()
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    run(fn(spark, sf_dir, checkable))
                    trials.append(time.perf_counter() - t0)
                out[key] = round(min(trials), 3)
                print(f"{key}: {out[key]}s (trials {[round(t,2) for t in trials]})")
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
