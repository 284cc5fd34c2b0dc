"""Wall-clock value of the bucketed-table index layout for the
recurring LSH probe (VERDICT r8 next-round #7).

The exchange-free property of the bucketed probe join is pinned at
PLAN level in tests/test_stream_dedup_ingest.py; this smoke records
what it is WORTH: the same incremental probe (batch = doc_id % 10 ==
0, corpus = the rest) timed against (a) the path-based band-partitioned
index and (b) the bucketed-table index, min-of-2 after one untimed
warmup each (the probe is signature-UDF + join work — JIT-dominated on
first execution like the other iterative families, PLANS.md).

    python scripts/probe_layout_smoke.py [sf_dir ...]

Prints one row per sf_dir and a JSON line for the evidence page.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark import get_spark
from notion_vector_store_etl_pipeline_spark.operators import dedup as D


def main() -> int:
    sf_dirs = sys.argv[1:] or [".scale/sf1"]
    spark = get_spark(app_name="probe-layout-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for sf_dir in sf_dirs:
        work = tempfile.mkdtemp(prefix="probe_layout_")
        table = "probe_layout_idx"
        try:
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            )
            split = F.col("doc_id") % 10 == 0
            index = D.build_lsh_index(docs.filter(~split))
            path = f"{work}/idx_path"
            D.write_lsh_index(index, path)
            D.write_lsh_index_bucketed(index, table, 32, path=f"{work}/idx_table")

            def probe(corpus_index):
                return D.minhash_probe_neardup(
                    docs, split, threshold=0.2, corpus_index=corpus_index
                )

            def timed(mk_index) -> tuple[float, int]:
                best = float("inf")
                for trial in range(3):  # trial 0 = untimed JIT warmup
                    spark.catalog.clearCache()
                    D.release_cache()
                    t0 = time.monotonic()
                    probe(mk_index()).write.mode("overwrite").format("noop").save()
                    el = time.monotonic() - t0
                    if trial > 0:
                        best = min(best, el)
                spark.catalog.clearCache()
                D.release_cache()
                rows = probe(mk_index()).count()
                return best, rows

            p_s, p_rows = timed(lambda: D.load_lsh_index(spark, path))
            b_s, b_rows = timed(lambda: D.load_lsh_index_bucketed(spark, table))
            assert p_rows == b_rows, (p_rows, b_rows)
            print(
                f"{sf_dir}: path={p_s:.2f}s bucketed={b_s:.2f}s "
                f"ratio={b_s / p_s:.2f} rows={p_rows}"
            )
            results[sf_dir] = {
                "path_s": round(p_s, 2),
                "bucketed_s": round(b_s, 2),
                "rows": p_rows,
            }
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            D.release_cache()
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
