"""Per-stage profile of the composed ingest stream's foreachBatch body
(VERDICT r13 #1): attribute the ~12.4 s/batch FIXED overhead measured
by SCALE_SMOKE_R13 §1 to its stages — fold mechanics, skip-state
re-reads, anchor index/corpus loads, the probe/chunk/embed/assign
kernel, and the seven per-batch sink writes — before optimizing any of
them. Uses streaming/ingest_pipeline's opt-in stage profiler
(enable_stage_profile), so the numbers are the REAL batch body under
the real stream, not a reconstruction.

Usage: python scripts/profile_stream_batch.py [n_batches] [rows_per_batch]

Setup mirrors scripts/endurance_smoke.py (corpus + stored LSH/IVF
indexes from .scale/sf1), with the standard everything-on config; the
report is per-stage p50/total over steady (non-boundary) batches plus
the boundary batches listed separately.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark import get_spark
from notion_vector_store_etl_pipeline_spark.operators import dedup as D
from notion_vector_store_etl_pipeline_spark.operators.similarity import (
    quantize_and_assign,
    refresh_centroids,
    write_ivf_index,
)
from notion_vector_store_etl_pipeline_spark.streaming import ingest_pipeline as IP
from scripts.endurance_smoke import K, REBUILD_EVERY, RETAIN, build_feed

SF1_DOCS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale/sf1/documents.parquet",
)


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(n_batches + 50)
    )

    base = tempfile.mkdtemp(prefix="profile_stream_")
    docs = spark.read.parquet(SF1_DOCS).select("doc_id", "text", "source")
    corpus_path = f"{base}/corpus"
    docs.filter(F.col("doc_id") % 10 != 0).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    lsh_path = f"{base}/lsh"
    D.write_lsh_index(D.build_lsh_index(corpus.select("doc_id", "text")), lsh_path)
    chunks = IP.embedded_chunks(corpus).select("vec_id", "emb")
    c_ids, c_mat = refresh_centroids(chunks)
    ivf_path = f"{base}/ivf"
    write_ivf_index(
        spark,
        quantize_and_assign(chunks, c_ids, c_mat, topn=1, id_col="vec_id", emb_col="emb"),
        c_ids, c_mat, ivf_path,
    )
    print(f"setup done: corpus={corpus.count()} docs", flush=True)

    n_upd = int(rows * 0.10)
    n_rev = max(1, int(rows * 0.05))
    feed, _ = build_feed(n_batches, rows - n_upd - n_rev, n_upd, n_rev)
    src = f"{base}/feed.parquet"
    feed.to_parquet(src, index=False)
    out, ckpt = f"{base}/out", f"{base}/ckpt"

    prof = IP.enable_stage_profile()
    t0 = time.perf_counter()
    q = IP.streaming_ingest_etl(
        spark, src, corpus_path, lsh_path, ivf_path, out, ckpt,
        page_size=rows, pages_per_batch=1,
        compact_state_every=K, prune_state=True, vacuum_events=True,
        update_index=True,
        compact_dedup_every=K, compact_dedup_prune=True,
        compact_dedup_retain=RETAIN, compact_dedup_major_every=None,
        compact_ann_every=K, compact_ann_prune=True, compact_ann_retain=RETAIN,
        rebuild_ann_every=REBUILD_EVERY,
    )
    q.processAllAvailable()
    prog = {
        int(p.batchId): (p.durationMs or {}).get("triggerExecution", 0) / 1000.0
        for p in q.recentProgress
        if (p.numInputRows or 0) > 0
    }
    q.stop()
    wall = time.perf_counter() - t0
    IP.disable_stage_profile()

    by_batch: dict[int, dict[str, float]] = {}
    for b, stage, sec in prof:
        by_batch.setdefault(b, {})[stage] = by_batch.get(b, {}).get(stage, 0.0) + sec
    stages = [
        "folds", "pin_batch", "skip", "anchor_load",
        "kernel:probe", "kernel:clean_pin", "kernel:ivf_load",
        "kernel:chunk_embed", "kernel",
        "write_outputs", "write_ann", "events", "write_state",
    ]
    steady = [b for b in sorted(by_batch) if b >= 3 and b % K != 0]
    boundary = [b for b in sorted(by_batch) if b % K == 0 and b > 0]

    def report(pop: list[int], label: str) -> None:
        if not pop:
            return
        print(f"\n== {label} (n={len(pop)}) ==")
        tot_trigger = np.median([prog.get(b, 0.0) for b in pop])
        total = 0.0
        for s in stages:
            xs = [by_batch[b].get(s, 0.0) for b in pop]
            p50 = float(np.median(xs))
            if not s.startswith("kernel:"):  # kernel total subsumes kernel:*
                total += p50
            print(f"  {s:18s} p50 {p50:7.3f}s  max {max(xs):7.3f}s")
        print(f"  {'sum-of-stages':18s} p50 {total:7.3f}s   "
              f"(triggerExecution p50 {tot_trigger:.3f}s -> "
              f"scheduling/other {tot_trigger - total:.3f}s)")

    report(steady, "steady batches")
    report(boundary, "fold boundaries")
    print(f"\nwall={wall:.0f}s for {len(by_batch)} batches of {rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
