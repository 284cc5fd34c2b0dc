"""Per-batch cost of the composed ingest pipeline's SKIP stage over a
long stream, compacted vs not (round-10 review finding: the skip stage
read the entire ``state/`` tree every micro-batch — the same O(stream
age) term the dedup/ANN wings already compact away).

Methodology mirrors the dedup wing's 80-batch series (SCALE_SMOKE_R9
§2): one doc corpus, a stream of N single-page batches. The
uncompacted run re-reads every prior ``state/batch_id=K`` dir per
batch (listing + read both grow with age); ``compact_state_every=10,
prune_state=True`` folds the tail into ``state_versions/v=<k>`` behind
a watermark, so the per-batch read is O(10 + versions-root) regardless
of age.

Measurement honesty (r10 scripts review): each timed sample is a FULL
query lifecycle (construct, checkpoint offset-log recovery, source
re-listing, run one batch, stop) — NOT just the foreachBatch body —
and the checkpoint-replay/source-listing terms are themselves O(age)
in BOTH configs, so the end-to-end drift ratios here are a coarse
signal contaminated by harness costs common to both runs. The CLEAN
per-age signal for the skip-state read is the isolated microbench
recorded in SCALE_SMOKE_R10.md §5 (read-only, fixed harness); this
series exists to show the composed pipeline stays usable end-to-end.
An untimed warmup series runs before the first config so neither
config's early batches absorb session JIT, and drift baselines skip
the first 5 batches.

Usage: python scripts/ingest_state_smoke.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark import get_spark
from notion_vector_store_etl_pipeline_spark.operators import dedup as D
from notion_vector_store_etl_pipeline_spark.operators.similarity import (
    quantize_and_assign,
    refresh_centroids,
    write_ivf_index,
)
from notion_vector_store_etl_pipeline_spark.streaming.ingest_pipeline import (
    batch_ingest_etl,  # noqa: F401  (import parity with the pipeline module)
    streaming_ingest_etl,
)
from notion_vector_store_etl_pipeline_spark.streaming.ingest_pipeline import (
    embedded_chunks,
)


def synth_docs(n: int, start: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(800)]
    return pd.DataFrame(
        {
            "doc_id": np.arange(start, start + n, dtype=np.int64),
            "text": [
                " ".join(rng.choice(words, size=60, replace=True)) for _ in range(n)
            ],
            "source": ["synth"] * n,
        }
    )


def run_series(spark, root, corpus_path, lsh_path, ivf_path, n_batches, rows, **kw):
    src = f"{root}/incoming.parquet"
    out, ckpt = f"{root}/out", f"{root}/ckpt"
    times = []
    pdf = synth_docs(rows, 1_000_000, seed=0)
    for b in range(n_batches):
        if b:
            pdf = pd.concat(
                [pdf, synth_docs(rows, 1_000_000 + b * rows, seed=b)],
                ignore_index=True,
            )
        pdf.to_parquet(src, index=False)
        t0 = time.perf_counter()
        # update_index=False: this series isolates the SKIP-state read
        # term; the r11 intra-stream dedup tail has its own cost shape
        # (measured in the composed endurance smoke) and folding it in
        # here would contaminate the state-compaction comparison
        q = streaming_ingest_etl(
            spark, src, corpus_path, lsh_path, ivf_path, out, ckpt,
            page_size=rows, pages_per_batch=1, update_index=False, **kw,
        )
        q.processAllAvailable()
        q.stop()
        times.append(time.perf_counter() - t0)
    return times


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="ingest_state_smoke_")
    corpus_pdf = synth_docs(2_000, 0, seed=999)
    corpus_path = f"{base}/corpus"
    spark.createDataFrame(corpus_pdf).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    lsh_path = f"{base}/lsh"
    D.write_lsh_index(D.build_lsh_index(corpus.select("doc_id", "text")), lsh_path)
    chunks = embedded_chunks(corpus).select("vec_id", "emb")
    c_ids, c_mat = refresh_centroids(chunks, sample_mod=31)
    ivf_path = f"{base}/ivf"
    write_ivf_index(
        spark,
        quantize_and_assign(chunks, c_ids, c_mat, topn=1, id_col="vec_id", emb_col="emb"),
        c_ids,
        c_mat,
        ivf_path,
    )

    # untimed warmup series: the session's first streaming/LSH/IVF
    # executions are JIT-dominated (2-4x), and with no warmup the FIRST
    # config's first5 baseline absorbs them while the second config
    # starts warm — the two drift ratios would not be comparable
    warm_root = f"{base}/warmup"
    os.makedirs(warm_root, exist_ok=True)
    run_series(spark, warm_root, corpus_path, lsh_path, ivf_path, 3, rows)

    configs = {
        "uncompacted": {},
        "compacted(K=10,prune)": {"compact_state_every": 10, "prune_state": True},
    }
    for label, kw in configs.items():
        root = f"{base}/{label.replace('(', '_').replace(')', '').replace(',', '_').replace('=', '')}"
        os.makedirs(root, exist_ok=True)
        times = run_series(
            spark, root, corpus_path, lsh_path, ivf_path, n_batches, rows, **kw
        )
        q = np.quantile
        # baseline skips the first 5 batches (residual per-series
        # settling) — drift compares mid-series to tail
        base_w = times[5:10] if len(times) >= 15 else times[:5]
        first5, last5 = float(np.mean(base_w)), float(np.mean(times[-5:]))
        print(
            f"RESULT {label}: batches={n_batches} rows/batch={rows} "
            f"base5={first5:.2f}s last5={last5:.2f}s "
            f"drift={last5 / first5:.2f}x "
            f"p50={q(times, 0.5):.2f}s p90={q(times, 0.9):.2f}s"
        )
        print("SERIES", label, [round(t, 2) for t in times])

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
