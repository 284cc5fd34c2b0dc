"""Composed-flagship ENDURANCE smoke (VERDICT r10 next-round #4): one
long `streaming_ingest_etl` run with EVERYTHING on — skip-state
compaction+prune, intra-stream dedup with LSH fold+prune+vacuum, stale
retirement with physical ANN reclamation, periodic centroid rebuild,
version vacuum — under realistic churn (updates AND reverts), checking
the two product claims the per-feature smokes can't:

1. per-batch wall-clock is FLAT over the series (no O(stream-age)
   term leaks through the composition of four manifests/watermarks);
2. state/index footprint is BOUNDED (delta tails pruned to the fold
   cadence, superseded index versions vacuumed to retain_versions,
   the unconsumed stale/revive tails bounded by the ann fold cadence).

Methodology (SCALE_SMOKE_R10 §7 rules): ONE streaming query over a
pre-built feed (the paginated source pages it; every batch is exactly
one page), per-batch times taken from Spark's own streaming progress
(triggerExecution durationMs) — no per-sample query restart, so none
of the restart harness's O(age) checkpoint-replay noise. The first
WARM_BATCHES batches are excluded from drift baselines (session JIT,
memory: jit-warmup-iterative-bench). Fold-boundary batches are
reported as their own population — they PAY the fold; flatness is
claimed for the non-boundary steady state, boundedness for the
boundary cost itself.

Feed churn per 100-row batch: 85 brand-new docs, 10 UPDATES (rewrite
of a doc sent >=2 batches earlier), 5 REVERTS (a previously-updated
doc returns to its original text — the ADVICE r10 A->B->A path, live
at volume). Corpus + stored indexes are built from .scale/sf1
documents (45k docs) so probe/assign run against realistic state.

Usage: python scripts/endurance_smoke.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations


import os
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
    embedded_chunks,
    load_pipeline_ann_state,
    read_revived_vectors,
    read_stale_vectors,
    streaming_ingest_etl,
)

SF1_DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".scale/sf1/documents.parquet")
WARM_BATCHES = 20


def synth_text(rng: np.random.Generator, words: list[str]) -> str:
    return " ".join(rng.choice(words, size=60, replace=True))


def build_feed(n_batches: int, rows: int, n_new: int, n_upd: int, n_rev: int):
    """One DataFrame-able feed, batch-major row order. Returns
    (pdf, originals) where originals maps doc_id -> first text (the
    revert target)."""
    rng = np.random.default_rng(7)
    words = [f"tok{i}" for i in range(3000)]
    rows_out: list[tuple[int, str, str]] = []
    originals: dict[int, str] = {}
    updated: set[int] = set()  # docs rewritten, eligible for revert
    sent_by_batch: list[list[int]] = []
    next_id = 10_000_000
    rows = n_new + n_upd + n_rev
    for b in range(n_batches):
        batch_rows: list[tuple[int, str, str]] = []
        batch_ids = []
        # SNAPSHOT the revert pool before the update block mutates
        # `updated`, and track this batch's picks: the pipeline (and
        # the paginated source's page contract) assumes a doc_id
        # appears at most once per micro-batch — an update and a revert
        # of the SAME doc in one batch would contaminate every
        # downstream number this smoke exists to measure (r11 review)
        eligible_rev = sorted(updated)
        chosen: set[int] = set()
        eligible_upd = [i for blk in sent_by_batch[:-1] for i in blk] if b >= 2 else []
        if eligible_upd:
            for d in rng.choice(eligible_upd, size=min(n_upd, len(eligible_upd)), replace=False):
                batch_rows.append((int(d), synth_text(rng, words), "synth"))
                updated.add(int(d))
                chosen.add(int(d))
        pool = [d for d in eligible_rev if d not in chosen]
        if pool:
            for d in rng.choice(pool, size=min(n_rev, len(pool)), replace=False):
                batch_rows.append((int(d), originals[int(d)], "synth"))
                updated.discard(int(d))
        # fill the page to EXACTLY `rows` rows with brand-new docs: the
        # paginated source slices fixed-size pages, so a short batch
        # would shift every later page boundary off this builder's
        # batch-major layout
        while len(batch_rows) < rows:
            t = synth_text(rng, words)
            batch_rows.append((next_id, t, "synth"))
            originals[next_id] = t
            batch_ids.append(next_id)
            next_id += 1
        rows_out.extend(batch_rows)
        sent_by_batch.append(batch_ids)
    feed = pd.DataFrame(rows_out, columns=["doc_id", "text", "source"])
    # hard assert of the page contract
    for b in range(n_batches):
        page = feed.iloc[b * rows: (b + 1) * rows]
        assert len(page) == rows and page.doc_id.is_unique, f"batch {b} malformed"
    return feed, originals


def tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_new, n_upd, n_rev = int(rows * 0.85), int(rows * 0.10), rows - int(rows * 0.85) - int(rows * 0.10)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", str(n_batches + 50))

    base = tempfile.mkdtemp(prefix="endurance_smoke_")
    docs = spark.read.parquet(SF1_DOCS).select("doc_id", "text", "source")
    corpus_path = f"{base}/corpus"
    docs.filter(F.col("doc_id") % 10 != 0).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    t0 = time.perf_counter()
    lsh_path = f"{base}/lsh"
    D.write_lsh_index(D.build_lsh_index(corpus.select("doc_id", "text")), lsh_path)
    chunks = embedded_chunks(corpus).select("vec_id", "emb")
    c_ids, c_mat = refresh_centroids(chunks)
    ivf_path = f"{base}/ivf"
    write_ivf_index(
        spark,
        quantize_and_assign(chunks, c_ids, c_mat, topn=1, id_col="vec_id", emb_col="emb"),
        c_ids, c_mat, ivf_path,
    )
    print(f"setup: corpus={corpus.count()} docs, indexes in {time.perf_counter()-t0:.1f}s",
          flush=True)

    feed, _ = build_feed(n_batches, rows, n_new, n_upd, n_rev)
    src = f"{base}/feed.parquet"
    feed.to_parquet(src, index=False)
    out, ckpt = f"{base}/out", f"{base}/ckpt"

    K = 10
    t0 = time.perf_counter()
    q = streaming_ingest_etl(
        spark, src, corpus_path, lsh_path, ivf_path, out, ckpt,
        page_size=rows, pages_per_batch=1,
        compact_state_every=K, prune_state=True,
        update_index=True,
        compact_dedup_every=K, compact_dedup_prune=True, compact_dedup_retain=2,
        compact_ann_every=K, compact_ann_prune=True, compact_ann_retain=2,
        rebuild_ann_every=5,
    )
    q.processAllAvailable()
    prog = q.recentProgress  # StreamingQueryProgress objects
    q.stop()
    wall = time.perf_counter() - t0

    per_batch = {
        int(p.batchId): (p.durationMs or {}).get("triggerExecution", 0) / 1000.0
        for p in prog
        if (p.numInputRows or 0) > 0
    }
    ids = sorted(per_batch)
    steady = [b for b in ids if b >= WARM_BATCHES and b % K != 0]
    boundary = [b for b in ids if b >= WARM_BATCHES and b % K == 0]
    rebuild = [b for b in boundary if (b // K) % 5 == 0]
    plain_boundary = [b for b in boundary if b not in rebuild]

    def q50(xs):
        return float(np.median([per_batch[b] for b in xs])) if xs else float("nan")

    half = steady[: len(steady) // 2], steady[len(steady) // 2:]
    print(f"\nbatches={len(ids)} wall={wall:.0f}s  rows/batch={rows} "
          f"(new {n_new}/upd {n_upd}/rev {n_rev})  folds every {K}, rebuild every 5th fold")
    print(f"steady-state (non-boundary, batch>={WARM_BATCHES}): "
          f"p50 first-half {q50(half[0]):.2f}s vs second-half {q50(half[1]):.2f}s "
          f"(drift x{q50(half[1])/q50(half[0]):.2f})")
    for label, pop in (("plain fold boundaries", plain_boundary),
                       ("rebuild boundaries", rebuild)):
        if pop:
            h = pop[: len(pop) // 2], pop[len(pop) // 2:]
            print(f"{label}: n={len(pop)} p50 {q50(pop):.2f}s "
                  f"first-half {q50(h[0]):.2f}s vs second-half {q50(h[1]):.2f}s")

    # ---- footprint boundedness ----
    fp = {t: tree_bytes(f"{out}/{t}") for t in
          ("state", "state_versions", "stale", "stale_versions", "revive",
           "revive_versions", "index_delta", "index_versions", "corpus_versions",
           "ann", "clean", "chunks", "flagged")}
    print("\nfootprint (MB):",
          {k: round(v / 1e6, 1) for k, v in sorted(fp.items())})
    n_idx_versions = len([d for d in os.listdir(f"{out}/index_versions")]) \
        if os.path.isdir(f"{out}/index_versions") else 0
    n_ann_versions = len(os.listdir(f"{out}/ann/index_versions")) \
        if os.path.isdir(f"{out}/ann/index_versions") else 0
    n_delta_dirs = len(os.listdir(f"{out}/index_delta")) if os.path.isdir(f"{out}/index_delta") else 0
    n_ann_delta_dirs = len(os.listdir(f"{out}/ann/delta")) if os.path.isdir(f"{out}/ann/delta") else 0
    stale_tail = read_stale_vectors(spark, out, 10**9,
                                    after_batch=_ann_stale_through(spark, out))
    revive_tail = read_revived_vectors(spark, out, 10**9,
                                       after_batch=_ann_stale_through(spark, out))
    print(f"index versions kept: lsh={n_idx_versions} ann={n_ann_versions} "
          f"(retain=2); uncompacted delta dirs: lsh={n_delta_dirs} "
          f"ann={n_ann_delta_dirs} (cadence {K})")
    print(f"unconsumed event tail: stale={0 if stale_tail is None else stale_tail.count()} "
          f"revive={0 if revive_tail is None else revive_tail.count()} rows "
          f"(bounded by the ann fold window)")

    # served view sanity: loads, and serves exactly one row per vec_id
    index, _, _ = load_pipeline_ann_state(spark, out, ivf_path, 10**9)
    n_rows = index.count()
    n_ids = index.select("vec_id").distinct().count()
    print(f"served ANN view: {n_rows} rows, {n_ids} distinct vec_ids "
          f"({'OK' if n_rows == n_ids else 'DUPLICATES!'})")
    return 0


def _ann_stale_through(spark, out: str) -> int:
    from notion_vector_store_etl_pipeline_spark.streaming.dedup_stream import (
        read_compaction_manifest,
    )

    man = read_compaction_manifest(f"{out}/ann", spark)
    return (man or {}).get("stale_through", -1)


if __name__ == "__main__":
    raise SystemExit(main())
