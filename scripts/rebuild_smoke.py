"""Recall decay under ingest drift, and what rebuild_ivf_index buys
(VERDICT r9 missing #2): a stored IVF index whose centroids were
sampled from the ORIGINAL corpus keeps assigning drifted arrivals via
append_ivf_delta — correct but crowded: the shifted vectors pile into
the few lists nearest the old distribution, so a fixed-n_probes probe
of shifted QUERIES scans an ever-smaller fraction of the true
neighbors and recall@10 decays. rebuild_ivf_index resamples centroids
from the union and reassigns; recall recovers.

Synthetic by necessity: the fixture embeddings carry no distribution
shift, so the drift is constructed — a Gaussian mixture around one set
of cluster centers for the corpus, a DIFFERENT set for the arrivals,
fixed seed. Everything else (index build, delta append, rebuild,
probe) is the production operator path.

Usage: python scripts/rebuild_smoke.py [n_base] [n_new] [dim]
Prints one markdown table (for SCALE_SMOKE_R10.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark import get_spark
from notion_vector_store_etl_pipeline_spark.operators.similarity import (
    append_ivf_delta,
    ivf_coarse_rerank,
    load_ivf_index,
    load_ivf_index_with_deltas,
    nearest_lists_numpy,
    quantize_and_assign,
    quantize_codes,
    rebuild_ivf_index,
    refresh_centroids,
    write_ivf_index,
)

N_PROBES = 2
TOPK = 10
N_QUERIES = 50
SHIFT = 1.5  # partial drift: new region overlaps the old one, so stale
# assignments SCATTER across old lists (recall decay) while the
# densest new pocket still CROWDS one list (probe-cost blowup) — both
# documented failure modes in one scenario
SPREAD = 0.3


def mixture(rng, n, centers, dim, spread=SPREAD, id_base=0):
    """Gaussian mixture rows (vec_id, emb) around the given centers."""
    which = rng.integers(0, len(centers), n)
    pts = centers[which] + rng.normal(0.0, spread, (n, dim))
    return [(id_base + i, [float(x) for x in pts[i]]) for i in range(n)]


def probe(spark, index, c_ids, c_mat, q_ids, q_mat):
    """The production probe shape (stored-index path of
    plans/vector_queries._ivf_quantized_probe) against an arbitrary
    query batch. Also returns the mean candidate-rows scanned per
    query — the probe-COST half of the drift story (a crowded stale
    list makes every probe of it pay for the whole drifted pile)."""
    q_codes, q_norms = quantize_codes(q_mat)
    lists = nearest_lists_numpy(q_mat, c_ids, c_mat, N_PROBES)
    probes = spark.createDataFrame(
        [
            (int(q_ids[i]), [float(x) for x in q_mat[i]],
             [int(x) for x in q_codes[i]], float(q_norms[i]), int(lid))
            for i in range(len(q_ids))
            for lid in lists[i]
        ],
        "query_id long, q_emb array<double>, q_quant array<long>, q_qn double, list_id long",
    )
    needed = sorted({int(lid) for row in lists for lid in row})
    cands = index.filter(F.col("list_id").isin(needed)).join(
        F.broadcast(probes), "list_id"
    )
    n_cands = cands.count()
    pairs = {
        (r.query_id, r.cand_id)
        for r in ivf_coarse_rerank(cands, shortlist=3 * TOPK, topk=TOPK).collect()
    }
    return pairs, n_cands / len(q_ids)


def exact_topk(all_ids, all_mat, q_mat):
    unit = all_mat / np.linalg.norm(all_mat, axis=1, keepdims=True)
    q_unit = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    scores = np.round(q_unit @ unit.T, 6)
    out = {}
    for i in range(len(q_mat)):
        order = np.lexsort((all_ids, -scores[i]))[:TOPK]
        out[i] = set(all_ids[order])
    return out


def recall(spark, index, c_ids, c_mat, q_mat, truth):
    got, cands_per_q = probe(
        spark, index, c_ids, c_mat, np.arange(len(q_mat)) + 10**9, q_mat
    )
    by_q = {}
    for q, c in got:
        by_q.setdefault(q - 10**9, set()).add(c)
    r = np.mean([
        len(by_q.get(i, set()) & truth[i]) / TOPK for i in range(len(q_mat))
    ])
    return r, cands_per_q


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    rng = np.random.default_rng(7)

    # corpus lives around centers A; the ingest stream DRIFTED to
    # centers B (disjoint region: shifted +3 along a random direction)
    centers_a = rng.normal(0.0, 1.0, (16, dim))
    centers_b = rng.normal(0.0, 1.0, (16, dim)) + SHIFT

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    schema = "vec_id long, emb array<double>"
    base_rows = mixture(rng, n_base, centers_a, dim, id_base=0)
    new_rows = mixture(rng, n_new, centers_b, dim, id_base=n_base)
    base_df = spark.createDataFrame(base_rows, schema)
    new_df = spark.createDataFrame(new_rows, schema)

    work = f"/tmp/nve_rebuild_smoke_{os.getpid()}"
    sample_mod = max(1, n_base // 64)  # ~64 lists sampled from the CORPUS
    s_ids, s_mat = refresh_centroids(base_df, sample_mod)
    base_path = f"{work}/base"
    write_ivf_index(
        spark,
        quantize_and_assign(base_df, s_ids, s_mat, topn=1, id_col="vec_id", emb_col="emb"),
        s_ids, s_mat, base_path,
    )
    delta_path = f"{work}/delta"
    t0 = time.time()
    append_ivf_delta(spark, new_df, base_path, delta_path)
    t_append = time.time() - t0

    # queries come from the DRIFTED distribution (today's traffic)
    q_mat = np.array([r[1] for r in mixture(rng, N_QUERIES, centers_b, dim)])
    all_ids = np.array([r[0] for r in base_rows + new_rows], dtype=np.int64)
    all_mat = np.array([r[1] for r in base_rows + new_rows])
    truth = exact_topk(all_ids, all_mat, q_mat)

    # how crowded did the stale assignment get? share of drifted
    # vectors in their single most popular list
    stale_index, c_ids, c_mat = load_ivf_index_with_deltas(spark, base_path, [delta_path])
    new_lists = (
        stale_index.filter(F.col("vec_id") >= n_base).groupBy("list_id").count()
        .orderBy(F.col("count").desc()).limit(3).collect()
    )
    crowd = [(int(r.list_id), int(r["count"])) for r in new_lists]
    r_stale, cands_stale = recall(spark, stale_index, c_ids, c_mat, q_mat, truth)

    t0 = time.time()
    rebuilt_path = f"{work}/rebuilt"
    rebuild_ivf_index(spark, base_path, [delta_path], rebuilt_path, sample_mod=sample_mod)
    t_rebuild = time.time() - t0
    rb_index, rb_ids, rb_mat = load_ivf_index(spark, rebuilt_path)
    rb_lists = (
        rb_index.filter(F.col("vec_id") >= n_base).groupBy("list_id").count()
        .orderBy(F.col("count").desc()).limit(3).collect()
    )
    crowd_rb = [(int(r.list_id), int(r["count"])) for r in rb_lists]
    r_rebuilt, cands_rb = recall(spark, rb_index, rb_ids, rb_mat, q_mat, truth)

    print(f"\nn_base={n_base} n_new={n_new} dim={dim} lists~{len(s_ids)} "
          f"n_probes={N_PROBES} shift={SHIFT} queries={N_QUERIES} (drifted)")
    print("| state | recall@10 (drifted queries) | cand rows scanned / query | top-3 list crowding of drifted vectors | op cost |")
    print("|---|---|---|---|---|")
    print(f"| base + stale-centroid delta | {r_stale:.3f} | {cands_stale:.0f} | {crowd} | append {t_append:.1f}s |")
    print(f"| after rebuild_ivf_index | {r_rebuilt:.3f} | {cands_rb:.0f} | {crowd_rb} | rebuild {t_rebuild:.1f}s |")

    import shutil
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
