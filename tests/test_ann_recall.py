"""ANN quality gate: the IVF probe (`knn_ivf_approx`) must recover a
meaningful fraction of the exact brute-force top-k (`knn_topk`) — an
approximate index that returns arbitrary rows would still pass a
rows-only check, so recall against the exact oracle is the real test
(same role as the MinHash-LSH recall test in test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.plans import load_registry
from notion_vector_store_etl_pipeline_spark.plans.vector_queries import _ivf_neighbors

SF = "/root/testdata/sf0.01"


def test_ivf_recall_vs_brute_force(spark):
    reg = load_registry()
    exact = {
        (r.query_id, r.cand_id): r.rn
        for r in reg["knn_topk"].fn(spark, SF).collect()
    }
    approx = {(r.query_id, r.cand_id) for r in _ivf_neighbors(spark, SF).collect()}
    assert exact, "exact top-k returned nothing"

    hits = sum(1 for pair in exact if pair in approx)
    recall = hits / len(exact)
    # 4-of-N probes on synthetic embeddings: expect well above chance.
    # (measured ~0.5-0.9 on the fixtures; chance is ~probes/centroids)
    assert recall >= 0.3, f"IVF recall collapsed: {recall:.2f} ({hits}/{len(exact)})"

    # the approximate scores it does return must be EXACT cosine values:
    # rerank inside the probed lists is not allowed to approximate
    exact_scores = {
        (r.query_id, r.cand_id): r.score for r in reg["knn_topk"].fn(spark, SF).collect()
    }
    for r in _ivf_neighbors(spark, SF).collect():
        key = (r.query_id, r.cand_id)
        if key in exact_scores:
            assert abs(r.score - exact_scores[key]) < 1e-9, f"score drift at {key}"


def test_ivf_registered_recall_gate(spark):
    """The registered knn_ivf_approx query is a self-checking recall
    gate: one row per query vector, recall_ok TRUE for all of them."""
    reg = load_registry()
    rows = reg["knn_ivf_approx"].fn(spark, SF).collect()
    assert len(rows) == 5
    assert all(r.recall_ok for r in rows), rows


def test_ivf_quantized_recall_and_exact_rerank(spark):
    """Two-stage retrieval: int8 coarse pass must not wreck recall, and
    the final scores must be exact doubles (rerank repairs quantization)."""
    reg = load_registry()
    exact = {
        (r.query_id, r.cand_id): r.score
        for r in reg["knn_topk"].fn(spark, SF).collect()
    }
    from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
        _ivf_quantized_neighbors,
    )

    quant = list(_ivf_quantized_neighbors(spark, SF).collect())
    assert quant, "quantized pipeline returned nothing"

    # recall over DISTINCT pairs, with duplicates outlawed: per-row
    # counting lets a replication bug inflate hits (r10 test review)
    quant_keys = {(r.query_id, r.cand_id) for r in quant}
    assert len(quant_keys) == len(quant), "duplicate pairs in quantized output"
    hits = sum(1 for k in quant_keys if k in exact)
    recall = hits / len(exact)
    # quantized coarse pass sits between the pure-IVF floor and exact;
    # int8 on 64-dim vectors loses little ordering information
    assert recall >= 0.3, f"quantized recall collapsed: {recall:.2f}"

    for r in quant:
        key = (r.query_id, r.cand_id)
        if key in exact:
            assert abs(r.score - exact[key]) < 1e-9, f"rerank score drift at {key}"


def test_ivf_quantized_registered_recall_gate(spark):
    """The registered knn_ivf_quantized query is the same self-checking
    recall gate shape as knn_ivf_approx (VERDICT r4 item 5)."""
    reg = load_registry()
    rows = reg["knn_ivf_quantized"].fn(spark, SF).collect()
    assert len(rows) == 5
    assert all(r.recall_ok for r in rows), rows


def test_lsh_registered_recall_gate(spark):
    """knn_lsh_cosine: the signed-random-projection LSH path clears the
    same per-query recall@10 floor (and reports the actual recall so a
    parameter regression is visible in the assertion message)."""
    reg = load_registry()
    rows = reg["knn_lsh_cosine"].fn(spark, SF).collect()
    assert len(rows) == 5
    assert all(r.recall_ok for r in rows), rows


def test_semdedup_matches_exact_within_cluster(spark):
    """semdedup survivors: every dropped vector has a lower-id
    same-cluster neighbor with cosine >= threshold, and every kept
    vector has none (exact numpy recomputation, independent of the
    kernel's own path)."""
    import numpy as np

    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        load_vectors_numpy,
    )
    from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
        _SEMDEDUP_THR,
    )

    reg = load_registry()
    rows = reg["semdedup_cluster_prune"].fn(spark, SF).collect()
    ids, mat = load_vectors_numpy(spark, SF)
    by_id = {int(i): mat[k] for k, i in enumerate(ids)}
    unit = {i: v / np.linalg.norm(v) for i, v in by_id.items()}

    clusters: dict[int, list[int]] = {}
    status = {}
    for r in rows:
        clusters.setdefault(r.cluster_id, []).append(r.vec_id)
        status[r.vec_id] = r.kept
    assert len(status) == len(ids)

    n_dropped = 0
    for members in clusters.values():
        members.sort()
        for j, vid in enumerate(members):
            has_lower_dup = any(
                round(float(unit[u] @ unit[vid]), 6) >= _SEMDEDUP_THR
                for u in members[:j]
            )
            assert status[vid] == (not has_lower_dup), vid
            n_dropped += has_lower_dup
    assert n_dropped > 0, "fixture produced no semantic duplicates; test is vacuous"


def test_collect_vectors_refuses_unbounded_input(spark):
    """collect_vectors is the one deliberate driver-side collect in the
    similarity wing; the row-count guard (VERDICT r6 item 6) must stop a
    future caller from handing it a full embedding table. The guard
    itself must be collect-safe: it limits to max_rows+1 BEFORE
    collecting, so checking a huge input never OOMs the driver."""
    import pytest as _pytest

    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        collect_vectors,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # bounded inputs pass through unchanged
    ids, mat = collect_vectors(emb.limit(5))
    assert len(ids) == 5 and mat.shape[0] == 5

    # over-limit inputs raise, and the message routes to the scale path
    with _pytest.raises(ValueError, match="block-partitioned"):
        collect_vectors(emb, max_rows=3)


def test_load_vectors_numpy_footer_guard_precedes_read(spark, monkeypatch):
    """The pyarrow fast path must refuse an oversized table from the
    parquet FOOTER alone (ADVICE r7): pq.read_table must never run for
    an input over the bound, otherwise the 'driver OOM guard' has
    already materialized the table it is guarding against."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from notion_vector_store_etl_pipeline_spark.operators import similarity as S

    def _boom(*a, **k):
        raise AssertionError("read_table ran before the footer guard")

    monkeypatch.setattr(pq, "read_table", _boom)
    with _pytest.raises(ValueError, match="bounded sidecar"):
        S.load_vectors_numpy(spark, SF, max_rows=3)


def test_ivf_stored_index_matches_fresh(spark, tmp_path, monkeypatch):
    """The stored-IVF contract (VERDICT r8 missing #3): probing the
    STORED index (write_ivf_index -> load_ivf_index, vectors
    partitioned by list_id, centroid sidecar) returns EXACTLY the
    neighbors the fresh build returns — same kernels, same centroids,
    same rounding — and the probe's list filter prunes the partitioned
    scan (pinned: the scan's partition filters mention list_id)."""
    monkeypatch.setenv("NVE_INDEX_CACHE_DIR", str(tmp_path / "cache"))
    from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
        _ivf_quantized_neighbors,
        _ivf_stored_neighbors,
    )

    fresh = {
        (r.query_id, r.cand_id, r.score, r.rn)
        for r in _ivf_quantized_neighbors(spark, SF).collect()
    }
    stored_df = _ivf_stored_neighbors(spark, SF)
    stored = {
        (r.query_id, r.cand_id, r.score, r.rn) for r in stored_df.collect()
    }
    assert stored == fresh and stored

    # partition pruning: the stored-vectors scan carries a PartitionFilters
    # entry on list_id (the probe's isin filter lands on the partition
    # column, so only the probed lists are read)
    plan = stored_df._sc._jvm.PythonSQLUtils.explainString(
        stored_df._jdf.queryExecution(), "formatted"
    )
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*list_id[^\]]*\]", plan)
    assert m, "probe scan has no partition filter on list_id"

    # memo hit: a second call must reuse the published index dir AND
    # must not run the build callable at all. The listing check alone
    # is insufficient: a regressed always-rebuild publishes into a
    # .build-<uuid> temp, loses the rename race against the existing
    # dir, and cleans up — listing byte-identical (r10 test review).
    import os

    import notion_vector_store_etl_pipeline_spark.operators.index_memo as IM

    cache = str(tmp_path / "cache")
    before = sorted(os.listdir(cache))
    builds: list[str] = []
    real_memoized = IM.memoized_index

    def counting(src, family, version, build):
        def wrapped(tmp):
            builds.append(tmp)
            return build(tmp)

        return real_memoized(src, family, version, wrapped)

    monkeypatch.setattr(IM, "memoized_index", counting)
    _ivf_stored_neighbors(spark, SF).collect()
    assert builds == [], "memo MISS: the second call rebuilt the index"
    assert sorted(os.listdir(cache)) == before


def test_ivf_incremental_matches_full(spark, tmp_path, monkeypatch):
    """Incremental-ingest soundness: base(90%) + per-run delta(10%)
    probes EXACTLY like the full rebuild — assignment is per-vector and
    centroid-relative, so union-of-assignments == assignment-of-union;
    no recall is lost by ingesting incrementally. Also pins partition
    pruning on the stored base."""
    monkeypatch.setenv("NVE_INDEX_CACHE_DIR", str(tmp_path / "cache"))
    from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
        _ivf_incremental_neighbors,
        _ivf_quantized_neighbors,
    )

    full = {
        (r.query_id, r.cand_id, r.score, r.rn)
        for r in _ivf_quantized_neighbors(spark, SF).collect()
    }
    inc_df = _ivf_incremental_neighbors(spark, SF)
    inc = {(r.query_id, r.cand_id, r.score, r.rn) for r in inc_df.collect()}
    assert inc == full and inc

    plan = inc_df._sc._jvm.PythonSQLUtils.explainString(
        inc_df._jdf.queryExecution(), "formatted"
    )
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*list_id[^\]]*\]", plan), (
        "stored base scan lost its list_id partition filter"
    )


def test_ivf_delta_append_and_compaction_equivalence(spark, tmp_path):
    """The on-disk lifecycle: write a base index over the resident
    vectors, append_ivf_delta for the arrivals (assigned against the
    base's OWN sidecar — the base is never rescanned for assignment),
    then (a) probing base+delta == probing a fresh index over ALL
    vectors with the same centroids, and (b) compact_ivf_index folds
    the trees into a version that probes bit-identically and carries
    the sidecar verbatim."""
    import numpy as np

    from notion_vector_store_etl_pipeline_spark.functions import vectors as V
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        append_ivf_delta,
        compact_ivf_index,
        load_ivf_index,
        load_ivf_index_with_deltas,
        quantize_and_assign,
        write_ivf_index,
    )
    from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
        _ivf_centroids,
        _ivf_quantized_probe,
    )
    from notion_vector_store_etl_pipeline_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    vecs = emb.select("vec_id", V.as_double("embedding").alias("emb"))
    resident = vecs.filter((F.col("vec_id") % 10) != 3)
    arrived = vecs.filter((F.col("vec_id") % 10) == 3)
    c_ids, c_mat = _ivf_centroids(spark, SF)

    base = str(tmp_path / "base")
    write_ivf_index(
        spark,
        quantize_and_assign(resident, c_ids, c_mat, topn=1, id_col="vec_id", emb_col="emb"),
        c_ids,
        c_mat,
        base,
    )
    delta = str(tmp_path / "delta0")
    append_ivf_delta(spark, arrived, base, delta)

    full = str(tmp_path / "full")
    write_ivf_index(
        spark,
        quantize_and_assign(vecs, c_ids, c_mat, topn=1, id_col="vec_id", emb_col="emb"),
        c_ids,
        c_mat,
        full,
    )

    def probe(index, ids, mat):
        return {
            (r.query_id, r.cand_id, r.score, r.rn)
            for r in _ivf_quantized_probe(
                spark, SF, index, ids, mat, prune_lists=True
            ).collect()
        }

    want = probe(*load_ivf_index(spark, full))
    got = probe(*load_ivf_index_with_deltas(spark, base, [delta]))
    assert got == want and got

    compacted = str(tmp_path / "v1")
    compact_ivf_index(spark, base, [delta], compacted)
    assert probe(*load_ivf_index(spark, compacted)) == want

    # sidecar carried verbatim; vector sets identical
    s_base = sorted(map(tuple, spark.read.parquet(f"{base}/centroids").collect()))
    s_comp = sorted(map(tuple, spark.read.parquet(f"{compacted}/centroids").collect()))
    assert s_comp == s_base
    n_full = spark.read.parquet(f"{full}/vectors").count()
    assert spark.read.parquet(f"{compacted}/vectors").count() == n_full


def test_ivf_rebuild_equals_fresh_on_union(spark, tmp_path):
    """Centroid refresh (VERDICT r9 missing #2): a base index built
    with STALE centroids (sampled from the resident 90% only) plus a
    delta assigned against those same stale centroids, rebuilt via
    rebuild_ivf_index, must be IDENTICAL to a fresh index built from
    scratch over the full population with refreshed centroids — same
    sidecar, same per-vector assignment/codes/norms, same probe
    results. Rebuild-from-stored-state loses nothing vs
    rebuild-from-scratch."""
    from notion_vector_store_etl_pipeline_spark.functions import vectors as V
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        append_ivf_delta,
        load_ivf_index,
        quantize_and_assign,
        rebuild_ivf_index,
        refresh_centroids,
        write_ivf_index,
    )
    from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
        _ivf_quantized_probe,
    )
    from notion_vector_store_etl_pipeline_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    vecs = emb.select("vec_id", V.as_double("embedding").alias("emb"))
    # odd/even split so the centroid carve-out (% 97 == 0) lands ids in
    # BOTH halves (97 itself arrives) — the refreshed sidecar must
    # actually differ from the stale one for this test to bite
    resident = vecs.filter((F.col("vec_id") % 2) == 0)
    arrived = vecs.filter((F.col("vec_id") % 2) == 1)

    # stale sidecar: centroids sampled from the RESIDENT population
    # only — the arrivals had no say, the drift scenario
    stale_ids, stale_mat = refresh_centroids(resident)
    base = str(tmp_path / "base")
    write_ivf_index(
        spark,
        quantize_and_assign(
            resident, stale_ids, stale_mat, topn=1, id_col="vec_id", emb_col="emb"
        ),
        stale_ids,
        stale_mat,
        base,
    )
    delta = str(tmp_path / "delta0")
    append_ivf_delta(spark, arrived, base, delta)

    rebuilt = str(tmp_path / "rebuilt")
    rebuild_ivf_index(spark, base, [delta], rebuilt)

    fresh = str(tmp_path / "fresh")
    f_ids, f_mat = refresh_centroids(vecs)
    write_ivf_index(
        spark,
        quantize_and_assign(vecs, f_ids, f_mat, topn=1, id_col="vec_id", emb_col="emb"),
        f_ids,
        f_mat,
        fresh,
    )

    # refreshed sidecar == fresh sidecar, and both DIFFER from the
    # stale one (arrival ids in the % 97 == 0 carve-out join it)
    s_rebuilt = sorted(map(tuple, spark.read.parquet(f"{rebuilt}/centroids").collect()))
    s_fresh = sorted(map(tuple, spark.read.parquet(f"{fresh}/centroids").collect()))
    s_stale = sorted(map(tuple, spark.read.parquet(f"{base}/centroids").collect()))
    assert s_rebuilt == s_fresh
    assert s_rebuilt != s_stale

    # per-vector state identical: assignment, quantized norm, codes
    def index_rows(path):
        return {
            (r.vec_id, r.list_id, r.qn, tuple(r.q))
            for r in spark.read.parquet(f"{path}/vectors")
            .select("vec_id", "list_id", "qn", "q")
            .collect()
        }

    assert index_rows(rebuilt) == index_rows(fresh)

    def probe(path):
        index, ids, mat = load_ivf_index(spark, path)
        return {
            (r.query_id, r.cand_id, r.score, r.rn)
            for r in _ivf_quantized_probe(
                spark, SF, index, ids, mat, prune_lists=True
            ).collect()
        }

    got = probe(rebuilt)
    assert got == probe(fresh) and got


def test_ivf_blocked_pairs_subset_of_exact(spark):
    """The blocked near-dup pair set must be a strict SUBSET of the
    exact all-pairs result with IDENTICAL scores (blocking may only
    lose candidates, never invent or re-score them), its recall must
    be meaningful, and recall must be monotone in `probes` (probes=2
    lists are per-vector supersets of probes=1, so co-residence can
    only grow)."""
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        cosine_selfjoin_pairs,
        ivf_blocked_pairs,
    )
    from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
        _SEMDEDUP_THR,
        _ivf_centroids,
    )
    from notion_vector_store_etl_pipeline_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    exact = {
        (r.a_id, r.b_id): r.score
        for r in cosine_selfjoin_pairs(
            emb, _SEMDEDUP_THR, n_blocks=8
        ).collect()
    }
    assert exact, "exact baseline returned nothing"

    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    c_ids, c_mat = _ivf_centroids(spark, SF)
    by_probe = {}
    for probes in (1, 2):
        got = {
            (r.a_id, r.b_id): r.score
            for r in ivf_blocked_pairs(
                vecs, c_ids, c_mat, _SEMDEDUP_THR, probes=probes
            ).collect()
        }
        for pair, score in got.items():
            assert pair in exact, f"blocked invented pair {pair}"
            assert abs(score - exact[pair]) < 1e-9, f"score drift at {pair}"
        by_probe[probes] = got

    assert set(by_probe[1]) <= set(by_probe[2]), "probes must be monotone"
    recall = len(by_probe[2]) / len(exact)
    assert recall >= 0.5, f"blocked pair recall collapsed: {recall:.2f}"


def test_blocked_components_refine_exact(spark):
    """Components over the blocked pair subgraph must REFINE the exact
    components: two ids in one blocked cluster are always in one exact
    cluster (missing edges can only split clusters, never merge
    unrelated ones)."""
    reg = load_registry()
    exact = {
        r.vec_id: r.component_id
        for r in reg["neardup_components"].fn(spark, SF).collect()
    }
    blocked = reg["neardup_components_ivf_blocked"].fn(spark, SF).collect()
    assert len(blocked) == len(exact)

    by_cluster: dict = {}
    for r in blocked:
        by_cluster.setdefault(r.component_id, set()).add(exact[r.vec_id])
    for cid, exact_ids in by_cluster.items():
        assert len(exact_ids) == 1, (
            f"blocked cluster {cid} spans exact clusters {exact_ids}"
        )


def test_ivf_blocked_probe_subset_and_sides(spark):
    """The incremental probe must emit only batch x corpus pairs (no
    intra-batch, no corpus x corpus), every pair must exist in the
    exact bipartite result with an identical score, and recall vs the
    exact bipartite baseline must be meaningful."""
    from notion_vector_store_etl_pipeline_spark.plans import load_registry
    from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
        _SEMDEDUP_THR,
    )
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        cosine_selfjoin_pairs,
    )
    from notion_vector_store_etl_pipeline_spark.sources import load_table

    reg = load_registry()
    got = reg["neardup_probe_ivf_blocked"].fn(spark, SF).collect()
    assert got, "probe returned nothing"
    for r in got:
        assert r.batch_id % 10 == 0, f"non-batch id on batch side: {r.batch_id}"
        assert r.corpus_id % 10 != 0, f"batch id on corpus side: {r.corpus_id}"

    emb = load_table(spark, SF, "embeddings")
    exact_bi = {
        (r.a_id, r.b_id): r.score
        for r in cosine_selfjoin_pairs(emb, _SEMDEDUP_THR, n_blocks=8).collect()
        if (r.a_id % 10 == 0) != (r.b_id % 10 == 0)
    }
    # recall over DISTINCT pairs with duplicates outlawed: per-row
    # counting lets a replication bug emit each true pair k times and
    # report recall > actual (even > 1.0) while losing distinct pairs
    keys = [
        (min(r.batch_id, r.corpus_id), max(r.batch_id, r.corpus_id)) for r in got
    ]
    assert len(set(keys)) == len(keys), "duplicate pairs emitted by the probe"
    for r, key in zip(got, keys):
        assert key in exact_bi, f"probe invented pair {key}"
        assert abs(r.score - exact_bi[key]) < 1e-9, f"score drift at {key}"
    assert len(set(keys)) / len(exact_bi) >= 0.1, (len(keys), len(exact_bi))


def test_probe_stored_matches_fresh(spark):
    """The stored-index probe must be value-identical to the fresh
    probe (same sidecar carve-out, same top-P replication — the index
    is just the corpus-side assignment materialized once)."""
    from notion_vector_store_etl_pipeline_spark.plans import load_registry

    reg = load_registry()
    fresh = {
        (r.batch_id, r.corpus_id): r.score
        for r in reg["neardup_probe_ivf_blocked"].fn(spark, SF).collect()
    }
    stored = {
        (r.batch_id, r.corpus_id): r.score
        for r in reg["neardup_probe_ivf_stored"].fn(spark, SF).collect()
    }
    assert fresh and stored == fresh


def test_blocked_neardup_skew_guard_preserves_pairs(spark, monkeypatch):
    """The hot-list sub-blocking (lists > MAX_BLOCK_ROWS split into
    hash block pairs; probe corpus side hash-split with batch
    replicated) must preserve the EXACT pair sets: force every list to
    sub-block by shrinking the block cap and compare against the
    one-task-per-list output."""
    from notion_vector_store_etl_pipeline_spark.operators import similarity as S
    from notion_vector_store_etl_pipeline_spark.plans import load_registry

    reg = load_registry()
    base_pairs = {
        (r.a_id, r.b_id, r.score)
        for r in reg["neardup_pairs_ivf_blocked"].fn(spark, SF).collect()
    }
    base_probe = {
        (r.batch_id, r.corpus_id, r.score)
        for r in reg["neardup_probe_ivf_blocked"].fn(spark, SF).collect()
    }
    assert base_pairs and base_probe

    # 500 vectors over ~6 lists => every list far exceeds a cap of 8
    monkeypatch.setattr(S, "MAX_BLOCK_ROWS", 8)
    forced_pairs = {
        (r.a_id, r.b_id, r.score)
        for r in reg["neardup_pairs_ivf_blocked"].fn(spark, SF).collect()
    }
    forced_probe = {
        (r.batch_id, r.corpus_id, r.score)
        for r in reg["neardup_probe_ivf_blocked"].fn(spark, SF).collect()
    }
    assert forced_pairs == base_pairs
    assert forced_probe == base_probe


def test_pairs_stored_matches_fresh(spark):
    """The stored-index corpus sweep must be value-identical to the
    fresh blocked pairs (same centroid carve-out, same top-P
    replication — the index is the full-population assignment
    materialized once), and its plan must contain NO assignment kernel:
    every list_id comes off the stored tree."""
    from notion_vector_store_etl_pipeline_spark.plans import load_registry

    reg = load_registry()
    fresh = {
        (r.a_id, r.b_id): r.score
        for r in reg["neardup_pairs_ivf_blocked"].fn(spark, SF).collect()
    }
    stored_df = reg["neardup_pairs_ivf_stored"].fn(spark, SF)
    stored = {(r.a_id, r.b_id): r.score for r in stored_df.collect()}
    assert fresh and stored == fresh
    plan = stored_df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, "stored pairs recomputed the assignment"


def test_refresh_centroids_auto_mod(spark, monkeypatch):
    """sample_mod=None derives the carve: identical to the fixed %97 at
    fixture scale, and capped by MAX_REFRESH_CENTROIDS when the
    population outgrows it — the driver-side sidecar collect can never
    hit the collect_vectors guard (a fixed 97 raises at ~9.7M
    vectors)."""
    from notion_vector_store_etl_pipeline_spark.operators import similarity as S
    from notion_vector_store_etl_pipeline_spark.functions import vectors as V
    from notion_vector_store_etl_pipeline_spark.sources import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    vecs = emb.select("vec_id", V.as_double("embedding").alias("emb"))
    auto_ids, auto_mat = S.refresh_centroids(vecs)
    fix_ids, fix_mat = S.refresh_centroids(vecs, sample_mod=97)
    assert (auto_ids == fix_ids).all() and (auto_mat == fix_mat).all()

    # shrink the ceiling so the cap bites: n=500, ceiling=2 -> mod=250
    monkeypatch.setattr(S, "MAX_REFRESH_CENTROIDS", 2)
    cap_ids, _ = S.refresh_centroids(vecs)
    n = vecs.count()
    assert len(cap_ids) <= 2 + 1  # ceil keeps the count at/under the cap
    assert set(cap_ids) == {
        r.vec_id for r in vecs.filter(F.col("vec_id") % max(97, -(-n // 2)) == 0).collect()
    }


def test_zero_norm_vectors_never_outrank_real_scores(spark):
    """A zero-norm embedding has no defined cosine — its NaN score used
    to sort ABOVE every real score in the descending top-k window
    (Spark orders NaN first), putting garbage at rank 1 of every query
    while the SQL oracle (NULL from 0-division) excluded it. The scoring
    kernel now drops NaN rows at the source."""
    import numpy as np

    from notion_vector_store_etl_pipeline_spark.operators import similarity as S

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (100, [0.0, 0.0]),  # zero norm: undefined similarity
    ]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    scored = S.cosine_scores_vs(
        emb, np.array([1], dtype=np.int64), np.array([[1.0, 0.0]])
    ).collect()
    by_cand = {r.cand_id: r.score for r in scored}
    assert 100 not in by_cand, "zero-norm candidate must be dropped, not NaN"
    assert all(not np.isnan(s) for s in by_cand.values())
    top = max(by_cand.items(), key=lambda kv: kv[1])
    assert top[0] == 1  # the true best candidate, not the zero vector

    # zero-norm QUERY: all its scores are undefined -> no output rows
    scored_q = S.cosine_scores_vs(
        emb, np.array([100], dtype=np.int64), np.array([[0.0, 0.0]])
    ).collect()
    assert scored_q == []


def test_collect_vectors_empty_is_2d_and_unit_matrix_guards(spark):
    """Empty vector sets: collect_vectors keeps the matrix 2-D (shape
    (0, 0), not (0,)), and _unit_matrix refuses empty/1-D input with an
    actionable message instead of a numpy AxisError three kernels deep
    (the failure mode of a centroid carve matching zero rows)."""
    import numpy as np
    import pytest

    from notion_vector_store_etl_pipeline_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [], "vec_id: long, embedding: array<double>"
    )
    ids, mat = S.collect_vectors(emb)
    assert ids.shape == (0,) and mat.shape == (0, 0)
    with pytest.raises(ValueError, match="non-empty"):
        S._unit_matrix(ids, mat)


def test_load_vectors_numpy_falls_back_on_arrow_invalid(spark, monkeypatch):
    """pyarrow raises ArrowInvalid (a ValueError, NOT an OSError) for
    URI schemes it has no filesystem for (s3a://, dbfs:/) — the
    documented fall-back-to-Spark path must catch it. Simulated by
    making the pyarrow fast path raise exactly that."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from notion_vector_store_etl_pipeline_spark.operators import similarity as S

    def _boom(path):
        raise pa.lib.ArrowInvalid(f"Unrecognized filesystem type in URI: {path}")

    monkeypatch.setattr(pq, "ParquetFile", _boom)
    ids, mat = S.load_vectors_numpy(spark, SF)
    assert len(ids) > 0 and mat.ndim == 2 and mat.shape[0] == len(ids)
