"""ANN quality gate: the IVF probe (`knn_ivf_approx`) must recover a
meaningful fraction of the exact brute-force top-k (`knn_topk`) — an
approximate index that returns arbitrary rows would still pass a
rows-only check, so recall against the exact oracle is the real test
(same role as the MinHash-LSH recall test in test_dedup.py).
"""

from __future__ import annotations

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
    quant = list(reg["knn_ivf_quantized"].fn(spark, SF).collect())
    assert quant, "quantized pipeline returned nothing"

    hits = sum(1 for r in quant if (r.query_id, r.cand_id) in exact)
    recall = hits / len(exact)
    # quantized coarse pass sits between the pure-IVF floor and exact;
    # int8 on 64-dim vectors loses little ordering information
    assert recall >= 0.3, f"quantized recall collapsed: {recall:.2f}"

    for r in quant:
        key = (r.query_id, r.cand_id)
        if key in exact:
            assert abs(r.score - exact[key]) < 1e-9, f"rerank score drift at {key}"
