"""Streaming vector ingest into a stored IVF index (streaming/
ann_stream.py): the arriving vectors cross batch AND compaction
boundaries, and the consumer-side probe over the anchored state must
EQUAL a full rebuild over all vectors with the same centroids — the
streaming composition of the append/compact operators whose batch
equivalence tests/test_ann_recall.py pins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.functions import vectors as V
from notion_vector_store_etl_pipeline_spark.operators.similarity import (
    quantize_and_assign,
    write_ivf_index,
)
from notion_vector_store_etl_pipeline_spark.plans.vector_queries import (
    _ivf_centroids,
    _ivf_quantized_probe,
)
from notion_vector_store_etl_pipeline_spark.sources import load_table
from notion_vector_store_etl_pipeline_spark.streaming.ann_stream import (
    compact_ann_stream_state,
    load_stream_ann_state,
    streaming_vector_ingest,
)
from notion_vector_store_etl_pipeline_spark.streaming.dedup_stream import (
    read_compaction_manifest,
)

SF = "/root/testdata/sf0.01"


def test_stream_vector_ingest_across_compaction_matches_full(spark, tmp_path):
    """60% of the fixture's vectors form the stored base; the other 40%
    arrive as ~8 micro-batches with compact_every=3 (boundaries inside
    the stream). Afterwards the anchored state (compacted version +
    delta tail) must probe EXACTLY like a fresh full index built with
    the same centroids, the manifest must cover the folds, and pruned
    delta dirs must be gone."""
    emb = load_table(spark, SF, "embeddings")
    vecs = emb.select("vec_id", V.as_double("embedding").alias("emb"))
    arriving_pred = (F.col("vec_id") % 5) <= 1  # 40%
    resident = vecs.filter(~arriving_pred)
    c_ids, c_mat = _ivf_centroids(spark, SF)

    base = str(tmp_path / "base")
    write_ivf_index(
        spark,
        quantize_and_assign(
            resident, c_ids, c_mat, topn=1, id_col="vec_id", emb_col="emb"
        ),
        c_ids,
        c_mat,
        base,
    )

    src = str(tmp_path / "incoming.parquet")
    emb.select("vec_id", "embedding").filter(arriving_pred).orderBy(
        "vec_id"
    ).toPandas().to_parquet(src, index=False)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = streaming_vector_ingest(
        spark,
        src,
        base,
        out,
        ckpt,
        page_size=10,
        pages_per_batch=1,
        compact_every=3,
        prune_deltas=True,
    )
    q.processAllAvailable()
    q.stop()

    man = read_compaction_manifest(out)
    assert man is not None and man["version"] >= 2, man

    index, s_ids, s_mat = load_stream_ann_state(
        spark, out, base, before_batch=10**9
    )
    got = {
        (r.query_id, r.cand_id, r.score, r.rn)
        for r in _ivf_quantized_probe(
            spark, SF, index, s_ids, s_mat, prune_lists=True
        ).collect()
    }
    fresh = quantize_and_assign(
        vecs, c_ids, c_mat, topn=1, id_col="vec_id", emb_col="emb"
    )
    want = {
        (r.query_id, r.cand_id, r.score, r.rn)
        for r in _ivf_quantized_probe(spark, SF, fresh, c_ids, c_mat).collect()
    }
    assert got == want and got

    # every ingested vector is in the anchored state exactly once
    n_arriving = emb.filter(arriving_pred).count()
    n_resident = emb.filter(~arriving_pred).count()
    assert index.count() == n_arriving + n_resident

    # pruned: no delta dir at or below the watermark survives
    import os

    root = f"{out}/delta"
    left = [
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("batch_id=")
    ]
    assert all(bid > man["through_batch"] for bid in left), (left, man)

    # replay-safety: re-triggering the fold at the same watermark is a
    # no-op returning the published manifest unchanged
    again = compact_ann_stream_state(
        spark, out, man["through_batch"], base, prune_deltas=True
    )
    assert again == man


def test_stream_ann_rebuild_and_retention(spark, tmp_path):
    """The full in-stream IVF lifecycle (VERDICT r9 missing #2 + #3):
    a drifting ingest stream with compact_every=3, rebuild_every=2
    (every 2nd boundary refreshes centroids) and retain_versions=1.
    Afterwards (a) the anchored state probes EXACTLY like a fresh
    assignment of every ingested vector against the anchor's OWN
    sidecar — rebuilds and retention change nothing semantically;
    (b) the sidecar actually refreshed (differs from the stale base
    sample — arrivals joined the centroid carve-out); (c) only the
    retained index version survives on disk."""
    import os

    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        refresh_centroids,
    )

    emb = load_table(spark, SF, "embeddings")
    vecs = emb.select("vec_id", V.as_double("embedding").alias("emb"))
    arriving_pred = (F.col("vec_id") % 5) <= 1  # 40%, includes vec 0 (% 97 == 0)
    resident = vecs.filter(~arriving_pred)
    # STALE base sidecar: sampled from the resident population only
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
    src = str(tmp_path / "incoming.parquet")
    emb.select("vec_id", "embedding").filter(arriving_pred).orderBy(
        "vec_id"
    ).toPandas().to_parquet(src, index=False)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = streaming_vector_ingest(
        spark,
        src,
        base,
        out,
        ckpt,
        page_size=25,
        pages_per_batch=1,
        compact_every=3,
        prune_deltas=True,
        retain_versions=1,
        rebuild_every=2,
    )
    q.processAllAvailable()
    q.stop()

    man = read_compaction_manifest(out, spark)
    assert man is not None and man["version"] >= 2

    index, s_ids, s_mat = load_stream_ann_state(spark, out, base, before_batch=10**9)
    # (b) a rebuild ran: the anchored sidecar is not the stale base one
    assert list(s_ids) != list(stale_ids)

    # (a) anchored state == fresh assignment of all ingested vectors
    # against the anchor's own sidecar
    got = {
        (r.query_id, r.cand_id, r.score, r.rn)
        for r in _ivf_quantized_probe(
            spark, SF, index, s_ids, s_mat, prune_lists=True
        ).collect()
    }
    fresh = quantize_and_assign(
        vecs, s_ids, s_mat, topn=1, id_col="vec_id", emb_col="emb"
    )
    want = {
        (r.query_id, r.cand_id, r.score, r.rn)
        for r in _ivf_quantized_probe(spark, SF, fresh, s_ids, s_mat).collect()
    }
    assert got == want and got

    # (c) retention: only the live version dir remains
    versions = sorted(
        int(d[1:]) for d in os.listdir(f"{out}/index_versions") if d.startswith("v")
    )
    assert versions == [man["version"]], versions
