"""Unified chain semantics on the EMBEDDING wing (VERDICT r12 #6): the
vector ingest-dedup probe (streaming/ann_stream.probe_vector_batch and
the streaming_vector_ingest dedup mode) shares the text wing's
``chain_policy`` contract. A planted cosine chain A~B~C (cos(A,B) and
cos(B,C) verify, cos(A,C) does not) resolves IDENTICALLY — B flagged
against A, C kept — whether the chain arrives one vector per
micro-batch, all in one batch, or through the one-pass batch twin
(sequential_firstwins_pairs over the verified cosine pairs, registered
as neardup_chain_sequential_cosine).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.operators.dedup import (
    sequential_firstwins_pairs,
)
from notion_vector_store_etl_pipeline_spark.operators.similarity import (
    cosine_selfjoin_pairs,
    quantize_and_assign,
    write_ivf_index,
)
from notion_vector_store_etl_pipeline_spark.streaming.ann_stream import (
    probe_vector_batch,
    streaming_vector_ingest,
)

THR = 0.5
S = 1 / math.sqrt(2)
# chain: cos(A,B) = cos(B,C) = ~0.707 >= THR; cos(A,C) = 0 < THR.
# D is the pre-existing corpus resident, near-dup of nothing.
VEC_A = [1.0, 0.0]
VEC_B = [S, S]
VEC_C = [0.0, 1.0]
VEC_D = [-1.0, -1.0]
# one centroid -> every vector shares the single IVF list (the probe
# is then exact within the list; centroid geometry is not under test)
CENT_IDS = np.array([0], dtype=np.int64)
CENT_MAT = np.array([[1.0, 1.0]], dtype=np.float64)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, list(v)) for i, v in rows], "vec_id: long, emb: array<double>"
    )


def _corpus(spark):
    return _df(spark, [(100, VEC_D)])


# ------------------------------------------------------------ one-pass


def test_onepass_sequential_keeps_chain_tail(spark):
    pairs = cosine_selfjoin_pairs(
        _df(spark, [(1, VEC_A), (2, VEC_B), (3, VEC_C)]),
        THR,
        id_col="vec_id",
        emb_col="emb",
        n_blocks=4,
    )
    got = sorted((r.a_id, r.b_id) for r in pairs.collect())
    assert got == [(1, 2), (2, 3)]  # the planted chain, nothing else
    seq = sorted(
        (r.a_id, r.b_id) for r in sequential_firstwins_pairs(pairs).collect()
    )
    assert seq == [(1, 2)]  # B flagged by A; C survives


def test_probe_batch_single_batch_policies(spark):
    batch = _df(spark, [(1, VEC_A), (2, VEC_B), (3, VEC_C)])
    flagged, clean = probe_vector_batch(
        batch, _corpus(spark), CENT_IDS, CENT_MAT, THR, probes=1
    )
    assert sorted((r.batch_id, r.corpus_id) for r in flagged.collect()) == [(2, 1)]
    assert sorted(r.vec_id for r in clean.collect()) == [1, 3]

    flagged_c, clean_c = probe_vector_batch(
        batch,
        _corpus(spark),
        CENT_IDS,
        CENT_MAT,
        THR,
        probes=1,
        chain_policy="conservative",
    )
    assert sorted((r.batch_id, r.corpus_id) for r in flagged_c.collect()) == [
        (2, 1),
        (3, 2),
    ]
    assert sorted(r.vec_id for r in clean_c.collect()) == [1]

    with pytest.raises(ValueError, match="chain_policy"):
        probe_vector_batch(
            batch, _corpus(spark), CENT_IDS, CENT_MAT, THR, chain_policy="nope"
        )


def test_probe_batch_same_id_is_update_not_dup(spark):
    # id 100 re-embedded: collides with its own corpus entry -> must
    # pass through clean (update), mirroring the text probe's rule
    batch = _df(spark, [(100, VEC_D)])
    flagged, clean = probe_vector_batch(
        batch, _corpus(spark), CENT_IDS, CENT_MAT, THR, probes=1
    )
    assert flagged.isEmpty()
    assert [r.vec_id for r in clean.collect()] == [100]


# ------------------------------------- chain split across micro-batches


def test_probe_batch_split_chain_matches_onepass(spark):
    """One vector per call, survivors accumulate into the corpus — the
    foreachBatch kernel's exact shape. Disposition must equal the
    one-pass sequential run: flagged {B}, clean {A, C}."""
    corpus = _corpus(spark)
    flagged_all = []
    for vid, vec in ((1, VEC_A), (2, VEC_B), (3, VEC_C)):
        batch = _df(spark, [(vid, vec)])
        flagged, clean = probe_vector_batch(
            batch, corpus, CENT_IDS, CENT_MAT, THR, probes=1
        )
        flagged_all += [(r.batch_id, r.corpus_id) for r in flagged.collect()]
        corpus = corpus.unionByName(clean).localCheckpoint(eager=True)
    assert sorted(flagged_all) == [(2, 1)]
    assert sorted(r.vec_id for r in corpus.collect()) == [1, 3, 100]


# --------------------------------------------------- the real stream


@pytest.mark.slow
def test_stream_ingest_dedup_matches_onepass(spark, tmp_path):
    """streaming_vector_ingest(dedup_threshold=...) with page_size=1 —
    the chain arrives one vector per micro-batch through the paginated
    source. The flagged ledger and the ingested survivors must equal
    the one-pass disposition."""
    base = str(tmp_path / "base")
    corpus = _corpus(spark)
    write_ivf_index(
        spark,
        quantize_and_assign(
            corpus, CENT_IDS, CENT_MAT, topn=1, id_col="vec_id", emb_col="emb"
        ),
        CENT_IDS,
        CENT_MAT,
        base,
    )
    src = str(tmp_path / "incoming.parquet")
    _df(spark, [(1, VEC_A), (2, VEC_B), (3, VEC_C)]).orderBy("vec_id").toPandas().rename(
        columns={"emb": "embedding"}
    ).to_parquet(src, index=False)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = streaming_vector_ingest(
        spark,
        src,
        base,
        out,
        ckpt,
        page_size=1,
        pages_per_batch=1,
        dedup_threshold=THR,
        dedup_probes=1,
    )
    q.processAllAvailable()
    q.stop()

    flagged = spark.read.parquet(f"{out}/flagged")
    assert sorted(
        (r.batch_id, r.corpus_id) for r in flagged.collect()
    ) == [(2, 1)]
    # consumer view: committed state = base resident + clean survivors
    from notion_vector_store_etl_pipeline_spark.streaming.ann_stream import (
        load_stream_ann_state,
    )

    vectors, _, _ = load_stream_ann_state(spark, out, base, before_batch=3)
    assert sorted(r.vec_id for r in vectors.select("vec_id").collect()) == [1, 3, 100]
