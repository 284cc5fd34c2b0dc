"""Winnowing properties (Schleimer et al., SIGMOD'03): the Spark
implementation must equal a pure-Python replica on arbitrary inputs,
and the scheme's match guarantee must hold — two documents sharing a
run of >= w + k - 1 words share at least one selected fingerprint.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.plans.pipeline_queries import _WINNOW_W

K = 3  # word-shingle size (matches winnowing_fingerprint)


def _h(shingle: str) -> int:
    return int(hashlib.md5(shingle.encode()).hexdigest()[:15], 16)


def winnow_py(words: list[str]) -> set[int]:
    """Pure-Python replica of the registered query's selection."""
    if len(words) < K + _WINNOW_W - 1:
        return set()
    hashes = [_h(" ".join(words[i : i + K])) for i in range(len(words) - K + 1)]
    return {
        min(hashes[i : i + _WINNOW_W]) for i in range(len(hashes) - _WINNOW_W + 1)
    }


WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"])
DOC = st.lists(WORD, min_size=0, max_size=24)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(DOC, min_size=1, max_size=6))
def test_spark_matches_python_replica(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    from notion_vector_store_etl_pipeline_spark.plans.pipeline_queries import (
        _md5_bigint,
    )

    ws = F.split(F.trim("text"), r"\s+")
    h = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 2),
        lambda i: _md5_bigint(
            F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1), F.element_at(ws, i + 2)
            )
        ),
    )
    sel = F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(h) - (_WINNOW_W - 1)),
                lambda i: F.array_min(F.slice(h, i, _WINNOW_W)),
            )
        )
    )
    got = {
        r.doc_id: set(r.fps)
        for r in df.filter(F.size(ws) >= 3 + _WINNOW_W - 1)
        .select("doc_id", sel.alias("fps"))
        .collect()
    }
    want = {
        i: winnow_py([w for w in " ".join(ws).split() if w])
        for i, ws in enumerate(docs)
        if len([w for w in ws if w]) >= K + _WINNOW_W - 1
    }
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    run=st.lists(WORD, min_size=K + _WINNOW_W - 1, max_size=K + _WINNOW_W + 4),
    pre_a=st.lists(WORD, max_size=6),
    post_a=st.lists(WORD, max_size=6),
    pre_b=st.lists(WORD, max_size=6),
    post_b=st.lists(WORD, max_size=6),
)
def test_match_guarantee(run, pre_a, post_a, pre_b, post_b):
    """Any shared word run of length >= k + w - 1 yields a shared
    fingerprint, regardless of surrounding context (pure-Python level —
    the Spark equality above transfers the property)."""
    a = winnow_py(pre_a + run + post_a)
    b = winnow_py(pre_b + run + post_b)
    assert a & b, (pre_a, run, post_a, pre_b, post_b)
