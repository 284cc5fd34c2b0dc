"""End-to-end pipeline test (SURVEY.md §3): two consecutive runs over a
changing corpus must (1) process only new/changed docs, (2) produce
deterministic chunk ids, (3) converge to all-skip on an unchanged
re-run — the reference's incremental contract (`README.md:458-466`).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.pipeline import run_pipeline


def _snapshot(spark, rows):
    df = spark.createDataFrame(rows, "block_id: long, src: string, let: string, text: string")
    return df.withColumn("content_hash", F.sha2("text", 256))


@pytest.mark.slow
def test_two_run_incremental_convergence(spark):
    state0 = spark.createDataFrame(
        [],
        "block_id: long, prior_let: string, prior_hash: string, vector_file_ids: array<string>",
    )
    snap1 = _snapshot(
        spark,
        [
            (1, "srcA", "t1", "aaaa\nbbbb\ncccc"),
            (2, "srcB", "t1", "dddd"),
        ],
    )
    # run 1: everything processes
    r1 = run_pipeline(snap1, state0, max_len=8)
    assert r1.plan.to_skip.count() == 0
    assert r1.records.count() == 3  # doc1 -> 2 chunks, doc2 -> 1
    assert r1.stale_vectors.count() == 0
    state1 = r1.next_state
    ids1 = {r.block_id: r.vector_file_ids for r in state1.collect()}
    assert len(ids1[1]) == 2 and len(ids1[2]) == 1

    # run 2: doc2 edited, doc3 new, doc1 unchanged
    snap2 = _snapshot(
        spark,
        [
            (1, "srcA", "t1", "aaaa\nbbbb\ncccc"),
            (2, "srcB", "t2", "dddd-edited"),
            (3, "srcC", "t1", "eeee"),
        ],
    )
    r2 = run_pipeline(snap2, state1, max_len=8)
    assert sorted(r.block_id for r in r2.plan.to_skip.collect()) == [1]
    assert sorted(r.block_id for r in r2.plan.to_process.collect()) == [2, 3]
    # doc2's old chunk ids are the stale-delete set
    stale = {(r.block_id, r.stale_vector_id) for r in r2.stale_vectors.collect()}
    assert {b for b, _ in stale} == {2}
    assert {v for _, v in stale} == set(ids1[2])
    state2 = r2.next_state
    assert state2.count() == 3

    # run 3: nothing changed -> full skip, state fixpoint
    r3 = run_pipeline(snap2, state2, max_len=8)
    assert r3.plan.to_process.count() == 0
    assert r3.records.count() == 0
    assert sorted(r.block_id for r in r3.plan.to_skip.collect()) == [1, 2, 3]


def test_chunk_ids_are_run_independent(spark):
    state0 = spark.createDataFrame(
        [], "block_id: long, prior_let: string, prior_hash: string, vector_file_ids: array<string>"
    )
    snap = _snapshot(spark, [(1, "srcA", "t1", "hello world")])
    a = run_pipeline(snap, state0).records.select("id").collect()
    b = run_pipeline(snap, state0).records.select("id").collect()
    assert a == b


def test_extract_stage_is_pluggable(spark):
    state0 = spark.createDataFrame(
        [], "block_id: long, prior_let: string, prior_hash: string, vector_file_ids: array<string>"
    )
    snap = _snapshot(spark, [(1, "srcA", "t1", "raw-bytes")])

    def shouty_extract(df):
        return df.withColumn("text", F.upper("text"))

    out = run_pipeline(snap, state0, extract=shouty_extract)
    assert [r.text for r in out.chunks.collect()] == ["RAW-BYTES"]


def test_zero_chunk_doc_is_recorded_in_state(spark):
    """A doc whose text yields no chunks (empty/whitespace) must still
    land in next_state — the reference writes its manifest entry
    unconditionally (`:719-731`). Deriving state from chunks alone left
    the OLD state row alive (still claiming the previous version's
    vector ids), so every later run re-emitted the same already-deleted
    ids as stale (r10 review)."""
    from notion_vector_store_etl_pipeline_spark.operators.incremental import (
        plan_increment,
    )

    # run 1: doc 1 has real text and gets vectors
    snap1 = _snapshot(spark, [(1, "srcA", "t1", "real text " * 30)])
    empty_state = spark.createDataFrame(
        [],
        "block_id: long, prior_let: string, prior_hash: string, "
        "vector_file_ids: array<string>",
    )
    r1 = run_pipeline(snap1, empty_state)
    s1 = {r.block_id: r for r in r1.next_state.collect()}
    assert s1[1].vector_file_ids  # has vectors

    # run 2: the doc's text becomes whitespace-only -> zero chunks
    snap2 = _snapshot(spark, [(1, "srcA", "t2", "   ")])
    r2 = run_pipeline(snap2, r1.next_state)
    # the old ids are deleted exactly once
    stale2 = {r.stale_vector_id for r in r2.stale_vectors.collect()}
    assert stale2 == set(s1[1].vector_file_ids)
    s2 = {r.block_id: r for r in r2.next_state.collect()}
    assert 1 in s2, "zero-chunk doc missing from state"
    assert s2[1].prior_let == "t2" and s2[1].vector_file_ids == []

    # run 3 (same snapshot): nothing stale — the delete is not re-emitted
    r3 = run_pipeline(snap2, r2.next_state)
    assert r3.stale_vectors.count() == 0
    plan3 = plan_increment(snap2, r2.next_state)
    # (reference semantics: no ids -> not a cache hit -> reprocessed,
    # but with nothing to delete and state staying converged)
    assert {r.block_id for r in plan3.to_process.collect()} == {1}
