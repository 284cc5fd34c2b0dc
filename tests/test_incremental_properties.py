"""Property-based checks for the incremental planner (hypothesis over
randomized snapshot/state deltas — SURVEY §4 row 1 calls this the one
genuinely custom piece, so it gets invariants, not just examples):

  1. partition: to_process ∪ to_skip == snapshot (by block_id), disjoint
  2. skip soundness: every skipped row has prior state, unchanged edit
     time, and vector ids (the reference's cache-hit conjunction :691-694)
  3. stale set: only ids from rows flagged needs_vector AND not
     skipped (cache hits never delete), and exactly their
     vector_file_ids
  4. upsert closure: upsert keeps state keyed uniquely by block_id
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from notion_vector_store_etl_pipeline_spark.operators.incremental import (
    plan_increment,
    upsert_state,
)

# a compact universe keeps overlap between snapshot and state likely
IDS = st.integers(0, 14)
LETS = st.sampled_from(["t1", "t2", None])
HASHES = st.sampled_from(["h1", "h2", None])


snap_rows = st.lists(
    st.tuples(IDS, st.sampled_from(["t1", "t2"]), st.sampled_from(["h1", "h2"])),
    max_size=12,
    unique_by=lambda r: r[0],
)
state_rows = st.lists(
    st.tuples(IDS, LETS, HASHES, st.lists(st.sampled_from(["v1", "v2"]), max_size=2)),
    max_size=12,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snap=snap_rows, state=state_rows)
def test_plan_increment_invariants(spark, snap, state):
    snap_df = spark.createDataFrame(
        snap, "block_id int, let string, content_hash string"
    )
    state_df = spark.createDataFrame(
        state,
        "block_id int, prior_let string, prior_hash string, vector_file_ids array<string>",
    )
    plan = plan_increment(snap_df, state_df)

    proc = {r.block_id for r in plan.to_process.collect()}
    skip = {r.block_id for r in plan.to_skip.collect()}
    snap_ids = {r[0] for r in snap}

    assert proc | skip == snap_ids
    assert proc & skip == set()

    state_by_id = {r[0]: r for r in state}
    snap_by_id = {r[0]: r for r in snap}
    for b in skip:
        # state row exists (presence, not hash — the reference's skip
        # test :691-694 never consults the content hash)
        st_row = state_by_id[b]
        assert st_row[1] == snap_by_id[b][1]  # edit time unchanged
        assert st_row[3]  # has vector ids

    stale = {(r.block_id, r.stale_vector_id) for r in plan.stale_vectors.collect()}
    flagged = {r.block_id for r in plan.needs_vector.collect() if r.needs_vector}
    for b, vid in stale:
        assert b in flagged
        assert b not in skip  # cache hits never delete their vectors
        assert vid in state_by_id[b][3]

    # upsert closure: unique keys, processed rows win
    processed = plan.to_process.selectExpr(
        "block_id", "let AS prior_let", "content_hash AS prior_hash",
        "array('new') AS vector_file_ids",
    )
    nxt = upsert_state(state_df, processed).collect()
    assert len(nxt) == len({r.block_id for r in nxt})
    for r in nxt:
        if r.block_id in proc:
            assert list(r.vector_file_ids) == ["new"]
