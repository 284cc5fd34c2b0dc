"""Incremental-state lifecycle tests (SURVEY.md §5.3): the
new/changed/unchanged/resume matrix of the reference manifest
(`README.md:458-466`), exercised through plan_increment + upsert_state
+ commit_state round-trips.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.operators.incremental import (
    commit_state,
    plan_increment,
    upsert_state,
)


def _snapshot(spark, rows):
    return spark.createDataFrame(
        rows, "block_id: long, let: string, content_hash: string"
    )


def _state(spark, rows):
    return spark.createDataFrame(
        rows,
        "block_id: long, prior_let: string, prior_hash: string, "
        "vector_file_ids: array<string>",
    )


def test_first_run_everything_processes(spark):
    snap = _snapshot(spark, [(1, "t1", "h1"), (2, "t2", "h2")])
    state = _state(spark, [])
    plan = plan_increment(snap, state)
    assert sorted(r.block_id for r in plan.to_process.collect()) == [1, 2]
    assert plan.to_skip.count() == 0
    assert plan.stale_vectors.count() == 0
    nv = {r.block_id: r.needs_vector for r in plan.needs_vector.collect()}
    assert nv == {1: True, 2: True}


def test_unchanged_skips_changed_processes(spark):
    snap = _snapshot(spark, [(1, "t1", "h1"), (2, "t2-NEW", "h2"), (3, "t3", "h3")])
    state = _state(
        spark,
        [
            (1, "t1", "h1", ["v1"]),        # unchanged -> skip
            (2, "t2", "h2", ["v2"]),        # edit time moved -> process
            (3, "t3", "h3", []),            # no vectors -> process
        ],
    )
    plan = plan_increment(snap, state)
    assert [r.block_id for r in plan.to_skip.collect()] == [1]
    assert sorted(r.block_id for r in plan.to_process.collect()) == [2, 3]
    # block 2 holds old vectors while needing re-vectorization -> stale
    stale = {(r.block_id, r.stale_vector_id) for r in plan.stale_vectors.collect()}
    assert stale == {(2, "v2")}


def test_cache_hit_with_stale_hash_keeps_its_vectors(spark):
    """A skipped row must NEVER land in the delete set — the reference's
    cache-hit check (:691-694, edit time + ids only) returns before the
    needs-vector/delete branch, so a row whose stored hash differs but
    whose last_edited_time is unchanged keeps its live vectors. Without
    the ~to_skip guard such a row was skipped (state keeps its ids, doc
    never reprocessed) AND deleted: a permanently dangling document."""
    snap = _snapshot(spark, [(1, "t1", "hNEW")])
    state = _state(spark, [(1, "t1", "hOLD", ["v1", "v2"])])
    plan = plan_increment(snap, state)
    assert [r.block_id for r in plan.to_skip.collect()] == [1]
    assert plan.to_process.count() == 0
    assert plan.stale_vectors.count() == 0  # vectors stay live


def test_hash_change_needs_vector_even_if_let_same(spark):
    snap = _snapshot(spark, [(1, "t1", "h1-CHANGED")])
    state = _state(spark, [(1, "t1", "h1", ["v1"])])
    plan = plan_increment(snap, state)
    # cache-hit skip is let-based (reference F3) -> skipped
    assert [r.block_id for r in plan.to_skip.collect()] == [1]
    # but needs_vector flags the hash change (reference F4)
    nv = {r.block_id: r.needs_vector for r in plan.needs_vector.collect()}
    assert nv == {1: True}


def test_upsert_and_resume_roundtrip(spark, tmp_path):
    state = _state(spark, [(1, "t1", "h1", ["v1"]), (2, "t2", "h2", ["v2"])])
    processed = _state(spark, [(2, "t2-NEW", "h2b", ["v2b"]), (3, "t3", "h3", ["v3"])])
    merged = upsert_state(state, processed)
    got = {r.block_id: (r.prior_let, r.vector_file_ids) for r in merged.collect()}
    assert got == {
        1: ("t1", ["v1"]),
        2: ("t2-NEW", ["v2b"]),
        3: ("t3", ["v3"]),
    }
    # commit + reload = resume (interrupted-run semantics)
    path = str(tmp_path / "state")
    commit_state(merged, path)
    reloaded = spark.read.parquet(path)
    snap = _snapshot(spark, [(1, "t1", "hx"), (2, "t2-NEW", "h2b"), (3, "t3", "h3")])
    plan = plan_increment(snap, reloaded)
    assert plan.to_skip.count() == 3  # all lets match and all have ids


def test_crash_between_swap_renames_recovers_from_backup(spark, tmp_path):
    """Simulate the two-rename crash window: `path` has been renamed to
    `.old-*` but the new state never landed. The next commit must
    restore the backup (NOT delete it) so the prior state survives."""
    import os

    from notion_vector_store_etl_pipeline_spark.operators.incremental import (
        recover_state,
    )

    path = str(tmp_path / "state")
    commit_state(_state(spark, [(1, "t1", "h1", ["v1"])]), path)
    # crash: first rename happened, second never did
    os.rename(path, f"{path}.old-deadbeef")
    assert not os.path.exists(path)

    assert recover_state(path) is True
    reloaded = spark.read.parquet(path)
    assert [r.block_id for r in reloaded.collect()] == [1]

    # and commit_state itself performs the same restore before reading:
    os.rename(path, f"{path}.old-cafef00d")
    merged = upsert_state(
        _state(spark, [(1, "t1", "h1", ["v1"])]),  # stands in for reload
        _state(spark, [(2, "t2", "h2", ["v2"])]),
    )
    commit_state(merged, path)
    got = {r.block_id for r in spark.read.parquet(path).collect()}
    assert got == {1, 2}
    # backups are cleaned up only after the successful swap
    import glob

    assert glob.glob(f"{path}.old-*") == []


def test_commit_state_scheme_uri_swap_roundtrip(spark, tmp_path):
    """Drive the scheme'd (Hadoop FS) branch of commit_state with a
    file:// URI: the SAME tmp-write + swap + recover protocol as plain
    local paths, routed through the statefs shim. The old branch
    overwrote the path in place from a localCheckpoint — deleting the
    only copy before the new write was durable (r10 review finding).
    Includes the read-own-path-then-overwrite cycle: the tmp write
    materializes the plan before the live path is touched."""
    import os

    path = f"file://{tmp_path}/state"
    commit_state(_state(spark, [(1, "t1", "h1", ["v1"])]), path)
    assert spark.read.parquet(path).count() == 1

    # next-state plan reads `path` lazily, then overwrites the same path
    current = spark.read.parquet(path)
    merged = upsert_state(current, _state(spark, [(2, "t2", "h2", ["v2"])]))
    commit_state(merged, path)
    got = {r.block_id: r.prior_let for r in spark.read.parquet(path).collect()}
    assert got == {1: "t1", 2: "t2"}
    # the swap cleaned up: no tmp or backup siblings survive a commit
    local = str(tmp_path)
    assert [n for n in os.listdir(local) if n.startswith("state.")] == []

    # crash window on the URI path: state renamed away, new state never
    # landed — recover_state restores the backup through the shim
    os.rename(f"{local}/state", f"{local}/state.old-deadbeef")
    from notion_vector_store_etl_pipeline_spark.operators.incremental import (
        recover_state,
    )

    assert recover_state(path, spark=spark) is True
    assert {r.block_id for r in spark.read.parquet(path).collect()} == {1, 2}
