"""The composed streaming flagship: the reference's ONE ``run_etl``
lifecycle — crawl -> skip-unchanged -> dedup -> chunk -> embed -> index
(``Notion_openai_vector_etl.py:617-778``) — as a single ``foreachBatch``
pipeline over the engine's streaming wings, proving the stages'
checkpoints and manifests compose instead of fighting (VERDICT r9
next-round #4).

Stages per micro-batch, each the streaming twin of a registered batch
operator:

1. **paginated source** — pages of the incoming feed; resume owned by
   the Spark checkpoint (the reference's cursor walk, ``:640``).
2. **incremental skip** — sha2 content hash vs the accumulated
   ``state/`` tree: a doc whose (doc_id, content_hash) was already
   processed is dropped (the reference's manifest cache-hit, ``:664``;
   batch twin: ``plans/incremental_queries.incremental_changed``).
3. **dedup probe** — :func:`streaming.dedup_stream.probe_batch`
   against the STORED LSH corpus index: flagged near-dups diverted,
   survivors continue (``run_etl`` has no dedup — this is the
   engine-extension stage the training-data pipeline needs).
4. **chunk** — the same Arrow-free chunk stage as the plain streaming
   ETL (streaming/pipeline.py ``chunk_stage``; reference ``:310-326``).
5. **embed + index** — each chunk gets a deterministic
   :func:`functions.vectors.hash_embedding` (the model stand-in; the
   engine's contract is the plumbing) and is assigned against the
   stored IVF index's OWN centroid sidecar, landing as a
   ``batch_id``-keyed ``list_id``-sorted delta under
   ``<out>/ann`` — the exact layout ``streaming.ann_stream`` owns
   (plain sorted files per micro-batch; the fold restores the
   partitioned layout), so
   ``load_stream_ann_state(spark, f"{out}/ann", ivf_index_path, ...)``
   probes the pipeline's output directly and
   ``compact_ann_stream_state`` (including
   ``rebuild_centroids=True``) applies unchanged: each batch resolves
   its IVF anchor through the ann tree's compaction manifest, so a
   centroid refresh published between batches is picked up and new
   deltas assign against the CURRENT sidecar.

Exactly-once: every per-batch artifact (state, flagged, clean, stale,
revive, index delta, ann delta) is a ``batch_id=N`` overwrite — crash
replays rewrite byte-identically, the same discipline as both wings.

Dedup is INTRA-STREAM as well as cross-corpus (VERDICT r10 #1): with
``update_index=True`` (the default) each batch's surviving docs write
an LSH index DELTA and later batches probe corpus ∪ committed stream
deltas — the reference's ``run_etl`` is ONE lifecycle over one
manifest (:617-778), so a near-dup pair split across two stream
batches must flag, not sail through. The delta/compaction machinery is
``streaming_dedup_ingest``'s, reused verbatim (``compact_stream_state``
on this pipeline's own ``index_delta``/``clean`` trees behind the same
atomic manifest). ``update_index=False`` restores the cross-corpus-only
scope. The batch twin :func:`batch_ingest_etl` composes the same
semantics one-pass via ``intra_batch=True``. Multi-doc chains resolve
per the shared ``chain_policy`` knob (VERDICT r11 #2,
:data:`operators.dedup.CHAIN_POLICIES`): the default "sequential"
makes the stream and the one-pass twin agree EXACTLY — a chain a~b~c
flags b (against a) and keeps c whether the chain lands in one
micro-batch, splits across batches, or runs through the twin —
pinned in tests/test_chain_policy.py.

Document lifecycle (ADVICE r10 + VERDICT r10 #2): the skip stage
compares each doc against its LATEST state row (not the additive
ever-seen set), so a doc whose content reverts A->B->A is REPROCESSED
— its version-A vectors were marked stale when B superseded them, and
skipping would serve the doc with B's embeddings forever. Stale and
revive are ordered EVENTS keyed by batch: re-processing writes the
superseded versions' vec_ids to ``stale/batch_id=N`` and the re-added
previously-known vec_ids to ``revive/batch_id=N``; a vec_id is dead
iff its newest stale event outranks its newest revive event.
:func:`compact_pipeline_ann_state` then physically RECLAIMS dead
vectors at fold time (the folded version contains zero dead vec_ids —
the reference deletes stale vector files outright, ``:609-614``) and
retires the consumed events behind the manifest's ``stale_through``
watermark, so the serve-time subtraction list is bounded by the fold
cadence, not the corpus's lifetime update count.

State IO routes through :mod:`operators.statefs` (object-store-safe).
Stream == batch-twin parity is pinned in tests/test_ingest_pipeline.py;
the revert/reclaim lifecycle in tests/test_ingest_pipeline_r11.py.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from notion_vector_store_etl_pipeline_spark.functions import vectors as V
from notion_vector_store_etl_pipeline_spark.operators.dedup import (
    load_lsh_index,
    load_lsh_index_bucketed,
)
from notion_vector_store_etl_pipeline_spark.operators.similarity import (
    compact_ivf_index,
    load_ivf_index,
    load_ivf_sidecar,
    quantize_and_assign,
    rebuild_ivf_index,
)
from notion_vector_store_etl_pipeline_spark.operators.cache import memo_df
from notion_vector_store_etl_pipeline_spark.operators.statefs import (
    read_json,
    state_fs,
    write_json_atomic,
)
from notion_vector_store_etl_pipeline_spark.sources.paginated import (
    register_paginated_source,
)
from notion_vector_store_etl_pipeline_spark.streaming.dedup_stream import (
    _load_anchor_corpus,
    _load_anchor_index,
    _merge_latest_tail,
    _read_prior_batches,
    _write_manifest,
    compact_stream_state,
    probe_batch,
    read_compaction_manifest,
)
from notion_vector_store_etl_pipeline_spark.streaming.pipeline import chunk_stage

EMBED_DIM = 8

# ---------------------------------------------------------------------------
# Opt-in per-stage profiler for the composed stream's foreachBatch body
# (VERDICT r13 #1: attribute the per-batch FIXED overhead to manifest /
# state re-reads vs kernel floor vs scheduling before optimizing it).
# When enabled, _process appends (batch_id, stage, seconds) rows; the
# hook costs two perf_counter() calls per stage when off.
_PROFILE: list | None = None


def enable_stage_profile() -> list:
    """Turn on stage timing; returns the live list the stream appends
    (batch_id, stage, seconds) tuples to."""
    global _PROFILE
    _PROFILE = []
    return _PROFILE


def disable_stage_profile() -> None:
    global _PROFILE
    _PROFILE = None


_PROFILE_BID = -1  # batch currently inside _process, for nested marks


def _mark(batch_id: int, name: str, t0: float) -> float:
    """Record the stage ``name`` as having run from ``t0`` to now;
    returns now (the next stage's t0). No-op-cheap when profiling is
    off."""
    now = time.perf_counter()
    if _PROFILE is not None:
        _PROFILE.append((batch_id, name, now - t0))
    return now


def embedded_chunks(clean_docs: DataFrame, max_len: int = 400) -> DataFrame:
    """chunk -> embed: survivor docs to (vec_id, chunk id, doc_id,
    chunk_index, emb) rows. ``vec_id`` is the 64-bit hash of the
    deterministic chunk id (the reference's sha-derived per-chunk id,
    ``:310-326``) SALTED WITH doc_id, the long key the IVF machinery
    indexes on. The doc_id salt keeps vector liveness per-document:
    chunk ids are (source, content_hash, chunk_index) — two live docs
    with identical source+text would otherwise share every vec_id, and
    updating ONE of them would stale (and, at the next ann fold,
    physically reclaim) the other's still-live vectors (r11 review).
    Within one doc the id stays a pure content function, which is what
    the revert/revive ordering relies on."""
    records = chunk_stage(clean_docs, max_len)
    return records.select(
        F.xxhash64("id", "doc_id").alias("vec_id"),
        F.col("id").alias("chunk_id"),
        "doc_id",
        "chunk_index",
        V.hash_embedding(F.col("text"), EMBED_DIM).alias("emb"),
    )


def ingest_stage(
    spark: SparkSession,
    todo: DataFrame,
    corpus_docs: DataFrame,
    lsh_index: DataFrame,
    ivf_index_path: str,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    max_len: int = 400,
    intra_batch: bool = False,
    return_clean_buckets: bool = False,
    chain_policy: str = "sequential",
) -> tuple[DataFrame, ...]:
    """The shared probe -> chunk -> embed -> assign composition (after
    the skip stage, which differs between batch and stream only in
    where prior state comes from). Returns (flagged, clean, chunks,
    assigned_chunk_vectors) — ``chunks`` is the (vec_id, chunk_id,
    doc_id, chunk_index) linkage table: an ANN hit on a stored vector
    traces back to its source document/chunk through it (the
    reference's index keeps chunk->doc linkage explicitly,
    ``Notion_openai_vector_etl.py:310-326``; without this frame the
    mapping would need a chunk-stage re-run to reconstruct).
    ``intra_batch`` also dedups within the incoming set (the batch
    twin's stand-in for the stream's cross-batch index growth);
    ``return_clean_buckets`` appends the clean docs' melted LSH
    buckets as a fifth element — the stream's index-delta rows,
    reusing the probe's own signature pass (probe_batch docstring)."""
    _t = time.perf_counter()
    probed = probe_batch(
        todo.select("doc_id", "text"),
        corpus_docs,
        lsh_index,
        threshold,
        num_hashes,
        bands,
        intra_batch=intra_batch,
        return_clean_buckets=return_clean_buckets,
        chain_policy=chain_policy,
    )
    flagged, clean = probed[0], probed[1]
    _t = _mark(_PROFILE_BID, "kernel:probe", _t)
    # probe_batch consumes only (doc_id, text); rejoin for the chunk
    # stage's source column. localCheckpoint (ingest-batch-sized, the
    # same contract probe_batch itself uses): clean_full feeds the
    # clean sink and the chunk stage, and chunks feeds BOTH the
    # linkage sink and the assignment — unpinned, the chunk+embed
    # pipeline would run once per consuming action.
    clean_full = (
        todo.join(clean.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "text", "source")
        .localCheckpoint(eager=True)
    )
    _t = _mark(_PROFILE_BID, "kernel:clean_pin", _t)
    # sidecar only — the vectors scan would be discarded, and its
    # eager listing cost ~1 s/batch (VERDICT r13 #1); the memo behind
    # load_ivf_sidecar makes repeat anchors free
    c_ids, c_mat = load_ivf_sidecar(spark, ivf_index_path)
    _t = _mark(_PROFILE_BID, "kernel:ivf_load", _t)
    chunks = embedded_chunks(clean_full, max_len).localCheckpoint(eager=True)
    _t = _mark(_PROFILE_BID, "kernel:chunk_embed", _t)
    assigned = quantize_and_assign(
        chunks.select("vec_id", "emb"), c_ids, c_mat, topn=1, id_col="vec_id", emb_col="emb"
    )
    out = (
        flagged,
        clean_full,
        chunks.select("vec_id", "chunk_id", "doc_id", "chunk_index"),
        assigned,
    )
    if return_clean_buckets:
        return out + (probed[2],)
    return out


def _state_manifest_path(out_dir: str) -> str:
    return f"{out_dir}/state/_compaction/manifest.json"


def vacuum_consumed_events(spark: SparkSession, out_dir: str) -> dict:
    """Physically delete stale/revive event VERSIONS whose every row is
    at or below the ann manifest's ``stale_through`` watermark — those
    events were CONSUMED by :func:`compact_pipeline_ann_state` (their
    effect is physical in the folded index), so the rows are pure
    history that would otherwise accumulate for the life of the corpus
    (the r11 "watermark-retired but not physically vacuumed" residual).

    Version windows are batch-ordered and monotone in ``v``, so the
    scan walks contiguously from a per-tree vacuum watermark
    (``state/_compaction/events_vacuum.json``) and stops at the first
    version holding any unconsumed row — each call probes only
    versions added since the last vacuum, never O(stream age). A
    version dir missing (a prior crashed vacuum's completed delete, or
    a window in which the tree had no events) just advances the
    watermark. When a tree's versions root is left empty it is removed
    so readers keep their fast is_dir miss. Crash-safe: the watermark
    is written AFTER the deletes; a replay re-issues idempotent
    deletes, never skips one. Returns the watermark dict.

    Tail dirs below the STATE fold watermark are reclaimed by
    ``compact_ingest_state(prune_state=True)`` as before; with
    ``vacuum_events=True`` that fold also excludes already-consumed
    rows from the versions it writes, so fold + prune + this vacuum
    together leave no physical copy of a consumed event."""
    fs = state_fs(spark, out_dir)
    man = read_json(fs, _state_manifest_path(out_dir))
    if not man:
        return {}
    ann_man = read_compaction_manifest(f"{out_dir}/ann", spark)
    consumed = (ann_man or {}).get("stale_through", -1)
    wm_path = f"{out_dir}/state/_compaction/events_vacuum.json"
    wm = read_json(fs, wm_path) or {}
    if consumed < 0:
        # no ann fold has ever consumed anything — nothing can be
        # vacuumable, so don't pay a per-call parquet scan (r11b
        # review #5: without this, every state-fold boundary of a
        # vacuum_events stream with no ann cadence launched two jobs
        # that could never delete)
        return wm
    changed = False
    for tree in ("stale", "revive"):
        root = f"{out_dir}/{tree}_versions"
        through = wm.get(tree, 0)
        head = wm.get(f"{tree}_head")  # [version, max_batch] cache
        for j in range(through + 1, man["version"] + 1):
            vdir = f"{root}/v={j}"
            if fs.is_dir(vdir):
                if head and head[0] == j and head[1] > consumed:
                    # the blocking version's max batch is cached from a
                    # prior walk and still unconsumed — skip the scan.
                    # A retried fold can only REWRITE v=j with fewer
                    # consumed rows (max never grows), so the cache is
                    # an upper bound: it may defer a delete one call,
                    # never delete early.
                    break
                mx = spark.read.parquet(vdir).agg(F.max("batch_id")).head()[0]
                if mx is not None and mx > consumed:
                    if head != [j, mx]:
                        wm[f"{tree}_head"] = [j, mx]
                        changed = True
                    break
                fs.delete_recursive(vdir)
            through = j
        if through != wm.get(tree, 0):
            wm[tree] = through
            changed = True
            if wm.get(f"{tree}_head") and wm[f"{tree}_head"][0] <= through:
                del wm[f"{tree}_head"]
        if fs.is_dir(root) and not any(
            n.startswith("v=") for n in fs.list_names(root)
        ):
            fs.delete_recursive(root)
    if changed:
        write_json_atomic(fs, wm_path, wm)
    return wm


def compact_ingest_state(
    spark: SparkSession,
    out_dir: str,
    through_batch: int,
    prune_state: bool = False,
    vacuum_events: bool = False,
) -> dict:
    """Fold the ``state``/``stale``/``revive`` batch tails (N <=
    ``through_batch``) into the next ``{tree}_versions/v=<k>``
    partitions and publish the watermark — the skip manifest's version
    of the compaction both wings already have. ``batch_id`` survives
    the fold as a data column (event ordering and latest-row skip
    both need it). Without it the skip stage re-reads EVERY state
    batch ever written per micro-batch: O(stream age) listing + read,
    the exact unbounded term `_read_prior_batches` was built to kill
    (a month of 1k batches/day = a 30k-dir enumeration per batch).

    The fold is ADDITIVE (each version holds only its window's rows,
    deduplicated within the window): the skip stage reduces the union
    to the LATEST row per doc by batch_id and the event readers reduce
    by max-batch rank, so duplicate rows across versions are harmless
    and no cross-version merge is needed — the same
    constant-scan-branch design as the dedup wing's
    ``corpus_versions``. Idempotent below the watermark; a crash
    between the version write and the publish leaves an orphan
    ``v=<k>`` dir the read path's ``v <= version`` filter hides and a
    retried compaction overwrites. ``prune_state=True`` deletes the
    folded batch dirs after the publish (their rows live in the
    version). ``vacuum_events=True`` additionally (a) excludes
    stale/revive rows already CONSUMED by the ann fold (at or below the
    ann manifest's ``stale_through`` — their effect is physical in the
    index version) from the event versions this fold writes, and (b)
    runs :func:`vacuum_consumed_events` after the publish — with
    ``prune_state`` too, no physical copy of a consumed event survives.
    A retried fold under an advanced ann watermark rewrites ``v=<k>``
    with fewer consumed rows, all of which every reader already
    filters below ``stale_through``."""
    from notion_vector_store_etl_pipeline_spark.operators.statefs import batch_dirs

    fs = state_fs(spark, out_dir)
    man = read_json(fs, _state_manifest_path(out_dir)) or {
        "version": 0,
        "through_batch": -1,
    }
    prev = man["through_batch"]
    if through_batch <= prev:
        if vacuum_events:
            # the ann watermark advances on its own cadence — consumed
            # versions stay vacuumable even when this fold is a no-op
            vacuum_consumed_events(spark, out_dir)
        return man
    consumed = -1
    if vacuum_events:
        ann_man = read_compaction_manifest(f"{out_dir}/ann", spark)
        consumed = (ann_man or {}).get("stale_through", -1)
    k = man["version"] + 1
    folded_dirs = []
    # batch_id (the partition column of the per-batch dirs) is KEPT as
    # a data column in every folded version: the skip stage needs it to
    # order state rows (latest-per-doc), and stale/revive are ordered
    # EVENTS whose batch rank decides liveness (module docstring)
    for tree, cols in (
        ("state", ["doc_id", "content_hash", "vec_ids", "batch_id"]),
        ("stale", ["vec_id", "batch_id"]),
        ("revive", ["vec_id", "batch_id"]),
    ):
        root = f"{out_dir}/{tree}"
        dirs = batch_dirs(fs, root, prev, through_batch + 1)
        if not dirs:
            continue
        window = (
            spark.read.option("basePath", root)
            .parquet(*dirs)
            .select(*cols)
            .dropDuplicates()
        )
        if tree != "state" and consumed >= 0:
            window = window.filter(F.col("batch_id") > consumed)
            if window.isEmpty():
                # every row in the window was already consumed by the
                # ann fold: writing an empty v=k dir would cost a write
                # job now and a parquet max-scan in every later
                # vacuum_consumed_events walk (ADVICE r11). The tail
                # dirs still fold away — their rows' effect is physical
                # in the ann index, and the readers' stale_through
                # filter hides them regardless.
                folded_dirs.extend(dirs)
                continue
        window.write.mode("overwrite").parquet(
            f"{out_dir}/{tree}_versions/v={k}"
        )
        folded_dirs.extend(dirs)
    if not folded_dirs:
        if vacuum_events:
            # an idle feed advances through_batch without folding
            # anything — consumed versions must still vacuum here, or
            # they linger exactly while nothing else is happening
            # (r11b review #1)
            vacuum_consumed_events(spark, out_dir)
        return man
    man = {"version": k, "through_batch": through_batch}
    write_json_atomic(fs, _state_manifest_path(out_dir), man)
    if prune_state:
        for d in folded_dirs:
            fs.delete_recursive(d)
    if vacuum_events:
        vacuum_consumed_events(spark, out_dir)
    return man


def _read_tree(
    spark: SparkSession,
    out_dir: str,
    tree: str,
    cols: list[str],
    before_batch: int,
) -> DataFrame | None:
    """Folded ``{tree}_versions`` (one root, ``v <= version`` partition
    filter — constant scan-branch count) ∪ the uncompacted
    ``{tree}/batch_id=N`` tail (constructed from the watermark, O(tail)
    point lookups).

    The manifest is re-read AFTER the tail enumeration (the ADVICE r9
    pattern from ``load_stream_ann_state``): a concurrent compaction
    with ``prune_state`` could fold-and-delete the enumerated tail
    between the two reads — anchoring on the stale watermark would
    silently LOSE those batches' rows. If the watermark advanced, the
    enumeration retries against the new anchor; the residual window
    (prune after return, during the caller's read) fails LOUDLY with
    missing files, never silently. In-process callers (the
    ``foreachBatch`` loop) are sequential and take one pass."""
    fs = state_fs(spark, out_dir)
    for _ in range(5):
        man = read_json(fs, _state_manifest_path(out_dir))
        after = man["through_batch"] if man else -1
        tail = _read_prior_batches(
            spark, f"{out_dir}/{tree}", cols, before_batch, after_batch=after
        )
        man2 = read_json(fs, _state_manifest_path(out_dir))
        if (man2["through_batch"] if man2 else -1) == after:
            break
        man = man2
    else:
        raise RuntimeError(
            f"{tree} watermark kept advancing across 5 enumeration "
            "attempts — a compaction loop is racing this reader"
        )
    parts = []
    if man and man["version"] > 0 and fs.is_dir(f"{out_dir}/{tree}_versions"):
        # memoized per manifest version (operators.cache.memo_df): the
        # folded tree is write-once below the watermark, and the eager
        # listing + schema inference of spark.read.parquet would
        # otherwise re-run every micro-batch (VERDICT r13 #1)
        ver = memo_df(
            spark,
            ("tree_versions", out_dir, tree, man["version"]),
            lambda: spark.read.parquet(f"{out_dir}/{tree}_versions"),
        )
        missing = [c for c in cols if c not in ver.columns]
        if missing:
            # fail with the actual story, not UNRESOLVED_COLUMN: a
            # pre-r11 fold dropped batch_id from the versions (the
            # event ordering and latest-row skip now require it) — the
            # folded rows carry no usable batch rank, so resuming on
            # them silently cannot be correct (r11 review)
            raise RuntimeError(
                f"{out_dir}/{tree}_versions lacks column(s) {missing}: "
                "folded by a pre-r11 compact_ingest_state, which did "
                "not retain batch_id. Re-ingest into a fresh out_dir "
                "(or migrate the folded versions) before resuming."
            )
        parts.append(ver.filter(F.col("v") <= man["version"]).select(*cols))
    if tail is not None:
        parts.append(tail)
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_ingest_state(
    spark: SparkSession, out_dir: str, before_batch: int
) -> DataFrame | None:
    """The skip stage's view of processed docs: (doc_id, content_hash,
    vec_ids, batch_id) — the hash of the doc's LATEST row (by
    batch_id) drives the skip anti-join; ``vec_ids`` across ALL rows
    is the doc's chunk-vector history, consumed by the stale/revive
    computation when the doc is re-processed (the reference's page ->
    vector-ids manifest, ``Notion_openai_vector_etl.py``
    `save_manifest`, SURVEY §2.2 K4)."""
    return _read_tree(
        spark,
        out_dir,
        "state",
        ["doc_id", "content_hash", "vec_ids", "batch_id"],
        before_batch,
    )


def _read_events(
    spark: SparkSession,
    out_dir: str,
    tree: str,
    before_batch: int,
    after_batch: int,
) -> DataFrame | None:
    """(vec_id, batch_id) event rows of ``tree`` with ``after_batch <
    batch_id < before_batch``. The filter is applied to the UNION, not
    just the tail enumeration: the skip-state fold
    (:func:`compact_ingest_state`) and the ann fold
    (:func:`compact_pipeline_ann_state`) run on independent cadences,
    so a folded ``{tree}_versions`` row can carry a batch_id on either
    side of the ann watermark."""
    ev = _read_tree(spark, out_dir, tree, ["vec_id", "batch_id"], before_batch)
    if ev is None:
        return None
    return ev.filter(
        (F.col("batch_id") > after_batch) & (F.col("batch_id") < before_batch)
    )


def read_stale_vectors(
    spark: SparkSession, out_dir: str, before_batch: int, after_batch: int = -1
) -> DataFrame | None:
    """``(vec_id, batch_id)`` stale EVENTS in ``(after_batch,
    before_batch)`` — a document (re)process at batch N marks its prior
    versions' vec_ids stale at N. Liveness is decided against the
    newest revive event (:func:`read_revived_vectors`); pass
    ``after_batch`` = the ann manifest's ``stale_through`` to see only
    events not yet consumed by physical reclamation. History below the
    watermark may be physically absent once
    :func:`vacuum_consumed_events` has run — a default ``after_batch``
    read is a view of the SURVIVING events, not an audit log."""
    return _read_events(spark, out_dir, "stale", before_batch, after_batch)


def read_revived_vectors(
    spark: SparkSession, out_dir: str, before_batch: int, after_batch: int = -1
) -> DataFrame | None:
    """``(vec_id, batch_id)`` revive EVENTS: vec_ids physically
    re-added at batch N that already appeared in the doc's prior state
    rows — a content REVERT regenerates the identical deterministic
    chunk ids, and the revive outranks the stale event their earlier
    supersession wrote (ADVICE r10: without this, an A->B->A doc is
    permanently served with version-B embeddings)."""
    return _read_events(spark, out_dir, "revive", before_batch, after_batch)


def load_pipeline_ann_state(
    spark: SparkSession,
    out_dir: str,
    ivf_index_path: str,
    before_batch: int,
):
    """The composed pipeline's probe-ready ANN view: the ann_stream
    state (stored base ∪ committed deltas) MINUS the dead set — a
    vec_id is dead iff its newest unconsumed stale event outranks its
    newest revive event (module docstring: the event ordering is what
    makes an A->B->A revert serve version A again). Events at or below
    the ann manifest's ``stale_through`` watermark were CONSUMED by
    :func:`compact_pipeline_ann_state` — their effect is already
    physical in the folded version (dead vectors reclaimed, duplicate
    revived copies collapsed), so the serve-time subtraction is
    bounded by the fold cadence, not the corpus's lifetime update
    count (VERDICT r10 #2; the reference deletes stale vector files
    outright, ``Notion_openai_vector_etl.py:609-614`` — engine batch
    twin of the delete-set computation:
    plans/incremental_queries.stale_detect).

    Unconsumed revive events also mark the one transient duplication
    window: a revert physically re-adds chunks whose earlier copy may
    still sit in the folded/base trees. Those vec_ids (a churn-sized
    set) get a scoped full-row dedup; every other row passes through
    untouched — no index-wide shuffle on the serve path."""
    from notion_vector_store_etl_pipeline_spark.streaming.ann_stream import (
        load_stream_ann_state,
    )

    index, c_ids, c_mat = load_stream_ann_state(
        spark, f"{out_dir}/ann", ivf_index_path, before_batch
    )
    ann_man = read_compaction_manifest(f"{out_dir}/ann", spark)
    consumed = (ann_man or {}).get("stale_through", -1)
    stale = read_stale_vectors(spark, out_dir, before_batch, after_batch=consumed)
    revive = read_revived_vectors(
        spark, out_dir, before_batch, after_batch=consumed
    )
    rb = (
        revive.groupBy("vec_id").agg(F.max("batch_id").alias("rb"))
        if revive is not None
        else None
    )
    if stale is not None:
        sb = stale.groupBy("vec_id").agg(F.max("batch_id").alias("sb"))
        if rb is not None:
            dead = (
                sb.join(rb, "vec_id", "left")
                .filter(F.col("sb") > F.coalesce(F.col("rb"), F.lit(-1)))
                .select("vec_id")
            )
        else:
            dead = sb.select("vec_id")
        index = index.join(dead, "vec_id", "left_anti")
    if rb is not None:
        dup_ids = rb.select("vec_id")
        index = index.join(dup_ids, "vec_id", "left_anti").unionByName(
            index.join(dup_ids, "vec_id", "left_semi").dropDuplicates(["vec_id"])
        )
    return index, c_ids, c_mat


def compact_pipeline_ann_state(
    spark: SparkSession,
    out_dir: str,
    through_batch: int,
    base_index_path: str,
    prune_deltas: bool = False,
    retain_versions: int | None = None,
    rebuild_centroids: bool = False,
    rebuild_sample_mod: int | None = None,
    vacuum_consumed: bool = True,
) -> dict | None:
    """The composed pipeline's ann compaction: fold the ``{out}/ann``
    delta tail through ``through_batch`` into the next index version
    like :func:`streaming.ann_stream.compact_ann_stream_state` — but
    CONSUME the stale/revive event window on the way (VERDICT r10 #2):

    - the window's dead vec_ids (newest stale outranks newest revive,
      both <= ``through_batch``) are physically EXCLUDED from the
      folded version — superseded document versions stop costing
      storage and probe rows, matching the reference's outright
      stale-file deletion (``Notion_openai_vector_etl.py:609-614``);
    - duplicate physical copies from reverts collapse
      (``dedup_rows`` — byte-identical by the pipeline's invariant,
      operators/similarity._drop_and_dedup);
    - the manifest's ``stale_through`` watermark advances to
      ``through_batch``: :func:`load_pipeline_ann_state` subtracts
      only events ABOVE it, so the served view is byte-identical
      before and after the fold while its subtraction list stays
      O(fold window).

    Idempotent below the watermark like both wings' compactions; a
    crash between the version write and the publish leaves an orphan
    version dir the retried fold overwrites. The generic
    ``compact_ann_stream_state`` must NOT be pointed at a pipeline
    tree for reclamation (it folds verbatim and advances only
    ``through_batch``) — doing so is still CORRECT (events stay
    unconsumed and the serve path keeps subtracting them), just
    unreclaimed. With ``vacuum_consumed=True`` (default) the fold runs
    :func:`vacuum_consumed_events` itself after advancing
    ``stale_through`` (VERDICT r11 #6): event VERSIONS fully below the
    new watermark delete here, at the moment they become history,
    instead of lingering until the next state fold's ``vacuum_events``
    pass (consumed rows in the un-folded batch TAIL still wait for the
    state fold+prune, as before). The streaming wrapper wires this to
    its ``vacuum_events`` knob so a stream configured to KEEP event
    history keeps it everywhere."""
    from notion_vector_store_etl_pipeline_spark.operators.statefs import (
        batch_dirs as _batch_dirs,
    )

    ann_dir = f"{out_dir}/ann"
    fs = state_fs(spark, ann_dir)
    man = read_compaction_manifest(ann_dir, spark)
    prev = man["through_batch"] if man else -1
    if through_batch <= prev:
        return man
    deltas = _batch_dirs(fs, f"{ann_dir}/delta", prev, through_batch + 1)
    stale_prev = (man or {}).get("stale_through", -1)
    stale_ev = read_stale_vectors(
        spark, out_dir, through_batch + 1, after_batch=stale_prev
    )
    revive_ev = read_revived_vectors(
        spark, out_dir, through_batch + 1, after_batch=stale_prev
    )
    has_events = stale_ev is not None and not stale_ev.isEmpty()
    if not deltas and not rebuild_centroids and not has_events:
        return man
    dead = None
    dedup_rows = False
    if has_events:
        sb = stale_ev.groupBy("vec_id").agg(F.max("batch_id").alias("sb"))
        if revive_ev is not None:
            rb = revive_ev.groupBy("vec_id").agg(F.max("batch_id").alias("rb"))
            dead = (
                sb.join(rb, "vec_id", "left")
                .filter(F.col("sb") > F.coalesce(F.col("rb"), F.lit(-1)))
                .select("vec_id")
            )
        else:
            dead = sb.select("vec_id")
    if revive_ev is not None and not revive_ev.isEmpty():
        dedup_rows = True
    k = (man["version"] + 1) if man else 1
    base = man["index_path"] if man else base_index_path
    out_path = f"{ann_dir}/index_versions/v{k}"
    if rebuild_centroids:
        rebuild_ivf_index(
            spark,
            base,
            deltas,
            out_path,
            sample_mod=rebuild_sample_mod,
            drop_vec_ids=dead,
            dedup_rows=dedup_rows,
        )
    else:
        compact_ivf_index(
            spark, base, deltas, out_path, drop_vec_ids=dead, dedup_rows=dedup_rows
        )
    manifest = {
        "version": k,
        "index_path": out_path,
        "through_batch": through_batch,
        "centroids": "refreshed" if rebuild_centroids else "carried",
        "stale_through": through_batch,
    }
    _write_manifest(ann_dir, manifest, spark)
    if vacuum_consumed:
        # consumed event versions become pure history at THIS publish —
        # reclaim them now (idempotent, watermark-walk cheap) rather
        # than waiting for the next state fold's vacuum_events pass
        vacuum_consumed_events(spark, out_dir)
    if prune_deltas:
        for d in deltas:
            fs.delete_recursive(d)
    if retain_versions is not None:
        from notion_vector_store_etl_pipeline_spark.streaming.dedup_stream import (
            vacuum_index_versions,
        )

        vacuum_index_versions(spark, ann_dir, k, retain_versions)
    return manifest


def streaming_ingest_etl(
    spark: SparkSession,
    source_path: str,
    corpus_path: str,
    lsh_index_path: str | None,
    ivf_index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    lsh_index_table: str | None = None,
    page_size: int = 100,
    pages_per_batch: int = 1,
    max_len: int = 400,
    compact_state_every: int | None = None,
    prune_state: bool = False,
    vacuum_events: bool = False,
    update_index: bool = True,
    compact_dedup_every: int | None = None,
    compact_dedup_prune: bool = False,
    compact_dedup_retain: int | None = None,
    compact_dedup_major_every: int | None = None,
    compact_dedup_major_rows: int | None = None,
    compact_ann_every: int | None = None,
    compact_ann_prune: bool = False,
    compact_ann_retain: int | None = None,
    rebuild_ann_every: int | None = None,
    rebuild_sample_mod: int | None = None,
    chain_policy: str = "sequential",
) -> StreamingQuery:
    """Start the composed crawl->skip->dedup->chunk->embed->index
    stream. Outputs under ``out_dir``: ``state/batch_id=N`` (processed
    (doc_id, content_hash, vec_ids) — the skip manifest, each row
    carrying the doc's chunk-vector list like the reference's
    page -> vector-ids manifest), ``flagged/ingest_batch=N``,
    ``clean/batch_id=N``, ``chunks/batch_id=N`` (the vec_id ->
    (chunk_id, doc_id, chunk_index) linkage), ``stale/batch_id=N`` and
    ``revive/batch_id=N`` (the ordered supersede/re-add events —
    module docstring), ``index_delta/batch_id=N`` (the clean docs'
    LSH buckets when ``update_index`` — intra-stream dedup), and
    ``ann/delta/batch_id=N/vectors`` (plain list_id-sorted files).

    Compaction knobs, each an independent cadence over its own
    manifest: ``compact_state_every=K`` folds the skip-state and
    stale/revive tails (:func:`compact_ingest_state`; ``prune_state``
    deletes folded batch dirs; ``vacuum_events`` physically deletes
    event rows/versions the ann fold already consumed —
    :func:`vacuum_consumed_events`); ``compact_dedup_every=K`` folds the
    LSH deltas + clean docs through the dedup wing's
    :func:`~streaming.dedup_stream.compact_stream_state` (prune/retain
    via ``compact_dedup_prune``/``compact_dedup_retain``;
    ``compact_dedup_major_every=M`` upgrades every M-th dedup fold to
    the MAJOR corpus-rewrite + index-rebuild fold;
    ``compact_dedup_major_rows=N`` also upgrades a fold once the
    cumulative superseded sidecar passes N rows — the size trigger a
    hot-update workload needs, VERDICT r11 #5);
    ``compact_ann_every=K`` folds the ann deltas AND physically
    reclaims dead vectors (:func:`compact_pipeline_ann_state`;
    ``rebuild_ann_every=R`` upgrades every R-th ann fold to a centroid
    refresh). Each keeps its per-batch read O(K + versions) instead of
    O(stream age)."""
    register_paginated_source(spark)

    base_dedup_manifest = {
        "version": 0,
        "index_path": None if lsh_index_table else lsh_index_path,
        "index_table": lsh_index_table,
        "corpus_base": corpus_path,
        "through_batch": -1,
    }

    def _process(batch: DataFrame, batch_id: int) -> None:
        # compaction boundaries BEFORE the empty-batch return: an empty
        # K-th batch must still fold its tail (each fold is idempotent;
        # deferring it to 2K lets the tail grow unbounded on an unlucky
        # cadence of idle pages). Folds cover COMMITTED batches only
        # (everything before this one); replays hit the watermark and
        # no-op.
        global _PROFILE_BID
        _PROFILE_BID = batch_id
        _t = time.perf_counter()
        at_boundary = lambda every: every and batch_id > 0 and batch_id % every == 0  # noqa: E731
        if at_boundary(compact_state_every):
            compact_ingest_state(
                spark,
                out_dir,
                through_batch=batch_id - 1,
                prune_state=prune_state,
                vacuum_events=vacuum_events,
            )
        dedup_man = None
        if update_index:
            if at_boundary(compact_dedup_every):
                dedup_man = compact_stream_state(
                    spark,
                    out_dir,
                    through_batch=batch_id - 1,
                    base_index_path=lsh_index_path,
                    base_index_table=lsh_index_table,
                    base_corpus_path=corpus_path,
                    prune_deltas=compact_dedup_prune,
                    retain_versions=compact_dedup_retain,
                    major=bool(
                        compact_dedup_major_every
                        and (batch_id // compact_dedup_every)
                        % compact_dedup_major_every
                        == 0
                    ),
                    auto_major_rows=compact_dedup_major_rows,
                    num_hashes=num_hashes,
                    bands=bands,
                )
            else:
                dedup_man = read_compaction_manifest(out_dir, spark)
        if at_boundary(compact_ann_every):
            compact_pipeline_ann_state(
                spark,
                out_dir,
                through_batch=batch_id - 1,
                base_index_path=ivf_index_path,
                prune_deltas=compact_ann_prune,
                retain_versions=compact_ann_retain,
                vacuum_consumed=vacuum_events,
                rebuild_centroids=bool(
                    rebuild_ann_every
                    and (batch_id // compact_ann_every) % rebuild_ann_every == 0
                ),
                rebuild_sample_mod=rebuild_sample_mod,
            )
        _t = _mark(batch_id, "folds", _t)
        if batch.isEmpty():
            return
        # pin the micro-batch once: it feeds the skip join AND the
        # final state write — two independent sink actions that would
        # otherwise re-pull the source frame
        batch = batch.withColumn(
            "content_hash", F.sha2(F.col("text"), 256)
        ).localCheckpoint(eager=True)
        _t = _mark(batch_id, "pin_batch", _t)
        prior = read_ingest_state(spark, out_dir, batch_id)
        todo = batch
        if prior is not None:
            # scope the state view to THIS batch's doc ids first — a
            # broadcast semi-join (the micro-batch is small by
            # construction), so neither the latest-row group below nor
            # the stale/revive explode ever shuffles the full state
            # tree; the per-batch state cost is one filtered scan, not
            # one state-wide exchange (at 100 TB the difference)
            prior = prior.join(
                F.broadcast(batch.select("doc_id").dropDuplicates()),
                "doc_id",
                "left_semi",
            )
            # skip a doc only when its hash matches the doc's LATEST
            # state row (max batch_id; hash tie-breaks deterministically
            # — a doc_id appears at most once per batch) — the
            # reference compares the doc's CURRENT manifest entry
            # (:664/:704). Matching ANY prior row (the additive
            # ever-seen set) mis-skips an A->B->A revert: its
            # version-A vec_ids were staled when B superseded them,
            # so the doc would be served with B's embeddings forever
            # (ADVICE r10). localCheckpoint: todo feeds the probe AND
            # the clean rejoin; unpinned, the state scan and anti-join
            # would re-execute once per downstream action.
            latest = prior.groupBy("doc_id").agg(
                F.max(F.struct("batch_id", "content_hash"))["content_hash"].alias(
                    "content_hash"
                )
            )
            todo = batch.join(
                latest, ["doc_id", "content_hash"], "left_anti"
            ).localCheckpoint(eager=True)
            if todo.isEmpty():
                # every doc in this batch was skipped (a verbatim
                # re-feed): nothing to probe, chunk, or record. Writing
                # the empty artifacts anyway is not just waste — the
                # ann delta is a partitionBy write, and an empty
                # partitionBy dir has NO part files, so a later read of
                # the delta tree dies with UNABLE_TO_INFER_SCHEMA (r12
                # review lifecycle pin). Replay-safe: the skip decision
                # is a pure function of state below this batch, so a
                # crash-replay skips identically.
                return
        _t = _mark(batch_id, "skip", _t)
        if update_index:
            # probe corpus ∪ committed stream state: anchor on the
            # dedup compaction manifest (folded index version + folded
            # clean corpus) and union only the uncompacted tail — the
            # dedup wing's exact read shape (streaming/dedup_stream.py)
            anchor = dedup_man or base_dedup_manifest
            lsh_index = _load_anchor_index(spark, anchor)
            corpus_docs = _load_anchor_corpus(spark, anchor, out_dir)
            after = anchor["through_batch"]
            deltas = _read_prior_batches(
                spark,
                f"{out_dir}/index_delta",
                ["sid", "band", "bucket"],
                batch_id,
                after,
            )
            if deltas is not None:
                lsh_index = lsh_index.unionByName(deltas)
            prior_clean = _read_prior_batches(
                spark,
                f"{out_dir}/clean",
                ["doc_id", "text", "batch_id"],
                batch_id,
                after,
            )
            if prior_clean is not None:
                # per-doc LATEST text in the tail: an updated doc has
                # clean rows in several batches, and the verify
                # universe wants one (current) text per sid. The
                # anti-join is a broadcast filter on the big side — no
                # corpus shuffle. A doc edited across FOLD windows is
                # handled one level down: compact_stream_state records
                # its id in the superseded sidecar and
                # _load_anchor_corpus resolves latest-wins, so the
                # verify universe carries exactly one (current) text
                # per sid (r11b — closed the flag-against-retired-text
                # residual).
                corpus_docs = _merge_latest_tail(corpus_docs, prior_clean)
        else:
            if lsh_index_table:
                lsh_index = load_lsh_index_bucketed(spark, lsh_index_table)
            else:
                lsh_index = load_lsh_index(spark, lsh_index_path)
            corpus_docs = spark.read.parquet(corpus_path).select("doc_id", "text")
        # resolve the IVF anchor through the ann tree's compaction
        # manifest: after a rebuild_centroids fold on {out}/ann, the
        # published version carries a REFRESHED sidecar — assigning new
        # deltas against the stale base centroids would put list_ids on
        # them that the refreshed sidecar's probes never select (silent
        # recall collapse; the same rule ann_stream re-reads its anchor
        # per batch for)
        ann_man = read_compaction_manifest(f"{out_dir}/ann", spark)
        ivf_anchor = ann_man["index_path"] if ann_man else ivf_index_path
        _t = _mark(batch_id, "anchor_load", _t)
        # intra_batch rides update_index: intra-stream dedup that
        # caught a pair split ACROSS batches but let the same pair
        # through when a page boundary happened to put both docs in
        # ONE micro-batch would make coverage depend on pagination
        # (r11 review) — the wing's intra stage closes exactly that
        staged = ingest_stage(
            spark,
            todo,
            corpus_docs,
            lsh_index,
            ivf_anchor,
            threshold,
            num_hashes,
            bands,
            max_len,
            intra_batch=update_index,
            return_clean_buckets=update_index,
            chain_policy=chain_policy,
        )
        flagged, clean, chunks, assigned = staged[:4]
        _t = _mark(batch_id, "kernel", _t)
        # batch_id-keyed overwrites => replay-idempotent, same
        # discipline as both wings
        flagged.write.mode("overwrite").parquet(
            f"{out_dir}/flagged/ingest_batch={batch_id}"
        )
        clean.write.mode("overwrite").parquet(f"{out_dir}/clean/batch_id={batch_id}")
        chunks.write.mode("overwrite").parquet(
            f"{out_dir}/chunks/batch_id={batch_id}"
        )
        if update_index:
            # the clean docs' buckets come straight from the probe's
            # signature pass (checkpoint-backed, byte-identical to a
            # recompute) — later batches dedup against THIS batch
            staged[4].write.mode("overwrite").parquet(
                f"{out_dir}/index_delta/batch_id={batch_id}"
            )
        _t = _mark(batch_id, "write_outputs", _t)
        # plain sorted files, not partitionBy(list_id) — the micro-batch
        # delta small-files fix; see ann_stream's delta write for the
        # full rationale (row-group stats replace partition pruning on
        # the tail; the fold restores the partitioned layout)
        assigned.repartition("list_id").sortWithinPartitions("list_id").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/ann/delta/batch_id={batch_id}/vectors")
        # writer-side anchor re-validation (ADVICE r10, mirroring
        # ann_stream): an OUT-OF-BAND rebuild publishing between the
        # anchor read above and the delta landing leaves old-centroid
        # list_ids above the new watermark — permanent once folded.
        # Fail LOUDLY before the state write: the stream restart
        # replays this batch against the current sidecar (every write
        # so far is a batch_id-keyed overwrite). In-process folds
        # (compact_ann_every) are sequential and never race.
        ann_man2 = read_compaction_manifest(f"{out_dir}/ann", spark)
        anchor2 = ann_man2["index_path"] if ann_man2 else ivf_index_path
        if anchor2 != ivf_anchor:
            raise RuntimeError(
                f"composed ingest batch {batch_id}: IVF anchor changed "
                f"{ivf_anchor!r} -> {anchor2!r} during the batch (concurrent "
                "external rebuild) — restart the stream to replay this "
                "batch against the current sidecar"
            )
        _t = _mark(batch_id, "write_ann", _t)
        # stale/revive events: every doc (re)processed this batch
        # supersedes its LATEST prior version's vectors. Latest-version
        # vec_ids the new content does NOT regenerate -> stale (the
        # reference's stale-vector deletion, SURVEY §2.2 K4); prior
        # vec_ids from ANY version the new content DOES regenerate (a
        # content revert — deterministic chunk ids) -> revive,
        # outranking their earlier stale event so the re-added physical
        # copy is served (module docstring).
        #
        # The stale diff is against the LATEST version only (r12, the
        # hot-update endurance variant caught this): older versions'
        # vecs already carry a stale event from the update that retired
        # them, and their newest event stays stale unless THIS batch
        # revives them — so re-staling the whole history each reprocess
        # added nothing to liveness while growing per-update event
        # volume linearly with the doc's update depth (80-update-share
        # batches emitted ~4x the events the fold-cadence bound
        # models). Revive detection still scans ALL versions: an
        # A->B->A->B oscillation must revive B's vecs from two versions
        # back.
        if prior is not None:
            prior_scoped = prior.join(todo.select("doc_id"), "doc_id", "left_semi")
            latest_exp = (
                prior_scoped.groupBy("doc_id")
                .agg(F.max(F.struct("batch_id", "vec_ids"))["vec_ids"].alias("vec_ids"))
                .select("doc_id", F.explode("vec_ids").alias("vec_id"))
                .dropDuplicates()
            )
            all_exp = prior_scoped.select(
                "doc_id", F.explode("vec_ids").alias("vec_id")
            ).dropDuplicates()
            link = chunks.select("doc_id", "vec_id")
            stale = (
                latest_exp.join(link, ["doc_id", "vec_id"], "left_anti")
                .select("vec_id")
                .dropDuplicates()
            )
            revive = (
                all_exp.join(link, ["doc_id", "vec_id"], "left_semi")
                .select("vec_id")
                .dropDuplicates()
            )
        else:
            stale = spark.createDataFrame([], "vec_id long")
            revive = spark.createDataFrame([], "vec_id long")
        stale.write.mode("overwrite").parquet(
            f"{out_dir}/stale/batch_id={batch_id}"
        )
        revive.write.mode("overwrite").parquet(
            f"{out_dir}/revive/batch_id={batch_id}"
        )
        _t = _mark(batch_id, "events", _t)
        # state LAST: a crash before this point replays the batch with
        # the doc not yet marked processed (rewrite, idempotent); after
        # it, the epoch commit is the only step left. Each row carries
        # the doc's chunk-vector manifest — the stale computation's
        # source on the NEXT update. Rows are written for TODO docs
        # only (processed or flagged — for those, an empty manifest
        # means "nothing serving", which is true): a SKIPPED re-feed
        # must NOT write a row, because its empty vec_ids would become
        # the doc's latest state row and the next real update's
        # latest-version stale diff would find nothing to stale —
        # version-A vectors would be served beside version B forever
        # (r12 review; the skip decision itself only needs the hash of
        # the latest EXISTING row, which the prior processed/flagged
        # row already carries).
        (
            todo.select("doc_id", "content_hash")
            .join(
                chunks.groupBy("doc_id").agg(
                    F.collect_list("vec_id").alias("vec_ids")
                ),
                "doc_id",
                "left",
            )
            .withColumn(
                "vec_ids",
                F.coalesce(F.col("vec_ids"), F.array().cast("array<long>")),
            )
            .write.mode("overwrite")
            .parquet(f"{out_dir}/state/batch_id={batch_id}")
        )
        _mark(batch_id, "write_state", _t)

    docs = (
        spark.readStream.format("paginated")
        .option("path", source_path)
        .option("page_size", str(page_size))
        .option("pages_per_batch", str(pages_per_batch))
        .load()
    )
    return (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def batch_ingest_etl(
    spark: SparkSession,
    docs: DataFrame,
    corpus_path: str,
    lsh_index_path: str,
    ivf_index_path: str,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    max_len: int = 400,
    intra_batch: bool = False,
    chain_policy: str = "sequential",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The one-pass twin: the SAME stage composition over the whole
    input — the parity target the streaming run must equal batch-union
    for (no prior state; distinct incoming docs). Returns (flagged,
    clean, chunks, assigned) like :func:`ingest_stage`.
    ``intra_batch=True`` composes the stream's intra-stream dedup
    (``update_index``) semantics one-pass: the incoming set is also
    self-deduped, first-wins by id. ``chain_policy`` (shared with the
    stream, probe_batch docstring) governs chains; under the default
    "sequential" the twin's flagged/clean sets equal the stream's
    exactly, chains included."""
    lsh_index = load_lsh_index(spark, lsh_index_path)
    corpus_docs = spark.read.parquet(corpus_path).select("doc_id", "text")
    return ingest_stage(
        spark,
        docs,
        corpus_docs,
        lsh_index,
        ivf_index_path,
        threshold,
        num_hashes,
        bands,
        max_len,
        intra_batch=intra_batch,
        chain_policy=chain_policy,
    )
