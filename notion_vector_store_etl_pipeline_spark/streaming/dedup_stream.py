"""Streaming ingest-dedup: the incremental LSH probe composed into the
streaming wing — the 100 TB daily-ingest loop the two pieces were built
for (VERDICT r7 "what's missing" #2).

Shape: a micro-batched stream of incoming documents (the paginated
source — pages of today's crawl) is probed, per batch inside
``foreachBatch``, against the STORED LSH corpus index
(:func:`operators.dedup.build_lsh_index` written once per corpus
version by :func:`write_lsh_index`). Flagged near-dups are diverted to
``<out>/flagged``; surviving docs land in ``<out>/clean``; and (when
``update_index=True``) each batch's surviving docs contribute an index
DELTA so later batches also dedup against earlier stream batches —
the corpus index grows incrementally, it is never recomputed.

Exactly-once: every per-batch artifact (flagged pairs, clean docs,
index delta) is written to a ``batch_id=N`` directory with overwrite —
a crash between the sink write and the streaming epoch commit replays
the batch and the rewrite is byte-idempotent, the same discipline as
the vectorstore sink's txn manifest (streaming/pipeline.py) and the
reference's per-file manifest checkpoint
(Notion_openai_vector_etl.py:678-739 incremental loop, :731 commit).

Bounded growth via in-stream COMPACTION (VERDICT r8 missing #1): the
naive loop's per-batch work grows linearly with stream age — every
batch re-reads the ENTIRE clean/ and index_delta/ trees. With
``compact_every=K``, every K-th batch first folds all committed
deltas into the next index version (:func:`operators.dedup
.compact_lsh_index`) and the committed clean docs into an ADDITIVE
corpus version dir (each doc is rewritten at most once, into exactly
one version; the base corpus is never rewritten), then publishes an
atomic manifest. Later batches anchor on the manifest and read only
the ``(through_batch, current)`` tail of the delta/clean trees, so
steady-state per-batch cost is O(batch + K) regardless of stream age
— the reference reads its manifest once per RUN, not once per file
(Notion_openai_vector_etl.py:625 vs the per-file loop :678-739); this
is the same discipline with versioned, compacted state. Compaction at
batch N folds through N-1 only: batches < N are committed (the stream
is processing N), so a crash-replay of N can never find its own
artifacts below the manifest watermark, preserving the replay
soundness of the strict ``batch_id < N`` bound.

Intra-batch near-dups (ADVICE r8): by default two near-dup docs that
arrive in the SAME micro-batch are both clean — cross-batch dedup only,
so coverage at the margin depends on page/batch boundaries.
``intra_batch=True`` closes the gap: after the corpus probe, the batch
survivors are self-joined (:func:`operators.dedup.minhash_neardup`)
and verified pairs flag the higher id against the lower (first-wins by
id, matching the batch engine's ``dedup_first_wins`` convention).
Multi-doc CHAINS a~b~c resolve per ``chain_policy``
(:data:`operators.dedup.CHAIN_POLICIES`, VERDICT r11 #2): the default
"sequential" keeps c (b's flagging un-flags its partners — exactly
what a one-doc-per-batch stream computes, so the flagged set no longer
depends on where pagination splits a chain); "conservative" flags both
b and c (every verified pair flags — stricter removal, historic r11
behavior).

Per-ingest cost: batch-side signatures + a bipartite bucket join +
candidate-local exact verify. The corpus is touched only by (a) the
stored-index scan and (b) the verify's candidate semi-join — no
corpus-side signature work, which at 100 TB is the whole point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from notion_vector_store_etl_pipeline_spark.operators.cache import (
    memo_df,
    release_cache,
    release_tracked_except,
    tracked_snapshot,
)
from notion_vector_store_etl_pipeline_spark.operators.statefs import (
    batch_dirs,
    read_json,
    state_fs,
    write_json_atomic,
)
from notion_vector_store_etl_pipeline_spark.operators.dedup import (
    CHAIN_POLICIES,
    DENSE_BUCKET_CAP,
    PROBE_DENSE_KEEP,
    sequential_firstwins_pairs,
    build_lsh_index,
    compact_lsh_index,
    jaccard_verify_pairs,
    load_lsh_index,
    load_lsh_index_bucketed,
    melted_signature_buckets,
    minhash_neardup,
    minhash_probe_candidates,
    minhash_signatures,
    write_lsh_index,
    write_lsh_index_bucketed,
)
from notion_vector_store_etl_pipeline_spark.sources.paginated import (
    register_paginated_source,
)


def _read_prior_batches(
    spark: SparkSession,
    path: str,
    columns: list[str],
    before_batch: int,
    after_batch: int = -1,
) -> DataFrame | None:
    """Read a ``batch_id=N``-partitioned output dir, keeping only rows
    from batches in ``(after_batch, before_batch)``. The strict upper
    bound is what makes replays idempotent: a crash after this batch's
    own artifacts were written but before the epoch commit replays the
    batch, and without the bound the replay would find the crashed
    attempt's own index delta / clean docs and probe the batch against
    itself, flagging every doc as its own duplicate. The lower bound
    excludes batches already folded into a compacted version (the
    manifest's ``through_batch``) so the tail read stays O(batches
    since last compaction), not O(stream age).

    The matching dirs are enumerated HERE and passed to the reader
    explicitly (with ``basePath`` so ``batch_id`` stays a column):
    ``spark.read.parquet(root)`` would bound the data via partition
    pruning but still FILE-LIST every ``batch_id=`` leaf ever written
    — a per-batch cost that grows with stream age (measured: the
    compacted 80-batch sf1 series drifted 3.2 -> 4.5 s/batch from
    listing alone, after compaction had already bounded the data
    read). Enumeration goes through :mod:`operators.statefs`: with a
    compaction watermark the tail dirs are CONSTRUCTED from the
    contiguous epoch range and existence-checked (O(tail) point
    lookups — no listing at all, and correct on object-store roots
    where ``os.listdir`` would silently see nothing, VERDICT r9 #1);
    before any compaction, one root listing."""
    dirs = batch_dirs(
        state_fs(spark, path), path, after_batch, before_batch
    )
    if not dirs:
        return None
    return spark.read.option("basePath", path).parquet(*dirs).select(*columns)


def _latest_per_doc(tail: DataFrame) -> DataFrame:
    """Collapse (doc_id, text, batch_id) rows to the newest text per
    doc — batch-ordered; a doc appears at most once per batch, so the
    struct max is deterministic. The one latest-wins collapse every
    fold and tail union shares (r11b review #4: five hand-copied
    variants would let a future tie-break change diverge them)."""
    return tail.groupBy("doc_id").agg(
        F.max(F.struct("batch_id", "text"))["text"].alias("text")
    )


def _merge_latest_tail(docs: DataFrame, tail: DataFrame) -> DataFrame:
    """``docs`` with every doc present in ``tail`` replaced by its
    newest tail text: collapse the tail per doc, anti-join the big side
    on the tail's churn-sized id set (a broadcast filter — no corpus
    shuffle), union the collapsed tail back."""
    latest = _latest_per_doc(tail)
    return docs.join(
        latest.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(latest)


def probe_batch(
    batch: DataFrame,
    corpus_docs: DataFrame,
    corpus_index: DataFrame,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    checkable: bool = False,
    intra_batch: bool = False,
    return_clean_buckets: bool = False,
    chain_policy: str = "sequential",
) -> tuple[DataFrame, ...]:
    """One ingest step, batch-API shaped so the streaming wrapper and
    tests share it: probe ``batch`` (doc_id, text) against a prebuilt
    ``corpus_index``, verifying candidates exactly against
    ``corpus_docs`` (which must carry text for every sid the index can
    emit). Returns ``(flagged_pairs, clean_docs)`` — flagged is
    (batch_id, corpus_id, jaccard); clean is the batch rows with no
    flagged pair. ``intra_batch=True`` additionally self-joins the
    corpus survivors; how multi-doc CHAINS among them resolve is
    ``chain_policy`` (``operators.dedup.CHAIN_POLICIES``):
    "sequential" (default) keeps the greedy first-wins survivors —
    the same disposition the stream computes when the chain is split
    across batches, so output is pagination-invariant; "conservative"
    flags the higher id of EVERY verified pair (module docstring).
    ``return_clean_buckets=True`` appends a third element: the melted
    (sid, band, bucket) rows of the CLEAN docs, checkpoint-backed —
    the signature pass already ran for the probe, so the index-delta
    writer reuses it instead of re-running shingle+minhash over the
    clean docs read back from disk (r10 review; byte-identical rows,
    the computation is per-row deterministic).

    Cache lifecycle is fully internal (ADVICE r9): the candidate set
    feeds two verify-side joins and ``flagged`` two consumers, so both
    are persisted DURING the call — but the final ``flagged`` is then
    materialized with an eager ``localCheckpoint`` (micro-batch-sized
    by construction) and every intermediate persist is released before
    returning. Callers get a checkpoint-backed ``flagged`` and a
    ``clean`` that is one cheap anti-join over it; no
    ``release_cache()`` contract to forget, no cache accumulation in
    long direct-caller sessions.

    The trade, stated: ``localCheckpoint`` blocks are executor-local
    and NON-RECOMPUTABLE — losing an executor between this return and
    the caller's sink write fails the micro-batch (Structured
    Streaming then recovers by replaying the batch from the
    checkpointed source offsets, so the stream self-heals; a direct
    batch caller must simply re-run the call). A lineage-preserving
    ``persist()`` would recompute instead of fail, but reintroduces
    the multiplicative plan growth and the cache-lifetime contract
    this design removed. On clusters with aggressive spot/deallocation
    churn, a reliable ``checkpoint()`` into the state root is the
    alternative; per-micro-batch replay-from-source is the cheaper
    default here (batches are small by construction)."""
    if chain_policy not in CHAIN_POLICIES:
        raise ValueError(f"chain_policy must be one of {CHAIN_POLICIES}, got {chain_policy!r}")
    local_persists: list[DataFrame] = []
    tracked_before = tracked_snapshot()

    def _persist(df: DataFrame) -> DataFrame:
        df = df.persist()
        local_persists.append(df)
        return df

    mb = melted_signature_buckets(
        minhash_signatures(batch, "text", "doc_id", num_hashes, checkable=checkable),
        bands,
        num_hashes // bands,
        checkable,
    )
    if return_clean_buckets:
        # the candidate join below populates the cache; the clean_mb
        # checkpoint then reads it instead of re-running the (Python
        # shingle UDF) signature pass a second time
        mb = _persist(mb)
    # Same-id exclusion (r10 review): an UPDATED document — same
    # doc_id as its corpus entry, changed text — collides with its own
    # buckets and would be flagged as a near-dup of itself, silently
    # discarding every edit. A (batch X, corpus X) pair is an update,
    # not a duplicate; the skip stage upstream already passed it
    # through deliberately.
    cand = _persist(
        minhash_probe_candidates(mb, corpus_index).filter(
            F.col("a_id") != F.col("b_id")
        )
    )
    # Verification needs text on both sides, and the shingle table is
    # keyed by id — one text per id. BATCH WINS for ids present on
    # both sides ("the corpus as it will be after this ingest"): an
    # updated doc's pairs verify against its NEW text on either end;
    # without the anti-join the duplicated id would fan the verify
    # joins out across old/new text combinations.
    universe = batch.select("doc_id", "text").unionByName(
        corpus_docs.select("doc_id", "text").join(
            batch.select("doc_id"), "doc_id", "left_anti"
        )
    )
    # eager_persists=False: per-batch frames are tiny, so the extra
    # eager count jobs cost more than the cache race they prevent
    # (r14 profiler A/B: +~1.2 s/batch steady p50 with eager; see
    # operators.dedup.jaccard_verify_pairs)
    flagged = jaccard_verify_pairs(
        universe, cand, threshold=threshold, eager_persists=False
    ).select(
        F.col("a_id").alias("batch_id"), F.col("b_id").alias("corpus_id"), "jaccard"
    )
    if intra_batch:
        # truncate lineage before nesting: the intra stage embeds the
        # corpus-verify plan inside the self-join's plan on BOTH union
        # branches, and Spark expands the shared sub-DAG to a tree —
        # without the checkpoint the logical plan grows multiplicatively
        # and planning itself OOMs the driver (measured: a 3-doc batch).
        # flagged is micro-batch-sized; an eager localCheckpoint is cheap.
        flagged = flagged.localCheckpoint(eager=True)
        survivors = _persist(
            batch.join(
                flagged.select(F.col("batch_id").alias("doc_id")),
                "doc_id",
                "left_anti",
            )
        )
        # self-join the corpus survivors; verified pairs emit a_id <
        # b_id, so flagging b_id keeps the lowest id (first-wins)
        intra_pairs = minhash_neardup(
            survivors,
            "text",
            "doc_id",
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            checkable=checkable,
            eager_persists=False,  # micro-batch frames: see above
        )
        if chain_policy == "sequential":
            # resolve chains to the stream-equivalent greedy disposition
            # (CHAIN_POLICIES in operators.dedup): a~b~c keeps c, making
            # the flagged set invariant to where batch boundaries fall
            intra_pairs = sequential_firstwins_pairs(intra_pairs)
        intra = intra_pairs.select(
            F.col("b_id").alias("batch_id"), F.col("a_id").alias("corpus_id"), "jaccard"
        )
        flagged = flagged.unionByName(intra)
    # materialize once (micro-batch-sized), then drop every
    # intermediate persist — the returned plans depend only on the
    # checkpointed blocks, so releasing here is safe and the caller
    # owns nothing
    flagged = flagged.localCheckpoint(eager=True)
    for df in local_persists:
        try:
            df.unpersist()
        except Exception:
            pass
    # nested operators (jaccard_verify_pairs' shingle table,
    # minhash_neardup on the intra path) register their persists in the
    # GLOBAL tracker; the checkpoint above consumed them all, so scope
    # them to this call too instead of leaving them for a caller-side
    # release_cache() nobody may run
    clean_mb = None
    if return_clean_buckets:
        # filter the already-computed buckets to clean survivors and
        # pin them BEFORE the persists are released (mb's lineage dies
        # with them); checkpoint is batch-sized like flagged
        clean_mb = mb.join(
            flagged.select(F.col("batch_id").alias("sid")).dropDuplicates(),
            "sid",
            "left_anti",
        ).localCheckpoint(eager=True)
    release_tracked_except(tracked_before)
    clean = batch.join(
        flagged.select(F.col("batch_id").alias("doc_id")).dropDuplicates(),
        "doc_id",
        "left_anti",
    )
    if return_clean_buckets:
        return flagged, clean, clean_mb
    return flagged, clean


def _manifest_path(out_dir: str) -> str:
    return f"{out_dir}/_compaction/manifest.json"


def read_compaction_manifest(out_dir: str, spark: SparkSession | None = None) -> dict | None:
    """The stream's compaction watermark: ``{"version": k, "index_path"
    or "index_table": ..., "corpus_base": ..., "through_batch": N}``
    meaning deltas/clean with ``batch_id <= N`` are folded into
    compacted version k and must not be re-read from the per-batch
    trees. Folded clean docs live under ``corpus_versions/v=<j>``
    partition dirs; readers filter ``v <= k``, so an orphan version
    from a crashed compaction is invisible until its manifest
    publishes. IO routes through :mod:`operators.statefs` — a scheme'd
    ``out_dir`` (``s3a://…``) needs ``spark`` and fails loudly without
    it; plain local paths work as before."""
    return read_json(state_fs(spark, out_dir), _manifest_path(out_dir))


def _write_manifest(
    out_dir: str, manifest: dict, spark: SparkSession | None = None
) -> None:
    write_json_atomic(state_fs(spark, out_dir), _manifest_path(out_dir), manifest)


def latest_committed_batch(
    checkpoint_dir: str, spark: SparkSession | None = None
) -> int:
    """Highest epoch the streaming checkpoint has COMMITTED (the
    ``commits/`` sequence), or -1. Compaction must fold committed
    batches only: an uncommitted batch's on-disk artifacts may belong
    to a crashed attempt that will be replayed."""
    fs = state_fs(spark, checkpoint_dir)
    commits = f"{checkpoint_dir}/commits"
    if not fs.is_dir(commits):
        return -1
    ids = [int(n) for n in fs.list_names(commits) if n.isdigit()]
    return max(ids, default=-1)


def _check_signature_by_probe(
    spark: SparkSession,
    man: dict,
    out_dir: str,
    num_hashes: int,
    bands: int,
    checkable: bool,
    sample: int = 5,
) -> None:
    """Guard a MAJOR rebuild on a pre-``signature`` manifest (ADVICE
    r11): recompute the melted buckets of up to ``sample`` anchored
    corpus docs under the CALLER's params and require at least one
    recomputed (sid, band, bucket) row to exist in the current index.
    Right params -> nearly every sampled doc reproduces all its
    buckets; wrong params (different num_hashes/bands, or the checkable
    hash swap) -> zero matches with overwhelming probability. A doc
    updated since its index version was built can individually miss, so
    several docs are sampled and ONE hit suffices. Raises with an
    explicit opt-out (``assume_signature=True``) on mismatch or when
    the probe cannot run (no common docs)."""
    index = _load_anchor_index(spark, man)
    docs = (
        _load_anchor_corpus(spark, man, out_dir)
        .join(index.select(F.col("sid").alias("doc_id")).dropDuplicates(), "doc_id", "left_semi")
        .limit(sample)
    )
    probe = melted_signature_buckets(
        minhash_signatures(docs, "text", "doc_id", num_hashes, checkable=checkable),
        bands,
        num_hashes // bands,
        checkable,
    )
    hits = probe.join(
        index,
        (probe["sid"] == index["sid"])
        & (probe["band"] == index["band"])
        & (probe["bucket"] == index["bucket"]),
        "left_semi",
    ).count()
    if hits == 0:
        raise ValueError(
            "this stream's manifest predates the 'signature' record and the "
            f"caller's params (num_hashes={num_hashes}, bands={bands}, "
            f"checkable={checkable}) reproduce NONE of the sampled docs' "
            "index buckets — a major rebuild under mismatched params yields "
            "an index no probe signature can hit (silent dedup loss). Pass "
            "the stream's original params, or assume_signature=True to "
            "override after verifying them out of band."
        )


def compact_stream_state(
    spark: SparkSession,
    out_dir: str,
    through_batch: int,
    base_index_path: str | None = None,
    base_index_table: str | None = None,
    base_corpus_path: str | None = None,
    dense_bucket_cap: int | None = DENSE_BUCKET_CAP,
    keep: int = PROBE_DENSE_KEEP,
    bucketed_table: str | None = None,
    n_buckets: int = 32,
    prune_deltas: bool = False,
    retain_versions: int | None = None,
    major: bool = False,
    num_hashes: int = 32,
    bands: int = 8,
    checkable: bool = False,
    assume_signature: bool = False,
    auto_major_rows: int | None = None,
) -> dict | None:
    """Fold the stream's committed per-batch state through
    ``through_batch`` into the next compacted version and publish the
    manifest. Idempotent: if the manifest already covers
    ``through_batch`` it is returned unchanged (so a crash-replay that
    re-triggers compaction is a no-op), and a crash between the version
    writes and the manifest publish leaves only an orphan version dir
    that the retried compaction overwrites.

    - index: ``compact_lsh_index`` over the current anchor (manifest
      version if any, else the base index) + the delta tail
      ``(prev_through, through_batch]`` -> ``index_versions/v{k}``.
      With ``bucketed_table`` set, each version is also registered as
      a bucketed TABLE ``{bucketed_table}_v{k}`` so the probe join
      stays exchange-free on the index side across compactions.
    - corpus: the clean tail is rewritten ONCE into the
      ``corpus_versions/v=<k>`` PARTITION of a single versions root —
      additive (the base corpus and prior versions are never
      rewritten), and because every version is a partition of ONE
      datasource, the per-batch corpus read stays a constant THREE
      scan branches (base ∪ versions-root ∪ tail) no matter how many
      compactions have run. The first cut of this kept a
      list-of-paths manifest and unioned one scan per version; an
      80-batch smoke showed per-batch latency CLIMBING with each
      compaction (~+0.5 s per extra scan branch: fixed per-stage
      overhead, not data volume) while the uncompacted run stayed
      flat — the partition layout is what makes compaction actually
      pay (SCALE_SMOKE_R9.md §2).
    - ``prune_deltas=True`` additionally DELETES the folded
      ``index_delta/batch_id<=through`` dirs: their content lives in
      the compacted index version, replays can only touch batches
      above the watermark, and removing them keeps the delta tree's
      directory listing bounded by compact_every instead of stream
      age. (``clean/`` is never pruned — it is the stream's OUTPUT,
      owned by downstream consumers.)
    - ``retain_versions=N`` (N >= 1) vacuums superseded INDEX versions
      after the publish: versions ``<= k - N`` — their dirs and, when
      bucketed, their ``{bucketed_table}_v{j}`` catalog entries — are
      deleted. Only versions strictly below the just-published
      manifest are ever touched, so a crash mid-vacuum loses nothing a
      reader can reach. Corpus versions are never vacuumed by MINOR
      folds: each ``corpus_versions/v=<j>`` partition holds DISTINCT
      folded docs (additive state, live except superseded rows), unlike
      index versions where each supersedes all before it — only a
      MAJOR fold's floor retires them (``major`` above,
      :func:`vacuum_retired_corpus`) (VERDICT r9 missing #3 /
      ADVICE r9 #5 — without this, a month of ``compact_every=10`` at
      1k batches/day leaves ~3k obsolete index copies on the 100 TB
      storage bill).

    - ``auto_major_rows=N`` upgrades a MINOR call to MAJOR when the
      manifest's cumulative ``superseded_rows`` (reset by each major)
      has reached N — the SIZE trigger beside the caller's batch-count
      cadence: the sidecar (and the broadcast set every corpus read
      ships) stays bounded by N under hot-update churn that a cadence
      alone cannot see (VERDICT r11 #5).

    - ``major=True`` is the LSM-style MAJOR compaction (r11b): instead
      of folding the window additively, it rewrites the reader's
      CURRENT corpus view — latest text per doc over base ∪ folded
      versions ∪ the window tail, superseded copies resolved away —
      into a single ``corpus_versions/v=<k>`` partition, REBUILDS the
      LSH index from exactly that corpus (``num_hashes``/``bands``/
      ``checkable`` must match the stream's — retired texts' buckets
      are dropped, the candidate waste minor folds accumulate), and
      publishes ``corpus_floor = k``: readers skip the base and every
      version below the floor, and the superseded sidecar resets (its
      pre-floor entries are dead). :func:`vacuum_retired_corpus` then
      physically deletes the below-floor versions and sidecar dirs
      (the base corpus is caller-owned and never touched). Cost is one
      full corpus rewrite + signature pass — O(corpus), amortized over
      the major cadence; minor folds stay O(window). This bounds BOTH
      the superseded-set growth (reset at every major fold) and the
      retired-text storage that additive versions can never reclaim.

    ``through_batch`` must only cover committed batches — pass
    :func:`latest_committed_batch` (or ``current_batch - 1`` from
    inside ``foreachBatch``, where every earlier batch is committed).

    All small-state IO (manifest, dir enumeration, prune, vacuum)
    routes through :mod:`operators.statefs`, so a scheme'd ``out_dir``
    works — or fails loudly — instead of silently seeing no state.
    """
    fs = state_fs(spark, out_dir)
    man = read_compaction_manifest(out_dir, spark)
    prev_through = man["through_batch"] if man else -1
    if through_batch <= prev_through:
        return man
    delta_dirs = batch_dirs(
        fs, f"{out_dir}/index_delta", prev_through, through_batch + 1
    )
    if not delta_dirs and not major:
        # nothing committed in the window (empty batches write no
        # artifacts) — folding would be a no-op and the delta read
        # would have no schema to infer (ADVICE r9 #2). A MAJOR fold
        # proceeds regardless: its job is the rewrite, not the window.
        return man
    pending = (man or {}).get("pending_vacuum_floor")
    if pending:
        # the previous MAJOR fold published its floor but deferred the
        # physical below-floor deletes one fold cycle (ADVICE r11): an
        # out-of-process reader mid-query on the prior anchor kept a
        # read margin until now — this call IS the next fold. Index
        # versions first: a crash between the two deletes leaves
        # corpus-without-index (harmless), never an index whose sids
        # have no verify text. The flag clears with this fold's own
        # manifest publish; a crash before that replays idempotent
        # deletes, never skips one.
        vacuum_index_versions(
            spark,
            out_dir,
            man["version"],
            man["version"] - pending + 1,
            bucketed_table=bucketed_table,
        )
        vacuum_retired_corpus(spark, out_dir, pending)
    if (
        not major
        and auto_major_rows is not None
        and (man or {}).get("superseded_rows", 0) >= auto_major_rows
    ):
        # size-triggered MAJOR upgrade (VERDICT r11 #5): the superseded
        # sidecar grows with distinct UPDATED docs between majors, and a
        # batch-count cadence (compact_major_every) cannot see a
        # hot-update workload outgrowing it. The manifest's cumulative
        # superseded-row count is the trigger: past the threshold this
        # fold rewrites and resets it, bounding the sidecar (and the
        # broadcast set every corpus read ships) by the threshold, not
        # by luck of the cadence.
        major = True
    # the manifest records the stream's signature params (whoever folds
    # first is authoritative — the wing passes its own); a MAJOR fold
    # validates against them before rebuilding, because a mismatched
    # rebuild (checkable swaps the bucket hash; num_hashes/bands change
    # every bucket value) would produce an index whose buckets match NO
    # probe signature — every near-dup of a folded doc silently sails
    # through (r11b review #2)
    signature = (man or {}).get("signature") or [num_hashes, bands, checkable]
    if major and man and "signature" not in man and not assume_signature:
        # pre-signature manifest (ADVICE r11): the fallback above adopts
        # the CALLER's params, so a mismatched rebuild on an upgraded
        # stream would not be caught — and a rebuild under wrong params
        # yields an index no probe signature can hit (silent dedup
        # loss). Sanity-probe before trusting them: sampled folded docs
        # must reproduce at least one of their recorded index buckets
        # under the caller's params.
        _check_signature_by_probe(
            spark, man, out_dir, num_hashes, bands, checkable
        )
    if major and signature != [num_hashes, bands, checkable]:
        raise ValueError(
            f"major fold called with signature params (num_hashes, bands, "
            f"checkable) = {[num_hashes, bands, checkable]} but the "
            f"manifest records {signature} — a rebuild under different "
            "params yields an index no probe signature can hit; pass the "
            "stream's own params"
        )
    k = (man["version"] + 1) if man else 1
    idx_out = f"{out_dir}/index_versions/v{k}"
    tbl = f"{bucketed_table}_v{k}" if bucketed_table else None
    cur_table = man.get("index_table") if man else base_index_table
    cur_path = man.get("index_path") if man else base_index_path
    if major:
        prev_man = man or {"version": 0, "corpus_base": base_corpus_path}
        # self-healing resolve (ADVICE r11): corpus versions written
        # before the superseded sidecar existed can hold cross-version
        # duplicate texts with NO sidecar entry — the anchor read alone
        # would pass both texts through, and this rewrite would bake
        # both (plus the retired text's LSH buckets) into the floor
        # version permanently. Resolve per doc by highest precedence
        # rank (base = 0, version = its v) directly; for post-sidecar
        # state this is a no-op on top of the sidecar filter.
        cur = (
            _load_anchor_corpus(spark, prev_man, out_dir, with_rank=True)
            .groupBy("doc_id")
            .agg(F.max(F.struct(F.col("_rank"), F.col("text")))["text"].alias("text"))
        )
        window = _read_prior_batches(
            spark,
            f"{out_dir}/clean",
            ["doc_id", "text", "batch_id"],
            before_batch=through_batch + 1,
            after_batch=prev_through,
        )
        if window is not None:
            cur = _merge_latest_tail(cur, window)
        # one materialization feeds the corpus rewrite AND the index
        # rebuild (the signature pass would otherwise replay the whole
        # resolve-union per consumer)
        cur = cur.persist()
        try:
            cur.write.mode("overwrite").parquet(
                f"{out_dir}/corpus_versions/v={k}"
            )
            idx = build_lsh_index(
                cur,
                num_hashes=num_hashes,
                bands=bands,
                checkable=checkable,
                dense_bucket_cap=dense_bucket_cap,
                keep=keep,
            )
            if tbl:
                write_lsh_index_bucketed(idx, tbl, n_buckets, path=idx_out)
            else:
                write_lsh_index(idx, idx_out)
        finally:
            cur.unpersist()
        manifest = {
            "version": k,
            "index_path": None if tbl else idx_out,
            "index_table": tbl,
            "corpus_base": man["corpus_base"] if man else base_corpus_path,
            "through_batch": through_batch,
            "corpus_floor": k,
            "signature": signature,
            # physical below-floor deletes are DEFERRED one fold cycle
            # (ADVICE r11): the floor is published now — readers anchor
            # on v=k — but an out-of-process reader mid-query on the
            # previous anchor keeps a read margin until the next fold
            # call processes this flag (top of this function). Below-
            # floor index versions still vacuum unconditionally THEN
            # (epoch boundary, not a rollback-margin point — r11b
            # review #3); during the grace cycle their corpus is intact
            # so rolling back to them stays sound.
            "pending_vacuum_floor": k,
        }
        _write_manifest(out_dir, manifest, spark)
        if prune_deltas:
            for d in delta_dirs:
                fs.delete_recursive(d)
        return manifest
    compact_lsh_index(
        spark,
        base_path=None if cur_table else cur_path,
        delta_dir=f"{out_dir}/index_delta",
        out_path=idx_out,
        dense_bucket_cap=dense_bucket_cap,
        keep=keep,
        after_batch=prev_through,
        through_batch=through_batch,
        bucketed_table=tbl,
        n_buckets=n_buckets,
        base_table=cur_table,
        delta_dirs=delta_dirs,
    )
    n_sup = 0
    folded = _read_prior_batches(
        spark,
        f"{out_dir}/clean",
        ["doc_id", "text", "batch_id"],
        before_batch=through_batch + 1,
        after_batch=prev_through,
    )
    if folded is not None:
        # collapse to the LATEST text per doc within the window: the
        # composed pipeline's clean tree holds one row per (re)process,
        # so an updated doc would otherwise land in corpus_versions
        # with BOTH texts and every later probe's verify universe would
        # carry the sid twice — fanning candidate pairs across old/new
        # text and flagging new docs against RETIRED content (r11
        # review). For the wing's own feed (re-sends, same text) the
        # collapse is a plain dedup.
        _latest_per_doc(folded).write.mode("overwrite").parquet(
            f"{out_dir}/corpus_versions/v={k}"
        )
        # superseded sidecar (r11b — closes the cross-WINDOW residual):
        # a doc folded into v=k that already exists at a lower
        # precedence (the base corpus or an earlier version) keeps its
        # RETIRED text in that immutable earlier copy; record its id so
        # `_load_anchor_corpus` resolves latest-wins at read time and
        # the verify universe never carries two texts for one sid
        # (before this, a new doc near-dup of the retired text could be
        # flagged against content the corpus no longer serves). Cost:
        # one doc_id-pruned corpus scan per FOLD (broadcast semi
        # against the window's ids — window is K batches, bounded);
        # the read side broadcasts the cumulative superseded id set,
        # which grows with distinct UPDATED docs, not stream age — a
        # full rewrite fold collapsing all versions is the escape hatch
        # if churn ever makes it large, named future work. The retired
        # text's LSH buckets stay in the index versions: candidates
        # they generate now verify against the doc's CURRENT text only,
        # so they cost verify work, never a wrong flag.
        prev_man = man or {"version": 0, "corpus_base": base_corpus_path}
        window_ids = F.broadcast(
            spark.read.parquet(f"{out_dir}/corpus_versions/v={k}").select("doc_id")
        )
        sup = (
            _load_anchor_corpus(spark, prev_man, out_dir)
            .select("doc_id")
            .join(window_ids, "doc_id", "left_semi")
            .dropDuplicates()
            .persist()
        )
        try:
            n_sup = sup.count()
            if n_sup > 0:
                sup.write.mode("overwrite").parquet(
                    f"{out_dir}/superseded_versions/v={k}"
                )
        finally:
            sup.unpersist()
    manifest = {
        "version": k,
        "index_path": None if tbl else idx_out,
        "index_table": tbl,
        "corpus_base": man["corpus_base"] if man else base_corpus_path,
        "through_batch": through_batch,
        # a prior MAJOR fold's floor survives minor folds unchanged
        "corpus_floor": (man or {}).get("corpus_floor", 0),
        # recorded for major-fold validation; an existing record wins
        # (minor folds never recompute signatures, so their own args
        # must not overwrite the stream's)
        "signature": signature,
        # cumulative sidecar rows since the last MAJOR fold — the
        # size trigger auto_major_rows reads (majors reset it by
        # publishing a manifest without the key)
        "superseded_rows": (man or {}).get("superseded_rows", 0) + n_sup,
    }
    _write_manifest(out_dir, manifest, spark)
    if prune_deltas:
        for d in delta_dirs:
            fs.delete_recursive(d)
    if retain_versions is not None:
        vacuum_index_versions(
            spark, out_dir, k, retain_versions, bucketed_table=bucketed_table
        )
    return manifest


def vacuum_index_versions(
    spark: SparkSession,
    out_dir: str,
    current_version: int,
    retain_versions: int,
    bucketed_table: str | None = None,
) -> list[int]:
    """Delete superseded index versions ``j <= current_version -
    retain_versions`` under ``{out_dir}/index_versions`` (each index
    version contains everything its predecessors did — only the
    manifest-published latest is ever probed; retention > 1 keeps a
    rollback margin). For bucketed compactions the versioned catalog
    entry ``{bucketed_table}_v{j}`` is dropped too (its storage IS the
    version dir, written via ``path=``, so the dir delete reclaims
    it). Crash-safe by construction: only versions strictly below the
    already-published manifest are touched, and re-running is an
    idempotent no-op. Returns the vacuumed version numbers.

    A ``_compaction/vacuum.json`` watermark records the highest
    version already vacuumed, so each call probes only the versions
    ADDED since the last vacuum — without it every compaction would
    re-issue exists()/DROP TABLE for every version ever retired, an
    O(stream-age) per-compaction cost (~3k object-store probes a month
    into a compact_every=10, 1k-batches/day stream). The watermark is
    written AFTER the deletions: a crash between them replays a few
    idempotent deletes on the next call, never skips one."""
    if retain_versions < 1:
        raise ValueError("retain_versions must be >= 1 (the live version)")
    fs = state_fs(spark, out_dir)
    wm_path = f"{out_dir}/_compaction/vacuum.json"
    start = ((read_json(fs, wm_path) or {}).get("vacuumed_through", 0)) + 1
    cut = current_version - retain_versions
    gone = []
    for j in range(start, cut + 1):
        vdir = f"{out_dir}/index_versions/v{j}"
        found = fs.exists(vdir)
        if bucketed_table is not None:
            spark.sql(f"DROP TABLE IF EXISTS {bucketed_table}_v{j}")
        if found:
            fs.delete_recursive(vdir)
            gone.append(j)
    if cut >= start:
        write_json_atomic(fs, wm_path, {"vacuumed_through": cut})
    return gone


def vacuum_retired_corpus(
    spark: SparkSession, out_dir: str, floor: int
) -> list[str]:
    """Physically delete what a MAJOR fold's ``corpus_floor`` made
    unreachable: ``corpus_versions/v=<j>`` with ``j < floor`` (their
    live rows were rewritten into ``v=<floor>``; their superseded rows
    were dead already) and ``superseded_versions/v=<j>`` with ``j <=
    floor`` (the floor resets the sidecar — readers filter ``v >
    floor``). The caller-owned base corpus is never touched. Called by
    :func:`compact_stream_state` right after a major publish;
    idempotent (re-runs find nothing), crash-safe (only dirs already
    unreachable through the published manifest are deleted). The root
    listing is O(surviving versions) — bounded by the major cadence,
    not stream age. Returns the deleted dirs."""
    fs = state_fs(spark, out_dir)
    gone = []
    for root, cut in (
        (f"{out_dir}/corpus_versions", floor),
        (f"{out_dir}/superseded_versions", floor + 1),
    ):
        if not fs.is_dir(root):
            continue
        kept = 0
        for name in fs.list_names(root):
            if not name.startswith("v="):
                continue
            try:
                j = int(name[2:])
            except ValueError:
                continue
            if j < cut:
                fs.delete_recursive(f"{root}/{name}")
                gone.append(f"{root}/{name}")
            else:
                kept += 1
        if kept == 0 and root.endswith("superseded_versions"):
            # empty sidecar root removed so readers keep the fast
            # is_dir miss (the corpus root always keeps v=floor)
            fs.delete_recursive(root)
    return gone


def _load_anchor_index(spark: SparkSession, manifest: dict) -> DataFrame:
    # memoized per anchor identity (operators.cache.memo_df): index
    # versions are write-once dirs named by the manifest they publish
    # with, so the (path-or-table, version) key bumps on every fold and
    # the eager parquet listing stops re-running per micro-batch
    # (VERDICT r13 #1)
    key = (
        "anchor_index",
        manifest.get("index_table") or manifest["index_path"],
        manifest["version"],
    )
    if manifest.get("index_table"):
        return memo_df(
            spark, key, lambda: load_lsh_index_bucketed(spark, manifest["index_table"])
        )
    return memo_df(spark, key, lambda: load_lsh_index(spark, manifest["index_path"]))


def _load_anchor_corpus(
    spark: SparkSession, manifest: dict, out_dir: str, with_rank: bool = False
) -> DataFrame:
    """Base corpus ∪ the folded clean versions — TWO scan branches
    regardless of how many compactions have run: all versions are
    ``v=<j>`` partitions of one root, and the ``v <= version`` filter
    (a partition filter) both prunes nothing in the steady state and
    hides any orphan version a crashed compaction left behind.

    Latest-wins across windows (r11b): when a ``superseded_versions``
    sidecar exists (written by :func:`compact_stream_state` for docs
    re-folded over an earlier copy), rows whose precedence rank (base =
    0, version = its ``v``) is below the doc's newest superseding
    version are dropped — ONE text per doc, the current one, with a
    broadcast join on the churn-sized superseded set; unaffected rows
    never shuffle. A ``corpus_floor`` from a MAJOR fold supersedes the
    base and every version below it outright: the read becomes the
    floor-and-above versions only, and only post-floor sidecar entries
    apply.

    Memoized per (out_dir, manifest version) via
    :func:`operators.cache.memo_df` — every covered tree (base corpus,
    ``corpus_versions`` ≤ version, the superseded sidecar) is
    write-once below the watermark, so the key bumps exactly when the
    inputs can change, and the eager parquet listings stop re-running
    per micro-batch (VERDICT r13 #1)."""
    return memo_df(
        spark,
        (
            "anchor_corpus",
            out_dir,
            manifest["version"],
            int(manifest.get("corpus_floor") or 0),
            manifest.get("corpus_base"),
            with_rank,
        ),
        lambda: _load_anchor_corpus_uncached(spark, manifest, out_dir, with_rank),
    )


def _load_anchor_corpus_uncached(
    spark: SparkSession, manifest: dict, out_dir: str, with_rank: bool = False
) -> DataFrame:
    root = f"{out_dir}/corpus_versions"
    fs = state_fs(spark, out_dir)
    floor = int(manifest.get("corpus_floor") or 0)
    have_versions = manifest["version"] > 0 and fs.is_dir(root)
    if floor and not have_versions:
        raise RuntimeError(
            f"manifest has corpus_floor={floor} but {root} is missing — "
            "the major-fold rewrite this floor points at does not exist"
        )
    if not have_versions:
        base_only = spark.read.parquet(manifest["corpus_base"]).select(
            "doc_id", "text"
        )
        return base_only.withColumn("_rank", F.lit(0)) if with_rank else base_only
    folded = spark.read.parquet(root).filter(
        (F.col("v") <= manifest["version"]) & (F.col("v") >= floor)
    )
    if floor:
        ranked = folded.select(
            "doc_id", "text", F.col("v").cast("int").alias("_rank")
        )
    else:
        base = spark.read.parquet(manifest["corpus_base"]).select(
            "doc_id", "text"
        )
        ranked = base.withColumn("_rank", F.lit(0)).unionByName(
            folded.select(
                "doc_id", "text", F.col("v").cast("int").alias("_rank")
            )
        )
    out_cols = ["doc_id", "text", "_rank"] if with_rank else ["doc_id", "text"]
    sup_root = f"{out_dir}/superseded_versions"
    if not fs.is_dir(sup_root):
        return ranked.select(*out_cols)
    sup = (
        spark.read.parquet(sup_root)
        .filter((F.col("v") <= manifest["version"]) & (F.col("v") > floor))
        .groupBy("doc_id")
        .agg(F.max("v").alias("_since"))
    )
    return (
        ranked.join(F.broadcast(sup), "doc_id", "left")
        .filter(F.col("_since").isNull() | (F.col("_rank") >= F.col("_since")))
        .select(*out_cols)
    )


def streaming_dedup_ingest(
    spark: SparkSession,
    source_path: str,
    corpus_path: str,
    index_path: str | None,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    checkable: bool = False,
    page_size: int = 100,
    pages_per_batch: int = 2,
    update_index: bool = True,
    index_table: str | None = None,
    compact_every: int | None = None,
    compact_bucketed_table: str | None = None,
    compact_prune_deltas: bool = False,
    compact_retain_versions: int | None = None,
    compact_major_every: int | None = None,
    compact_major_rows: int | None = None,
    intra_batch: bool = False,
    chain_policy: str = "sequential",
) -> StreamingQuery:
    """Start the streaming ingest-dedup query.

    ``source_path``: parquet of incoming docs, streamed page-by-page
    through the paginated source (offsets = cursor, resume owned by the
    checkpoint). ``corpus_path``: the existing corpus docs (text needed
    for exact verification). ``index_path``: the stored LSH index built
    from exactly that corpus (``build_lsh_index`` -> ``write_lsh_index``
    — caller owns keeping the two in step, one "corpus version");
    ``index_table`` anchors on a BUCKETED index table instead
    (``write_lsh_index_bucketed``), the exchange-free probe layout.
    Outputs under ``out_dir``: ``flagged/ingest_batch=N`` (near-dup
    pairs), ``clean/batch_id=N`` (surviving docs), ``index_delta/
    batch_id=N`` (the melted buckets of surviving docs, read back by
    later batches when ``update_index`` — intra-stream dedup without
    ever touching the base index).

    ``compact_every=K``: every K-th batch folds committed state into
    the next compacted version (see :func:`compact_stream_state` and
    the module docstring) so per-batch cost stays O(batch + K) instead
    of O(stream age). ``compact_bucketed_table`` keeps each compacted
    index version bucketed. ``compact_retain_versions=N`` vacuums
    index versions superseded by more than N compactions (storage
    stays O(N x index), not O(stream age)).
    ``compact_major_every=M`` upgrades every M-th compaction to a
    MAJOR fold (corpus rewritten latest-per-doc, index rebuilt from
    it, below-floor versions + sidecar vacuumed — see
    :func:`compact_stream_state`); ``compact_major_rows=N`` ALSO
    upgrades any fold once the cumulative superseded sidecar passes N
    rows (the size trigger — a hot-update workload cannot outgrow a
    batch-count cadence, VERDICT r11 #5). ``intra_batch``: also dedup within
    each micro-batch; ``chain_policy`` picks the intra-batch chain
    disposition (module docstring — "sequential" keeps the stream's
    output invariant to pagination)."""
    register_paginated_source(spark)

    base_manifest = {
        "version": 0,
        "index_path": None if index_table else index_path,
        "index_table": index_table,
        "corpus_base": corpus_path,
        "through_batch": -1,
    }

    def _process(batch: DataFrame, batch_id: int) -> None:
        # compaction boundary BEFORE the empty-batch return: an empty
        # K-th batch must still fold the tail, or the cycle is deferred
        # to 2K (and can starve on an unlucky cadence of idle pages) —
        # compact_stream_state is idempotent, so replays are safe
        man = read_compaction_manifest(out_dir, spark) if update_index else None
        if (
            update_index
            and compact_every
            and batch_id > 0
            and batch_id % compact_every == 0
        ):
            # fold through batch_id - 1: every earlier batch is
            # committed (this stream is processing batch_id), so a
            # crash-replay of THIS batch can never meet its own
            # artifacts below the watermark. Idempotent on replay.
            man = compact_stream_state(
                spark,
                out_dir,
                through_batch=batch_id - 1,
                base_index_path=index_path,
                base_index_table=index_table,
                base_corpus_path=corpus_path,
                bucketed_table=compact_bucketed_table,
                prune_deltas=compact_prune_deltas,
                retain_versions=compact_retain_versions,
                major=bool(
                    compact_major_every
                    and (batch_id // compact_every) % compact_major_every == 0
                ),
                auto_major_rows=compact_major_rows,
                num_hashes=num_hashes,
                bands=bands,
                checkable=checkable,
            )
        if batch.isEmpty():
            return
        anchor = man or base_manifest
        index = _load_anchor_index(spark, anchor)
        docs = _load_anchor_corpus(spark, anchor, out_dir)
        after = anchor["through_batch"]
        if update_index:
            deltas = _read_prior_batches(
                spark,
                f"{out_dir}/index_delta",
                ["sid", "band", "bucket"],
                batch_id,
                after,
            )
            if deltas is not None:
                index = index.unionByName(deltas)
            prior_clean = _read_prior_batches(
                spark,
                f"{out_dir}/clean",
                ["doc_id", "text", "batch_id"],
                batch_id,
                after,
            )
            if prior_clean is not None:
                # per-doc LATEST text in the tail, current text winning
                # over base/folded copies (the flagship's shape): a doc
                # re-sent with CHANGED text (same-id exclusion passes
                # it through as clean) would otherwise sit in the
                # verify universe with both texts, and a new near-dup
                # of the RETIRED text could flag against content the
                # corpus no longer serves.
                docs = _merge_latest_tail(docs, prior_clean)
        probed = probe_batch(
            batch,
            docs,
            index,
            threshold,
            num_hashes,
            bands,
            checkable,
            intra_batch=intra_batch,
            return_clean_buckets=update_index,
            chain_policy=chain_policy,
        )
        flagged, clean = probed[0], probed[1]
        # batch_id-keyed overwrite => replay-idempotent (exactly-once).
        # flagged's partition dir is named ingest_batch, not batch_id:
        # the pair rows already carry a batch_id DATA column (the batch
        # doc's id), and a same-named partition column would collide on
        # read-back of the whole tree.
        flagged.write.mode("overwrite").parquet(
            f"{out_dir}/flagged/ingest_batch={batch_id}"
        )
        clean.select("doc_id", "text").write.mode("overwrite").parquet(
            f"{out_dir}/clean/batch_id={batch_id}"
        )
        if update_index:
            # the clean docs' buckets come straight from probe_batch's
            # signature pass (checkpoint-backed) — no second
            # shingle+minhash run over the clean docs read back from
            # disk. Deterministic per-row computation => byte-identical
            # to the old recompute, so replays stay idempotent.
            probed[2].write.mode("overwrite").parquet(
                f"{out_dir}/index_delta/batch_id={batch_id}"
            )
        release_cache()

    docs_stream = (
        spark.readStream.format("paginated")
        .option("path", source_path)
        .option("page_size", str(page_size))
        .option("pages_per_batch", str(pages_per_batch))
        .load()
    )
    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
