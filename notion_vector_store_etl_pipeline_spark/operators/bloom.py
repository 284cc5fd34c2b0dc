"""Distributed Bloom-filter join pruning.

Spark 4.1 does not expose ``bloom_filter_agg``/``might_contain`` as SQL
functions, so the sketch is composed from JVM expressions: build-side
keys hash to ``k`` bit positions (xxhash64 with distinct seeds), the
positions bit_or-aggregate into (word_idx, word) rows — a distributed
Bloom BUILD whose result is a sketch of ``m_bits/8`` bytes. The sketch
is then collapsed to one dense array LITERAL and each probe row tests
its own ``k`` bits row-locally — a pure filter expression, so the probe
side is pruned with NO shuffle, NO explode, and NO join before the
final exact semi-join that removes false positives. The point at
100 TB: probe rows drop inside the scan's own stage — the
runtime-filter pattern, explicit and testable.

Determinism (ADVICE r10): every column is a pure function of row
values — a shuffle-fetch failure or speculative retry reproduces
identical rows. (An earlier shape tagged probe rows with
``monotonically_increasing_id`` to survive duplicates through an
explode/regroup pipeline; retries could re-tag rows differently than
the partially-aggregated shuffle data and silently drop them. The
row-local form needs no row identity at all, and duplicates are
trivially preserved by a filter.)

Sketch-size envelope: the literal costs ``m_bits/8`` bytes in every
task closure (128 KiB at the default 2^20 bits — the same bytes the
old broadcast join shipped). ``m_bits`` above ``_MAX_LITERAL_BITS``
(2^26 = 8 MiB) is refused loudly: at that scale the false-positive
budget calls for engine-side runtime filters or a partitioned-probe
design, not a plan-embedded literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# largest sketch worth embedding as a plan literal (8 MiB dense)
_MAX_LITERAL_BITS = 1 << 26


def _positions(key: Column, m_bits: int, k: int) -> Column:
    return F.array(*[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)])


def bloom_build(build_keys: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """(word_idx, word) rows of the distributed Bloom filter — sparse:
    only words with at least one set bit appear."""
    return (
        build_keys.select(F.explode(_positions(F.col(key), m_bits, k)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("bigint").alias("word_idx"),
            F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("word"))
    )


def bloom_might_contain(
    key: Column, dense_words: list[int], m_bits: int, k: int = 3
) -> Column:
    """Row-local Bloom membership test: TRUE iff all ``k`` bit probes
    of ``key`` are set in the dense word array (one array literal —
    ``element_at`` + shift per probe, no join)."""
    arr = F.lit(dense_words)
    checks = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, ((pos / 64).cast("int") + F.lit(1)))
        # F.shiftright only takes a PYTHON int for the shift amount;
        # the per-row bit offset needs the SQL function via
        # call_function, which accepts a Column
        checks.append(
            F.call_function(
                "shiftright", word, F.pmod(pos, F.lit(64)).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_prejoin_semi(
    probe: DataFrame,
    build_keys: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """EXACT left-semi join of ``probe`` against ``build_keys``, with a
    row-local Bloom pre-filter (module docstring) dropping probe rows
    inside their own scan stage before the semi-join's shuffle or
    broadcast. Duplicate probe rows pass through untouched — the
    pre-filter is a plain ``filter``, so semi-join multiplicity
    semantics are preserved by construction."""
    if m_bits > _MAX_LITERAL_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds the plan-literal envelope "
            f"({_MAX_LITERAL_BITS}); a sketch this large should be an "
            "engine-side runtime filter, not an embedded literal"
        )
    words = bloom_build(build_keys, build_key, m_bits, k)
    # collect the sparse sketch into a dense array: m_bits/8 bytes by
    # design — the same volume the broadcast-join form shipped to every
    # executor, now shipped once in the task closure instead of through
    # a join build side
    dense = [0] * ((m_bits + 63) // 64)
    for r in words.collect():
        dense[int(r["word_idx"])] = int(r["word"])
    candidates = probe.filter(
        bloom_might_contain(F.col(probe_key), dense, m_bits, k)
    )
    return candidates.join(
        build_keys, candidates[probe_key] == build_keys[build_key], "left_semi"
    )
