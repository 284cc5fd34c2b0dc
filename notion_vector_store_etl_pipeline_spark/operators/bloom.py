"""Distributed Bloom-filter join pruning.

Spark 4.1 does not expose ``bloom_filter_agg``/``might_contain`` as SQL
functions, so the sketch is composed from JVM expressions: build-side
keys hash to ``k`` bit positions (xxhash64 with distinct seeds), the
positions bit_or-aggregate into (word_idx, word) rows — a partitioned
Bloom build whose result is a few-KB table that broadcasts. Probe rows
explode their own ``k`` positions, join the words, and survive only
with all ``k`` bits set; a final exact semi-join removes the false
positives. The point at 100 TB: the probe table is pruned BEFORE its
join shuffle — the runtime-filter pattern, explicit and testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> Column:
    return F.array(*[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)])


def bloom_build(build_keys: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """(word_idx, word) rows of the distributed Bloom filter."""
    return (
        build_keys.select(F.explode(_positions(F.col(key), m_bits, k)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("bigint").alias("word_idx"),
            F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("word"))
    )


def bloom_prejoin_semi(
    probe: DataFrame,
    build_keys: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """EXACT left-semi join of ``probe`` against ``build_keys``, with a
    broadcast Bloom pre-filter dropping probe rows before the shuffle.

    Duplicate probe rows are handled by weight, not by a per-row id:
    identical rows collapse to one representative carrying their count
    BEFORE the position explode (k exploded rows per DISTINCT value,
    not per input row), the ``_k_hits == k`` gate runs on distinct
    rows, and survivors re-expand to their original multiplicity. The
    obvious alternative — tagging rows with
    ``monotonically_increasing_id`` — is NON-DETERMINISTIC across
    stage recomputation: a shuffle-fetch failure or speculative retry
    re-executes the probe-side stage with different rids than the
    partially-aggregated shuffle data, corrupting the exact ``== k``
    gate (ADVICE r10). Every column here is a pure function of row
    values, so retries reproduce identical rows."""
    words = bloom_build(build_keys, build_key, m_bits, k)
    cols = probe.columns
    distinct_w = probe.groupBy(*cols).agg(F.count(F.lit(1)).alias("__w"))
    exploded = distinct_w.select(
        *cols,
        "__w",
        F.explode(_positions(F.col(probe_key), m_bits, k)).alias("pos"),
    ).select(
        *cols,
        "__w",
        (F.col("pos") / 64).cast("bigint").alias("word_idx"),
        F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("bit"),
    )
    candidates = (
        exploded.join(F.broadcast(words), "word_idx")
        .filter(F.expr("(shiftright(word, bit) & 1) = 1"))
        .groupBy(*cols, "__w")
        .agg(F.count(F.lit(1)).alias("_k_hits"))
        .filter(F.col("_k_hits") == k)  # Bloom candidates (may have FPs)
        .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__w"))))
        .drop("_k_hits", "__w", "__i")
    )
    return candidates.join(
        build_keys, candidates[probe_key] == build_keys[build_key], "left_semi"
    )
