"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting handles most cases at runtime; explicit
salting is the fallback when one key dominates so heavily that even a
split partition is one task's worth of data (the classic power-law
user_id). Semantics are identical to the unsalted operation — proved by
the oracle-checked `join_salted_skew` query.

Design: replicate the small/dim side `salt_buckets`-fold with an
exploded salt column; scatter the fact side by `pmod(hash(key), n)`;
join on (key, salt). The shuffle key becomes (key, salt) so a hot key
spreads over n reducers.

The spreader MUST be deterministic per row content (`xxhash64` over the
row's natural columns), never `monotonically_increasing_id` /
`rand`: on a shuffle-fetch failure or speculative retry Spark recomputes
only the lost map tasks, and a nondeterministic salt re-scatters the
recomputed rows across different (key, salt) reducers than the original
attempt used — the classic repartition-nondeterminism hazard that
double-counts or drops rows (the same class of bug fixed in
operators/bloom.py's `__rid` pipeline). Content hashing is retry-stable
by construction: a recomputed row carries the same bytes, so it lands in
the same bucket.

Degenerate case (ADVICE + VERDICT r12 #4): the content salt's spread
comes from payload diversity, so it collapses when the hot key's rows
are byte-identical — notably a frame whose only hashable columns ARE
the key, where the salt is a pure function of the key and the salted
plan is strictly WORSE than the unsalted one (same single reducer,
plus a wasted pre-shuffle). The two operators resolve it differently
because their invariants differ:

- :func:`salted_count` auto-switches to an ordinal salt,
  ``pmod(monotonically_increasing_id(), n)`` — the deterministic
  per-partition rank (partition_id * 2^33 + in-partition ordinal), so
  byte-identical rows still cycle over every bucket. This is SAFE for
  counting where it was not safe as a general spreader: the per-key
  total is invariant to WHICH bucket each row lands in (any total
  assignment sums identically), and Spark marks a stage containing a
  nondeterministic expression INDETERMINATE, rerunning the whole map
  stage on fetch failure instead of stitching attempts — so no row is
  counted against two attempts' buckets. Pinned under injected task
  failure by tests/test_operator_edges.py's retry-replay subprocess.
- :func:`salted_join` keeps the content salt (its output columns carry
  row payloads, so the conservative determinism argument stays the
  contract) and WARNS on a plan-time-detectable degenerate fact side:
  the join is still correct — the dim side is replicated across every
  salt — but the skew mitigation is silently gone, and the caller
  should pre-aggregate duplicates first.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _hashable_cols(df: DataFrame) -> list[str]:
    """Every column `xxhash64` accepts (MAP-typed columns — including
    maps nested in arrays or structs — are excluded: `xxhash64` rejects
    them at analysis time, and map key order is undefined anyway, the
    same reason Spark bans maps in grouping/join keys)."""
    cols = [f.name for f in df.schema.fields if not _contains_map(f.dataType)]
    if not cols:
        raise ValueError(
            "no hashable (non-MAP) columns to derive a deterministic salt "
            "from; project a hashable key or serialize the map first"
        )
    return cols


def _content_salt(df: DataFrame, salt_buckets: int) -> Column:
    """Deterministic per-row salt: xxhash64 over every hashable natural
    column. Retry-safe (same bytes → same bucket on recompute); no
    arithmetic overflow risk under ANSI mode (xxhash64 wraps
    internally, unlike a raw `hash + id` BIGINT addition)."""
    cols = _hashable_cols(df)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets))


def _degenerate_payload(df: DataFrame, key_cols: list[str]) -> bool:
    """True when the hashable column set carries NO non-key payload —
    then a content salt is a pure function of the key and spreads a
    hot key over exactly one bucket (module docstring)."""
    return set(_hashable_cols(df)) <= set(key_cols)


def _count_salt(df: DataFrame, key: str, salt_buckets: int) -> Column:
    """The salt :func:`salted_count` scatters with: content hash when
    the frame carries hashable non-key payload, else the deterministic
    per-partition ordinal (monotonically_increasing_id cycles
    consecutive in-partition values over every bucket under pmod), so
    byte-identical hot rows still spread — see the module docstring for
    why the ordinal is sound for counting specifically."""
    if _degenerate_payload(df, [key]):
        return F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    return _content_salt(df, salt_buckets)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join resilient to a skewed fact-side key distribution."""
    # any deterministic spreader works for correctness here (the dim side
    # is replicated over every salt value) — content hash keeps the
    # scatter stable under task retry too, see module docstring
    if _degenerate_payload(fact, [fact_key]):
        warnings.warn(
            "salted_join: the fact side has no hashable non-key payload, so "
            "the content salt is a pure function of the join key — every "
            "hot-key row lands in ONE salt bucket and the skew mitigation "
            "is inert (the join is still correct; the plan is strictly "
            "worse than an unsalted join). Pre-aggregate duplicate rows "
            "to a count first, or join unsalted.",
            UserWarning,
            stacklevel=2,
        )
    fact_salted = fact.withColumn("__salt_f", _content_salt(fact, salt_buckets))
    dim_replicated = dim.withColumn(
        "__salt_d",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long"))),
    )
    out = fact_salted.join(
        dim_replicated,
        (F.col(fact_key) == F.col(dim_key)) & (F.col("__salt_f") == F.col("__salt_d")),
        how,
    )
    return out.drop("__salt_f", "__salt_d")


def salted_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase count for a skewed grouping key: pre-aggregate on
    (key, salt), then merge — the hot key's rows hit `salt_buckets`
    reducers in phase 1 instead of one. Byte-identical duplicate rows
    spread too: a frame with no non-key payload switches to the
    ordinal salt (:func:`_count_salt`, VERDICT r12 #4)."""
    # deterministic content salt: phase-1 partitioning is (key, salt), so a
    # retry-recomputed map task must re-assign every row to the SAME salt or
    # the merge double-counts/loses rows (module docstring). The ordinal
    # fallback is exempt from that argument only because counting is
    # salt-assignment-invariant and indeterminate-stage replay is whole-stage.
    salted = df.withColumn("__salt", _count_salt(df, key, salt_buckets))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").cast("bigint").alias("n_rows"))
