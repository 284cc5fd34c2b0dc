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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join resilient to a skewed fact-side key distribution."""
    # any deterministic spreader works: the dim side is replicated over
    # every salt value, so the fact row's bucket never changes the result
    # the row id goes INTO the hash, not added after it: xxhash64 never
    # overflows, while `hash + id` is an unguarded BIGINT addition that
    # ANSI mode (Spark 4 default) turns into a job-killing
    # ARITHMETIC_OVERFLOW once the id is large enough
    fact_salted = fact.withColumn(
        "__salt_f",
        F.pmod(
            F.xxhash64(F.col(fact_key), F.monotonically_increasing_id()),
            F.lit(salt_buckets),
        ),
    )
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
    reducers in phase 1 instead of one."""
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").cast("bigint").alias("n_rows"))
