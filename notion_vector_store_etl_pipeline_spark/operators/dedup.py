"""Deduplication operators for training-data pipelines: exact hash,
word-shingle Jaccard, MinHash+LSH, SimHash. All shuffle-conscious:

- exact: one shuffle on the content hash;
- n-gram Jaccard: explode distinct shingles -> self-join on shingle ->
  group per pair. The shingle join is the scale risk (hot shingles);
  ``max_shingle_freq`` drops stop-shingles, the standard mitigation;
- MinHash LSH: signatures per doc (narrow), band buckets -> self-join
  on (band, bucket-hash) — candidate pairs only, never the full cross
  product; exact-Jaccard verify on candidates;
- SimHash: 64-bit fingerprint, near-dup = small Hamming distance among
  bucket collisions on 16-bit chunks.

MinHash/SimHash use ``xxhash64`` (JVM-side, codegen) — engine-specific
hashing, so these are rows-only for the SQL oracle and are instead
verified in pytest against exact Jaccard ground truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^31-1: keeps a*h+b < 2^62, safe for 64-bit ANSI arithmetic
MERSENNE_PRIME = (1 << 31) - 1


def normalized_text(text: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles as ARRAY<STRING> (JVM higher-order fns)."""
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)])
    )
    return F.array_distinct(shingles)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """First-wins exact dedup on normalized-content hash."""
    hashed = df.withColumn("content_hash", F.sha2(normalized_text(F.col(text_col)), 256))
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(Window.partitionBy("content_hash")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity self-join: (a_id, b_id, jaccard)."""
    sh = df.select(
        F.col(id_col).alias("sid"), F.explode(word_shingles(F.col(text_col), k)).alias("shingle")
    )
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").count().filter(F.col("count") <= max_shingle_freq)
        sh = sh.join(F.broadcast(freq.select("shingle")), "shingle")
    sizes = sh.groupBy("sid").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.sid") < F.col("b.sid")))
        .groupBy(F.col("a.sid").alias("a_id"), F.col("b.sid").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("sid").alias("a_id"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("sid").alias("b_id"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def _minhash_cols(num_hashes: int) -> list[Column]:
    """Deterministic permutation family h_i(x) = (a_i*x + b_i) mod p over
    xxhash64 shingle hashes (classic MinHash; public construction)."""
    cols = []
    base = F.pmod(F.xxhash64(F.col("shingle")), F.lit(MERSENNE_PRIME))
    for i in range(num_hashes):
        a = 2 * i + 1  # odd multipliers, fixed seeds -> deterministic
        b = 1_000_003 * (i + 1)
        cols.append(
            F.min(F.pmod(base * F.lit(a) + F.lit(b), F.lit(MERSENNE_PRIME))).alias(f"mh_{i}")
        )
    return cols


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", num_hashes: int = 32, k: int = 3
) -> DataFrame:
    """(id, mh_0..mh_{n-1}) MinHash signature table."""
    sh = df.select(
        F.col(id_col).alias("sid"), F.explode(word_shingles(F.col(text_col), k)).alias("shingle")
    )
    return sh.groupBy("sid").agg(*_minhash_cols(num_hashes))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature, bucket-join per band, union candidate pairs."""
    n = bands * rows_per_band
    per_band = []
    for band in range(bands):
        cols = [f"mh_{band * rows_per_band + r}" for r in range(rows_per_band)]
        bucketed = signatures.select(
            F.col("sid"), F.xxhash64(*[F.col(c) for c in cols]).alias("bucket")
        )
        x, y = bucketed.alias("x"), bucketed.alias("y")
        pairs = x.join(
            y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.sid") < F.col("y.sid"))
        ).select(F.col("x.sid").alias("a_id"), F.col("y.sid").alias("b_id"))
        per_band.append(pairs)
    out = per_band[0]
    for p in per_band[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()


def minhash_neardup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard — the 100 TB near-dup
    path: candidate generation is bucket-local, never all-pairs."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes)
    candidates = minhash_lsh_candidates(sigs, bands, rows_per_band)
    exact = jaccard_pairs(df, text_col, id_col, threshold=threshold)
    return candidates.join(exact, ["a_id", "b_id"]).select("a_id", "b_id", "jaccard")


def simhash64(text: Column, k: int = 3) -> Column:
    """64-bit SimHash over word shingles: per bit, sign of the sum of
    ±1 contributions from each shingle's xxhash64 bit."""
    shingles = word_shingles(text, k)
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    bit_exprs = []
    for bit in range(64):
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_exprs.append(
            F.when(votes > 0, F.shiftleft(F.lit(1).cast("long"), bit)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out.bitwiseOR(e)
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
