"""Dense-vector similarity kernels.

Two execution strategies:

- ``functions.vectors`` (HOF): pure-JVM array math — right for
  per-row scoring (norms) and small probe sets.
- This module (numpy/Arrow): block-matrix scoring via ``mapInPandas``
  — one BLAS GEMM per Arrow batch instead of millions of interpreted
  lambda evals. The small side (queries / the dedup block) is closed
  over and shipped to executors (Spark broadcasts task binaries); the
  big side streams through in batches. This is the standard design for
  brute-force scoring at scale; beyond ~10^5 on the closed-over side,
  switch to the LSH/IVF candidate-generation paths (``knn_ivf_approx``,
  MinHash LSH).

Scores are float64; both DuckDB's list ops and numpy accumulate in
double, and results are rounded to 6 decimals before any threshold or
ranking, so cross-engine comparisons are stable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PAIR_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("cand_id", LongType()),
        StructField("score", DoubleType()),
    ]
)

_SELF_SCHEMA = StructType(
    [
        StructField("a_id", LongType()),
        StructField("b_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


def _unit_matrix(ids: np.ndarray, mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0.0] = np.nan  # zero vectors -> NaN scores -> filtered
    return ids, mat / norms[:, None]


def cosine_scores_vs(
    candidates: DataFrame,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Score every candidate row against the in-memory query matrix.

    Output: (query_id, cand_id, score) with score rounded to 6.
    """
    q_ids, q_unit = _unit_matrix(
        np.asarray(query_ids, dtype=np.int64), np.asarray(query_mat, dtype=np.float64)
    )
    # ship the query matrix once per executor (broadcast), not once per
    # task via closure pickling
    bc = candidates.sparkSession.sparkContext.broadcast((q_ids, q_unit))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, q_unit = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf[emb_col].map(lambda a: np.asarray(a, dtype=np.float64)))
            _, c_unit = _unit_matrix(c_ids, c_mat)
            scores = np.round(c_unit @ q_unit.T, 6)  # (batch, n_queries)
            n_c, n_q = scores.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids[None, :], n_c, axis=0).ravel(),
                    "cand_id": np.repeat(c_ids, n_q),
                    "score": scores.ravel(),
                }
            )

    return candidates.select(id_col, emb_col).mapInPandas(batches, _PAIR_SCHEMA)


def collect_vectors(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side collect of a (small) vector set as numpy arrays."""
    rows = df.select(id_col, emb_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def cosine_selfjoin_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """All-pairs (a_id < b_id) cosine >= threshold.

    The full set is closed over as a unit matrix; each Arrow batch does
    one GEMM against it and keeps only upper-triangle hits. Exact — the
    sub-quadratic alternative for larger n is LSH/IVF candidates.
    """
    ids, mat = collect_vectors(df, id_col, emb_col)
    a_ids, a_unit = _unit_matrix(ids, mat)
    order = np.argsort(a_ids)
    a_ids, a_unit = a_ids[order], a_unit[order]
    bc = df.sparkSession.sparkContext.broadcast((a_ids, a_unit))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a_ids, a_unit = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            b_ids = pdf[id_col].to_numpy(dtype=np.int64)
            b_mat = np.stack(pdf[emb_col].map(lambda a: np.asarray(a, dtype=np.float64)))
            _, b_unit = _unit_matrix(b_ids, b_mat)
            scores = np.round(b_unit @ a_unit.T, 6)  # (batch, n_all)
            # keep pairs with batch-id < all-id
            mask = b_ids[:, None] < a_ids[None, :]
            mask &= scores >= threshold
            bi, ai = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "a_id": b_ids[bi],
                    "b_id": a_ids[ai],
                    "score": scores[bi, ai],
                }
            )

    return df.select(id_col, emb_col).mapInPandas(batches, _SELF_SCHEMA)
