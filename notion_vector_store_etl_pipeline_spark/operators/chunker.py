"""Greedy line-packing text chunker — the reference's one true UDTF.

Semantics match ``chunk_text`` in the reference
(`Notion_openai_vector_etl.py:239-251`), re-implemented from its
observed behavior (SURVEY.md §2.5 X1):

- split the text into lines (``str.splitlines`` semantics);
- greedily pack consecutive lines into a chunk while the sum of the
  *line lengths alone* (the joining ``\\n`` separators are NOT
  counted) stays ≤ ``max_len``;
- a single line longer than ``max_len`` still becomes its own chunk
  (the bound only triggers when the current chunk is non-empty);
- each emitted chunk is ``"\\n".join(lines).strip()``;
- empty (whitespace-only) chunks are dropped, and ``chunk_index``
  numbers the *surviving* chunks from 0.

Spark-side this is a vectorized pandas UDF returning
``ARRAY<STRING>`` followed by ``posexplode`` — the fan-out stays
JVM-side, only the per-document string scan runs in Python over Arrow
batches. At 100 TB the chunker is embarrassingly parallel (per-row,
no shuffle); partition sizing is inherited from the scan.
"""

from __future__ import annotations

from typing import List

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

DEFAULT_CHUNK_CHAR_LEN = 1200  # reference CHUNK_CHAR_LEN (`:47`)


def greedy_chunk_text(text: str, max_len: int) -> List[str]:
    """Pure-Python kernel; also the test oracle for property tests."""
    if text is None:
        return []
    out: List[str] = []
    pending: List[str] = []
    pending_len = 0
    for line in text.splitlines():
        if pending and pending_len + len(line) > max_len:
            joined = "\n".join(pending).strip()
            if joined:
                out.append(joined)
            pending, pending_len = [], 0
        pending.append(line)
        pending_len += len(line)
    if pending:
        joined = "\n".join(pending).strip()
        if joined:
            out.append(joined)
    return out


_CHUNKER_UDFS: dict[int, object] = {}


def chunker_udf(max_len: int = DEFAULT_CHUNK_CHAR_LEN):
    """Arrow-batched pandas UDF: STRING -> ARRAY<STRING> of chunks.
    Memoized per ``max_len`` (the ``_SHINGLE_UDFS`` pattern in
    dedup.py) so repeated registry/bench/pipeline calls reuse one UDF
    object instead of re-creating and re-serializing the closure."""
    if max_len not in _CHUNKER_UDFS:

        @F.pandas_udf(ArrayType(StringType()))
        def _chunk(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: greedy_chunk_text(t, max_len))

        _CHUNKER_UDFS[max_len] = _chunk
    return _CHUNKER_UDFS[max_len]


def explode_chunks(
    df: DataFrame,
    text_col: str = "text",
    max_len: int = DEFAULT_CHUNK_CHAR_LEN,
    index_name: str = "chunk_index",
    chunk_name: str = "chunk_text",
) -> DataFrame:
    """1 row -> N chunk rows, keeping all other columns.

    ``posexplode`` assigns the 0-based chunk index after the UDF has
    already dropped empty chunks, matching the reference's
    enumerate-after-filter numbering (`:308-312`).
    """
    chunks = chunker_udf(max_len)(F.col(text_col)).alias("__chunks")
    keep = [c for c in df.columns]
    return (
        df.select(*keep, chunks)
        .select(*keep, F.posexplode("__chunks").alias(index_name, chunk_name))
    )


def chunk_id(source_col: Column, hash_col: Column, index_col: Column) -> Column:
    """Deterministic chunk id: sha256 of "source|hash|index".

    Mirrors the reference's chunk-id derivation
    (`Notion_openai_vector_etl.py:312`) with ``F.sha2`` — bit-identical
    to hashlib.sha256 for the same bytes.
    """
    return F.sha2(F.concat_ws("|", source_col, hash_col, index_col.cast("string")), 256)
