"""Schema-on-read robustness: the three parser modes for malformed
records (PERMISSIVE + corrupt-record column, DROPMALFORMED, FAILFAST)
— at 100 TB some fraction of input lines is always broken, and which
mode a pipeline runs in is a correctness decision, not a detail.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

GOOD = [
    '{"doc_id": 1, "text": "alpha"}',
    '{"doc_id": 2, "text": "beta"}',
    '{"doc_id": 3, "text": "gamma"}',
]
BAD = [
    '{"doc_id": "not-a-number", "text": "delta"}',  # type mismatch
    '{"doc_id": 5, "text": ',  # truncated JSON
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(GOOD + BAD) + "\n")
    return str(p)


def _schema(with_corrupt: bool) -> StructType:
    fields = [StructField("doc_id", LongType()), StructField("text", StringType())]
    if with_corrupt:
        fields.append(StructField("_corrupt_record", StringType()))
    return StructType(fields)


def test_permissive_quarantines_corrupt_rows(spark, jsonl_path):
    df = (
        spark.read.schema(_schema(True))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(jsonl_path)
        .cache()  # Spark disallows querying ONLY the corrupt column off a raw scan
    )
    ok = df.filter(F.col("_corrupt_record").isNull())
    quarantined = df.filter(F.col("_corrupt_record").isNotNull())
    assert ok.count() == len(GOOD)
    assert quarantined.count() == len(BAD)
    # the quarantine keeps the raw line for replay/debugging
    raws = {r._corrupt_record for r in quarantined.collect()}
    assert raws == set(BAD)


def test_dropmalformed_keeps_only_clean_rows(spark, jsonl_path):
    df = (
        spark.read.schema(_schema(False))
        .option("mode", "DROPMALFORMED")
        .json(jsonl_path)
    )
    assert sorted(r.doc_id for r in df.collect()) == [1, 2, 3]


def test_failfast_raises(spark, jsonl_path):
    df = spark.read.schema(_schema(False)).option("mode", "FAILFAST").json(jsonl_path)
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
