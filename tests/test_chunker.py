"""Exact-semantics tests for the greedy chunker (SURVEY.md §5.3-5.4):
unit cases for the subtle behaviors, hypothesis properties for the
invariants, and a Spark-vs-kernel differential check.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.operators.chunker import (
    explode_chunks,
    greedy_chunk_text,
)


def test_empty_and_whitespace():
    assert greedy_chunk_text("", 10) == []
    assert greedy_chunk_text("   \n  \n", 10) == []
    assert greedy_chunk_text(None, 10) == []


def test_single_short_line():
    assert greedy_chunk_text("hello", 10) == ["hello"]


def test_line_longer_than_max_is_own_chunk():
    # a line > max_len still becomes one chunk (bound only applies when
    # the pending group is non-empty)
    text = "x" * 50
    assert greedy_chunk_text(text, 10) == [text]


def test_separators_not_counted():
    # two 5-char lines pack into max_len=10 even though "a\nb" is 11 chars
    text = "aaaaa\nbbbbb\nccccc"
    assert greedy_chunk_text(text, 10) == ["aaaaa\nbbbbb", "ccccc"]


def test_greedy_packing_resets():
    text = "aaaa\nbbbb\ncccc\ndddd"
    # max 8: packs 2 lines per chunk
    assert greedy_chunk_text(text, 8) == ["aaaa\nbbbb", "cccc\ndddd"]


def test_strip_and_drop_empty():
    text = "  \n\naaaa\n \n"
    out = greedy_chunk_text(text, 4)
    assert out == ["aaaa"]


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=400), st.integers(2, 50))
@settings(max_examples=300, deadline=None)
def test_chunker_invariants(text, max_len):
    chunks = greedy_chunk_text(text, max_len)
    lines = text.splitlines()
    longest = max((len(l) for l in lines), default=0)
    for c in chunks:
        assert c == c.strip()
        assert c != ""
        # no chunk exceeds max(max_len, longest single line)
        assert sum(len(l) for l in c.split("\n")) <= max(max_len, longest)
    # every chunk's lines appear in the original line stream, in order
    flat = [l for c in chunks for l in c.split("\n")]
    it = iter(lines)
    for line in flat:
        # each (possibly stripped-at-boundary) chunk line must match some
        # original line or be a stripped prefix/suffix artifact
        found = False
        for orig in it:
            if orig == line or orig.strip() == line or line in orig:
                found = True
                break
        assert found, f"line {line!r} not found in order"


def test_spark_matches_kernel(spark):
    rows = [
        (1, "aaaa\nbbbb\ncccc"),
        (2, ""),
        (3, "x" * 100),
        (4, "  \n\nword\n \n"),
        (5, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r.doc_id, r.chunk_index): r.chunk_text
        for r in explode_chunks(df, max_len=8).collect()
    }
    want = {}
    for doc_id, text in rows:
        for i, c in enumerate(greedy_chunk_text(text, 8)):
            want[(doc_id, i)] = c
    assert got == want
