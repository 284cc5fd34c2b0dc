"""Unit pins for operators.index_memo: the memo hit, the superseded-
entry retirement (ANY fingerprint or construction version — a
version-locked glob would strand one index copy per version bump,
r10 review finding), and the failed-build temp cleanup (ADVICE r9)."""

from __future__ import annotations

import os

import pytest

from notion_vector_store_etl_pipeline_spark.operators import index_memo as M


@pytest.fixture()
def cache_root(tmp_path, monkeypatch):
    root = str(tmp_path / "cache")
    monkeypatch.setattr(M, "cache_root", lambda: root)
    return root


def _src(tmp_path, name="src.parquet", text="data"):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_memo_hit_and_build_once(cache_root, tmp_path):
    src = _src(tmp_path)
    calls = []

    def build(tmp):
        calls.append(tmp)
        os.makedirs(tmp, exist_ok=True)

    p1 = M.memoized_index(src, "fam", "v1", build)
    p2 = M.memoized_index(src, "fam", "v1", build)
    assert p1 == p2 and len(calls) == 1 and os.path.isdir(p1)


def test_retirement_spans_versions_and_fingerprints(cache_root, tmp_path):
    src = _src(tmp_path)

    def build(tmp):
        os.makedirs(tmp, exist_ok=True)

    p_old = M.memoized_index(src, "fam", "v1", build)
    # a version bump must retire the v1 entry, not strand it
    p_new = M.memoized_index(src, "fam", "v2", build)
    assert os.path.isdir(p_new) and not os.path.exists(p_old)

    # a fingerprint change (regenerated source) retires the stale one
    with open(src, "w") as f:
        f.write("regenerated-longer-content")
    p_refp = M.memoized_index(src, "fam", "v2", build)
    assert p_refp != p_new and os.path.isdir(p_refp)
    assert not os.path.exists(p_new)

    # a DIFFERENT family's entries are untouched
    p_other = M.memoized_index(src, "other", "v1", build)
    M.memoized_index(src, "fam", "v3", build)
    assert os.path.isdir(p_other)


def test_retirement_skips_inflight_build_temps(cache_root, tmp_path):
    src = _src(tmp_path)

    def build(tmp):
        os.makedirs(tmp, exist_ok=True)

    p1 = M.memoized_index(src, "fam", "v1", build)
    # simulate a concurrent builder's in-flight temp for a bumped version
    inflight = f"{p1[:-3]}_v9.build-deadbeef"
    os.makedirs(inflight, exist_ok=True)
    M.memoized_index(src, "fam", "v2", build)
    assert os.path.isdir(inflight), "concurrent temp was retired"


def test_failed_build_leaves_no_orphan_temp(cache_root, tmp_path):
    src = _src(tmp_path)

    def bad_build(tmp):
        os.makedirs(tmp, exist_ok=True)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        M.memoized_index(src, "fam", "v1", bad_build)
    leftovers = [d for d in os.listdir(cache_root)] if os.path.isdir(cache_root) else []
    assert not any(".build-" in d for d in leftovers), leftovers
