"""Edge-case pins for the r10 plan-registry review findings — behaviors
the oracle-parity gate cannot reach because the fixtures never produce
them: duplicate probe rows through the Bloom pre-filter, '+'/malformed
escapes through url_basename, the salted-join spreader under ANSI mode,
and graph_pagerank's persists being release_cache()-able.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.functions import strings as S
from notion_vector_store_etl_pipeline_spark.operators.bloom import bloom_prejoin_semi
from notion_vector_store_etl_pipeline_spark.operators.skew import salted_join

from tests.conftest import SF_SMOKE


def test_url_basename_mirrors_python_unquote(spark):
    """The reference decodes with urllib.parse.unquote (:63-69): '+' is
    a literal, malformed '%' never raises. F.url_decode alone does
    neither — '+' becomes a space and a bad escape is an ANSI abort."""
    rows = [
        (1, "https://x.com/a/doc%20name.pdf?q=1"),  # %20 decodes
        (2, "https://x.com/a/a+b.pdf"),  # '+' stays literal
        (3, "https://x.com/a/100%table.pdf"),  # malformed: raw, no abort
        (4, "https://x.com/dir/sub%2Fname.txt"),  # %2F decodes
        (5, "?x=1"),  # empty basename -> NULL
    ]
    df = spark.createDataFrame(rows, "id: long, url: string")
    got = {
        r.id: r.b
        for r in df.select("id", S.url_basename(F.col("url")).alias("b")).collect()
    }
    assert got[1] == "doc name.pdf"
    assert got[2] == "a+b.pdf"
    assert got[3] == "100%table.pdf"
    assert got[4] == "sub/name.txt"
    assert got[5] is None


def test_bloom_prejoin_keeps_duplicate_probe_rows(spark):
    """Semi-join semantics keep BOTH copies of a duplicated probe row.
    The old hit-count regroup keyed on the row's columns: duplicates
    merged, their 2k combined hits failed the == k gate, and both
    copies vanished from an operator documented as EXACT."""
    probe = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (9, "z")], "k: long, v: string"
    )
    build = spark.createDataFrame([(1,), (2,)], "bk: long")
    out = bloom_prejoin_semi(probe, build, "k", "bk")
    assert sorted(r.k for r in out.collect()) == [1, 1, 2]


def test_salted_join_matches_unsalted(spark):
    """Salting must not change join semantics — including rows whose
    xxhash64 lands anywhere in the 64-bit range (the spreader hashes
    the row id INTO xxhash64 instead of adding it afterwards, which
    under ANSI mode could overflow and abort the job)."""
    fact = spark.createDataFrame([(i % 3, i) for i in range(100)], "k: long, v: long")
    dim = spark.createDataFrame([(0, "x"), (1, "y")], "dk: long, name: string")
    got = salted_join(fact, dim, "k", "dk").select("k", "v", "name")
    exp = fact.join(dim, fact.k == dim.dk).select("k", "v", "name")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_graph_pagerank_persists_are_tracked(spark):
    """graph_pagerank's two loop-invariant persists (nodes, edge⋈degree)
    must register with operators.cache so long-lived sessions can free
    them between queries; raw .persist() leaked them for the session
    lifetime (the ADVICE-r6 problem persist_tracked exists for)."""
    from notion_vector_store_etl_pipeline_spark.operators import cache
    from notion_vector_store_etl_pipeline_spark.plans.graph_queries import (
        graph_pagerank,
    )

    cache.release_cache()
    graph_pagerank(spark, SF_SMOKE).count()
    assert len(cache._PERSISTED) >= 2
    cache.release_cache()
    assert cache._PERSISTED == []


def test_group_normalize_single_member_group_is_null_not_nan(spark, tmp_path):
    """A single-member (or zero-variance) label group must z-score to
    NULL, matching the oracle's nullif(stddev,0) division — the old
    code shipped NaN doubles, which the parity hash distinguishes from
    NULL ('NaN' vs the null token). The shipped fixtures have no such
    group, so this crafts one and runs BOTH engines on it."""
    import duckdb

    from notion_vector_store_etl_pipeline_spark.plans import load_registry

    emb = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [0.0, 2.0]),
            (3, 0, [3.0, 0.0]),
            (4, 7, [5.0, 0.0]),  # label 7 has ONE member -> sd undefined
        ],
        "vec_id: long, label: int, embedding: array<double>",
    )
    sf = str(tmp_path)
    emb.write.parquet(f"{sf}/embeddings.parquet")

    q = load_registry()["group_normalize_pandas"]
    got = {r.vec_id: r.z_norm for r in q.fn(spark, sf).collect()}
    assert got[4] is None, f"single-member group produced {got[4]!r}, not NULL"

    con = duckdb.connect()
    # Spark wrote a DIRECTORY (the real fixtures are single files) —
    # DuckDB needs the part-file glob
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    want = {r[0]: r[2] for r in con.execute(q.oracle).fetchall()}
    for vid in got:
        if want[vid] is None:
            assert got[vid] is None
        else:
            assert abs(got[vid] - want[vid]) < 1e-9, (vid, got[vid], want[vid])
