"""Polymorphic UDTF: the output schema is computed from the constant
spec at plan time, values parse per the spec, and a non-constant spec
is rejected at analysis.
"""

from __future__ import annotations

import pytest

from notion_vector_store_etl_pipeline_spark.operators.udtf_extras import (
    register_props_parse,
)


def test_schema_follows_spec(spark):
    register_props_parse(spark)
    df = spark.sql(
        "SELECT * FROM props_parse('a:int,b:str,c:double', 'a=7;b=hi;c=2.5;junk=x')"
    )
    assert df.dtypes == [("a", "bigint"), ("b", "string"), ("c", "double")]
    assert df.collect()[0] == (7, "hi", 2.5)

    # a different spec = a different schema from the SAME function
    df2 = spark.sql("SELECT * FROM props_parse('z:str', 'z=ok')")
    assert df2.dtypes == [("z", "string")]


def test_lateral_join_over_table(spark):
    register_props_parse(spark)
    spark.createDataFrame(
        [(1, "n=10;tag=alpha"), (2, "tag=beta"), (3, "n=oops;tag=gamma")],
        "id int, payload string",
    ).createOrReplaceTempView("payloads")
    rows = spark.sql(
        """
        SELECT p.id, x.n, x.tag
        FROM payloads p, LATERAL props_parse('n:int,tag:str', p.payload) x
        ORDER BY p.id
        """
    ).collect()
    assert [tuple(r) for r in rows] == [
        (1, 10, "alpha"),
        (2, None, "beta"),  # missing key -> NULL
        (3, None, "gamma"),  # unparseable int -> NULL
    ]


def test_non_constant_spec_rejected(spark):
    register_props_parse(spark)
    spark.createDataFrame([("a:int", "a=1")], "s string, v string").createOrReplaceTempView(
        "specs"
    )
    with pytest.raises(Exception) as ei:
        spark.sql(
            "SELECT * FROM specs s, LATERAL props_parse(s.s, s.v)"
        ).collect()
    assert "constant" in str(ei.value)
