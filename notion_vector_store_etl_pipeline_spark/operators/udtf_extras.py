"""Polymorphic Python UDTF (Spark 4 ``analyze()`` API): output schema
computed from a constant argument at plan time.

The reference parses semi-structured property payloads with ad-hoc
Python (`Notion_openai_vector_etl.py:127-148` walks rich-text props);
the engine-native form is a table function whose OUTPUT COLUMNS derive
from a caller-supplied spec — one UDTF serves every payload layout, and
Catalyst sees real typed columns (prunable, filterable) instead of a
map blob. This is the Spark-4-only "dynamic schema" UDTF surface that
the static chunker UDTF (operators/chunker.py) doesn't exercise.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructType,
)
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

_TYPES = {"int": LongType(), "str": StringType(), "double": DoubleType()}


class PropsParse:
    """``props_parse('a:int,b:str', payload)`` — parse ``k=v;k=v``
    payload strings into one row of typed columns named by the spec.

    The spec argument MUST be a constant (it defines the schema);
    missing keys yield NULL, unparseable numerics yield NULL (the
    permissive-mode convention), extra keys are ignored.
    """

    @staticmethod
    def analyze(spec: AnalyzeArgument, payload: AnalyzeArgument) -> AnalyzeResult:
        if not spec.isConstantExpression or spec.value is None:
            raise Exception("props_parse: spec must be a constant string")
        schema = StructType()
        for part in str(spec.value).split(","):
            name, _, typ = part.strip().partition(":")
            if typ not in _TYPES:
                raise Exception(f"props_parse: unknown type {typ!r} in spec")
            schema = schema.add(name, _TYPES[typ])
        return AnalyzeResult(schema=schema)

    def __init__(self):
        # the spec is plan-time constant (analyze() enforces it), so
        # parse it once per UDTF instance instead of once per ROW —
        # keyed on the string in case an instance is ever reused
        # across specs
        self._spec_str: str | None = None
        self._fields: list[tuple[str, str, str]] = []

    def eval(self, spec: str, payload: str):
        if spec != self._spec_str:
            self._fields = [p.strip().partition(":") for p in spec.split(",")]
            self._spec_str = spec
        fields = self._fields
        kv = {}
        for item in (payload or "").split(";"):
            k, sep, v = item.partition("=")
            if sep:
                kv[k.strip()] = v.strip()
        row = []
        for name, _, typ in fields:
            raw = kv.get(name)
            if raw is None:
                row.append(None)
            elif typ == "int":
                try:
                    row.append(int(raw))
                except ValueError:
                    row.append(None)
            elif typ == "double":
                try:
                    row.append(float(raw))
                except ValueError:
                    row.append(None)
            else:
                row.append(raw)
        yield tuple(row)


def register_props_parse(spark) -> None:
    spark.udtf.register("props_parse", udtf(PropsParse))
