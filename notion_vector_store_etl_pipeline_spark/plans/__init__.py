"""Named-query registry — the contract surface consumed by
``__spark_entry__.py``.

Every operator from SURVEY.md §2 lands here as a ``Query``: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent DuckDB oracle SQL over the pre-registered fixture views
(region nation customer supplier part orders lineitem events documents
embeddings). Column names/aliases MUST match between the two sides —
the driver sorts columns by name and hashes values.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, or None -> driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = ""):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Registration order matters operationally: the correctness driver
# samples a prefix window of the registry (round 1: the first 50), so
# the window is spent deliberately. Round-2 priority inside the first
# ~50: (a) the five rows that were red-by-artifact in CORRECTNESS_r01
# and were fixed — regexp_extract_all_numbers + map_explode_props
# (moved to the top of strings_queries), embedding_quantize_int8 +
# knn_ivf_approx (vector_queries), agg_approx_distinct (moved to the
# top of relational) — their green rows are this round's done-criterion;
# (b) every round-2 query (pipeline_queries, semdedup/LSH in
# vector_queries, pagerank in graph_queries). Families with green r01
# rows (tpch, events, chunk, incremental, relational tail) go last;
# text/multimodal/training stay ahead of them in case the window grows.
_MODULES = (
    "dedup_queries",
    "pipeline_queries",
    "vector_queries",
    "strings_queries",
    "graph_queries",
    "curation_queries",
    "relational",
    "retrieval_queries",
    "text_queries",
    "multimodal_queries",
    "training_queries",
    "analytic_queries",
    "timeseries_queries",
    "tpch_queries",
    "tpch_more",
    "tpch_rest",
    "extended_queries",
    "grouped_queries",
    "event_queries",
    "relational_more",
    "chunk_queries",
    "incremental_queries",
)


def load_registry() -> dict[str, Query]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(f"notion_vector_store_etl_pipeline_spark.plans.{mod}")
    return REGISTRY
