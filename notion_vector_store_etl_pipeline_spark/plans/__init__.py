"""Named-query registry — the contract surface consumed by
``__spark_entry__.py``.

Every operator from SURVEY.md §2 lands here as a ``Query``: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent DuckDB oracle SQL over the pre-registered fixture views
(region nation customer supplier part orders lineitem events documents
embeddings). Column names/aliases MUST match between the two sides —
the driver sorts columns by name and hashes values.

Registry contract caveat: a few queries whose plan reads a heavy
intermediate from multiple branches persist it EAGERLY at fn() call
time (hll_sketch_union, the prefix-filter jaccard family) — for those,
fn() launches a Spark job before the caller runs any action, and the
cache is held until ``operators.cache.release_cache()`` (or
``spark.catalog.clearCache()``) is called. Long-lived sessions that
loop over the registry should release between queries, as bench.py and
scripts/parity_check.py do.
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
# samples a prefix window of the registry (the first ~50), so the
# window is spent deliberately. Round-6 completed cross-round driver
# verification of the entire registry (157/157, see VERDICT r6); from
# round 7 on the window is a ROTATION: (a) queries added or changed
# this round, which need a fresh proof row, then (b) the queries whose
# latest green driver row is OLDEST (re-validation breadth — r1
# vintage first, then r4), recomputed each round from the
# CORRECTNESS_r0*.json files.
_PRIORITY = (
    # (a) new/changed in round 13 (5): the embedding-wing sequential
    # chain-disposition registration and the composed ingest-dedup
    # probe kernel (new operators, VERDICT r12 #6), plus the three
    # queries whose operator code changed this round — the peel's
    # input-validation guard (ADVICE r12), the duplicate-row-spreading
    # count salt (VERDICT r12 #4), and the file-snapshot-gated Bloom
    # sketch memo (ADVICE r12).
    "neardup_chain_sequential_cosine",
    "neardup_probe_chain_cosine",
    "dedup_chain_sequential",
    "join_salted_skew",
    "bloom_prejoin_filter",
    # (b) oldest proof rows first (COVERAGE.md staleness manifest,
    # recomputed by scripts/coverage_manifest.py at the start of r13):
    # the 23 remaining round-9-vintage names — after this window every
    # proof is r10+ and the max staleness stays within the 4-round
    # budget.
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "neardup_components",
    "pii_mask",
    "pivot_counts",
    "profile_columns",
    "quality_score",
    "tpch_q20_part_promotion",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "window_first_last",
    "window_ntile_cume",
    "window_range_frame",
    "window_running_total",
    "window_sliding_counts",
    # (c) round-10-vintage alphabetical fill to exactly 50 (the
    # driver's sample size, pinned in tests/test_fixture_canary.py);
    # the remainder of the r10 vintage leads the round-14 rotation.
    "agg_approx_distinct",
    "agg_distinct_counts",
    "agg_group_sum",
    "agg_rollup",
    "anti_join_unchanged",
    "chunk_explode",
    "chunk_explode_udtf",
    "chunk_explode_words",
    "chunk_ids",
    "classifier_score_linear",
    "contamination_ngram_overlap",
    "dedup_first_wins",
    "domain_blocklist_filter",
    "dq_expectations",
    "embedding_norms",
    "embedding_quantize_int8",
    "graph_reachability_sql",
    "hash_sha2",
    "heavy_hitters_topk",
    "hll_sketch_union",
    "join_broadcast_dim",
    "join_inner_equi",
)

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
    """Import all query modules (idempotent) and return the registry,
    reordered so _PRIORITY names lead (the driver's sample window is a
    prefix of this dict's iteration order)."""
    for mod in _MODULES:
        importlib.import_module(f"notion_vector_store_etl_pipeline_spark.plans.{mod}")
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    head = {n: REGISTRY[n] for n in _PRIORITY}
    tail = {n: q for n, q in REGISTRY.items() if n not in head}
    return {**head, **tail}
