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
    # (a) new or changed in round 9 (2): the stored-IVF probe is NEW
    # (never driver-sampled); minhash_probe_stored_index's memo moved
    # to the shared index_memo helper (mtime_ns fingerprint, hashed
    # key, per-user root) so its query fn changed and gets a fresh
    # proof row.
    "knn_ivf_incremental",
    "knn_ivf_stored_index",
    "minhash_probe_stored_index",
    # (b) oldest proof rows first (recomputed from CORRECTNESS_r0*.json
    # at the start of r9): the 15 remaining round-5-vintage names.
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
    # (b) continued: 33 of the 47 round-6-vintage rows (alphabetical
    # prefix; the remaining 14 — semdedup_cluster_prune through
    # window_tumbling_counts — lead the round-10 rotation).
    "agg_percentiles",
    "agg_stats_corr",
    "agg_status_counts",
    "agg_string_concat",
    "cogroup_conversion_stats",
    "curation_funnel",
    "date_arithmetic",
    "dedup_exact_hash",
    "doc_fingerprint",
    "every_nth_row",
    "filter_isin_notnull",
    "from_json_schema_read",
    "graph_pagerank",
    "graph_reachability",
    "group_normalize_pandas",
    "histogram_width_bucket",
    "join_asof_latest",
    "join_range_theta",
    "json_extract_props",
    "knn_topk",
    "label_centroids",
    "lang_id_heuristic",
    "multimodal_audio_features",
    "multimodal_decode_arrow",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_resize",
    "neardup_components",
    "pii_mask",
    "pivot_counts",
    "profile_columns",
    "quality_score",
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
