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
# samples a prefix window of the registry (the first ~50), so the
# window is spent deliberately. The _PRIORITY list below pins the
# round-5 window: (a) the queries whose fixes this round must prove
# (the 2 loader-crash rows, the 4 newly-oracled approximate-index
# rows, the 3 perf-rewritten rows), then (b) the families that have
# NEVER had a driver row in rounds 1-4 (TPC-H 22, retrieval, analytic
# windows, SCD2/PIT/timeseries, relational window/lateral wave).
# Everything else keeps module order behind them — rotate again in r6
# so the remaining never-sampled set gets its rows.
#
# r6 rotation (computed end of r5 from CORRECTNESS_r01-04 ∪ this
# window): exactly these 41 names have never had a driver row — they
# fit one final window, completing cross-round driver coverage of the
# whole registry:
#   text_token_stats token_count_bpe lang_id_heuristic quality_score
#   doc_fingerprint multimodal_decode_stub multimodal_resize
#   multimodal_audio_features multimodal_decode_arrow tfidf_top_terms
#   stratified_sample_per_group time_rollup_multi profile_columns
#   curation_funnel label_centroids hll_sketch_union agg_percentiles
#   agg_stats_corr agg_string_concat date_arithmetic window_session_gap
#   pivot_counts unpivot_metrics window_lag_lead pii_mask
#   multimodal_frame_sample group_normalize_pandas state_merge_upsert
#   sort_nulls_ordering sample_deterministic histogram_width_bucket
#   cogroup_conversion_stats filter_isin_notnull agg_status_counts
#   every_nth_row window_tumbling_counts json_extract_props
#   from_json_schema_read join_range_theta join_asof_latest
#   variant_extract_props
_PRIORITY = (
    # fixes to prove
    "interval_merge_islands",
    "map_explode_props",
    "minhash_lsh_neardup",
    "simhash_buckets",
    "simhash_neardup",
    "knn_ivf_quantized",
    "incremental_changed",
    "ngram_jaccard_prefixfilter",
    "levenshtein_neardup_titles",
    # never-sampled: TPC-H
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_values",
    "tpch_q12_priority_case_agg",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_qty_avg",
    "tpch_q18_large_volume",
    "tpch_q19_or_predicates",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    # never-sampled: retrieval wave
    "kmeans_assign",
    "kmeans_update",
    "knn_filtered",
    "hybrid_rrf_search",
    # never-sampled: analytic windows
    "agg_cube",
    "window_range_frame",
    "window_first_last",
    "dedup_embedding_cosine",
    # never-sampled: timeseries / SCD2 / PIT
    "session_window_native",
    "scd2_intervals",
    "timeseries_gapfill",
    "pit_interval_lookup",
    # never-sampled: window/lateral wave
    "window_ntile_cume",
    "agg_grouping_sets",
    "join_full_outer_coalesce",
    "window_running_total",
    "array_hof_ops",
    "lateral_top_item",
    "window_sliding_counts",
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
