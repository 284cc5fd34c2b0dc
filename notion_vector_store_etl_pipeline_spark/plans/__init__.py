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
    # (a) new or changed in round 8 (2): the stored-index probe is NEW
    # (never driver-sampled); minhash_incremental_probe's dense-bucket
    # collapse changed from 1-member to PROBE_DENSE_KEEP=2 (r7 verdict
    # item 1) so its oracle needs a fresh proof row.
    "minhash_probe_stored_index",
    "minhash_incremental_probe",
    # (b) oldest proof rows first (recomputed from CORRECTNESS_r0*.json
    # at the start of r8): the 18 remaining round-4-vintage names.
    "neardup_cluster_survivors",
    "outlier_mad_filter",
    "parse_bool_int",
    "project_coalesce",
    "regex_extract_id",
    "regexp_extract_all_numbers",
    "repetition_profile",
    "safe_filename",
    "sequence_packing",
    "similarity_selfjoin",
    "split_train_val_test",
    "title_coalesce",
    "train_export_shuffle",
    "traversal_step",
    "url_basename",
    "uuid_normalize",
    "winnowing_fingerprint",
    "zorder_layout",
    # (b) continued: 30 of the 45 round-5-vintage rows (alphabetical
    # prefix; the remaining 15 — tpch_q20_part_promotion through
    # window_sliding_counts — lead the round-9 rotation).
    "agg_cube",
    "agg_grouping_sets",
    "array_hof_ops",
    "dedup_embedding_cosine",
    "hybrid_rrf_search",
    "incremental_changed",
    "interval_merge_islands",
    "join_full_outer_coalesce",
    "kmeans_assign",
    "kmeans_update",
    "knn_filtered",
    "lateral_top_item",
    "levenshtein_neardup_titles",
    "map_explode_props",
    "pit_interval_lookup",
    "scd2_intervals",
    "session_window_native",
    "simhash_buckets",
    "simhash_neardup",
    "timeseries_gapfill",
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
