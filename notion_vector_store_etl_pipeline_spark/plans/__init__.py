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
    # (a) new or changed in round 7 (10): the capped prefix-filter
    # variant is NEW; minhash gained the dense-bucket star guard +
    # decoupled recall gate; q21 was rewritten as the per-order census;
    # the ngram pair and hll ride the shared tracked-persist registry
    # change; graph_reachability_sql was A/B'd back to bare;
    # knn_ivf_quantized exercises the new collect_vectors bound guard.
    "ngram_jaccard_prefixfilter_capped",
    "minhash_incremental_probe",
    "minhash_neardup_components",
    "minhash_lsh_neardup",
    "tpch_q21_waiting_supplier",
    "ngram_jaccard_prefixfilter",
    "ngram_jaccard_selfjoin",
    "graph_reachability_sql",
    "hll_sketch_union",
    "knn_ivf_quantized",
    # (b) oldest proof rows: the 24 queries whose latest green row is
    # still round 1.
    "semi_join_filter",
    "point_lookup",
    "sort_topk",
    "topk_per_group",
    "limit_pages",
    "scan_union_seed",
    "setop_except",
    "agg_rollup",
    "agg_distinct_counts",
    "dedup_first_wins",
    "setop_intersect",
    "join_salted_skew",
    "setop_except_all",
    "union_schema_evolution",
    "setop_intersect_all",
    "chunk_explode",
    "chunk_explode_words",
    "chunk_explode_udtf",
    "chunk_ids",
    "state_load",
    "left_join_state",
    "needs_vector_flag",
    "anti_join_unchanged",
    "stale_detect",
    # (b) continued: 16 of the 35 round-4-vintage rows (alphabetical
    # prefix; the remaining 19 (from neardup_cluster_survivors on) lead
    # the round-8 rotation).
    "agg_approx_distinct",
    "agg_group_sum",
    "bloom_prejoin_filter",
    "classifier_score_linear",
    "contamination_ngram_overlap",
    "domain_blocklist_filter",
    "dq_expectations",
    "embedding_norms",
    "embedding_quantize_int8",
    "hash_sha2",
    "heavy_hitters_topk",
    "join_broadcast_dim",
    "join_inner_equi",
    "knn_ivf_approx",
    "knn_lsh_cosine",
    "mixture_rebalance_lang",
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
