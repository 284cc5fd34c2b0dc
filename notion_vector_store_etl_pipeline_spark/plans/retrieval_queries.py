"""Retrieval-engine queries (north-star §2.11 extension): the search
surface a vector store actually serves — k-means index maintenance
(Lloyd assignment + centroid update), metadata-filtered vector search,
and hybrid keyword+vector fusion (reciprocal rank fusion).

The reference IS a vector-store ETL (Notion -> OpenAI vector store,
`Notion_openai_vector_etl.py:254-301` uploads, `:609-614` stale-vector
maintenance); these queries are the read/maintenance side of that store
re-expressed as Spark plans.

Determinism: cosine in double, round(_, 6), ties broken by id — same
contract as vector_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table

_COS_SQL = (
    "round(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6)"
)

_K = 8  # clusters: centroids seeded from vec_id < _K


def _assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster, score): nearest seed centroid per vector, via
    the shared GEMM kernel — centroids ride one executor broadcast, the
    table is scored in Arrow batches, no shuffle until the consumer."""
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        collect_vectors,
        cosine_scores_vs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    c_ids, c_mat = collect_vectors(emb.filter(F.col("vec_id") < _K))
    scored = cosine_scores_vs(emb, c_ids, c_mat)
    w = Window.partitionBy("cand_id").orderBy(
        F.col("score").desc(), F.col("query_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("cand_id").alias("vec_id"),
            F.col("query_id").alias("cluster"),
            "score",
        )
    )


@register(
    "kmeans_assign",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {_K}
    ), scored AS (
      SELECT c.vec_id, q.cid AS cluster, {_COS_SQL} AS score
      FROM embeddings c
      CROSS JOIN (SELECT cid, embedding FROM cents) q
    )
    SELECT vec_id, cluster, score FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, cluster) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
    doc=f"Lloyd assignment step of k-means (k={_K}, centroids seeded "
    "deterministically from the lowest vec_ids): every vector scores "
    "against the broadcast centroid matrix in one Arrow GEMM pass and "
    "takes its argmax cluster (ties to the lower centroid id). The "
    "centroid set is bounded design data at any corpus size, so "
    "assignment is a map-side pass + one WindowGroupLimit-pruned "
    "shuffle on vec_id — the canonical 100 TB clustering-index build "
    "step (same shape as the IVF home-list assignment).",
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _assignment(spark, sf_dir)


@register(
    "kmeans_update",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {_K}
    ), scored AS (
      SELECT c.vec_id, c.embedding AS emb, q.cid AS cluster, {_COS_SQL} AS score
      FROM embeddings c
      CROSS JOIN (SELECT cid, embedding FROM cents) q
    ), assigned AS (
      SELECT vec_id, emb, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY score DESC, cluster) AS rn
        FROM scored
      ) WHERE rn = 1
    ), exploded AS (
      SELECT cluster, generate_subscripts(emb, 1) - 1 AS dim,
             CAST(unnest(emb) AS DOUBLE) AS v
      FROM assigned
    )
    SELECT cluster, dim, round(avg(v), 6) AS c_val,
           count(*) AS n_members
    FROM exploded GROUP BY cluster, dim
    """,
    doc="Lloyd centroid-update step: mean vector per cluster, computed "
    "as a (cluster, dimension) grouped average over posexploded "
    "components — partial aggregation makes each executor emit one "
    "partial sum per (cluster, dim), so the shuffle is k x dims rows "
    "regardless of corpus size. Together with kmeans_assign this is "
    "one full distributed Lloyd iteration; iterate to convergence by "
    "feeding c_val back as the next centroid sidecar.",
)
def kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = _assignment(spark, sf_dir).select("vec_id", "cluster")
    joined = emb.join(assigned, "vec_id").select(
        "cluster", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    n_members = F.count(F.lit(1))  # rows per (cluster,dim) == members
    return joined.groupBy("cluster", "dim").agg(
        F.round(F.avg("v"), 6).alias("c_val"),
        n_members.alias("n_members"),
    )


@register(
    "knn_filtered",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_SQL} AS score
      FROM q JOIN embeddings c
        ON c.vec_id <> q.vec_id AND c.label = q.label
    )
    SELECT query_id, cand_id, score, rn FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, cand_id) AS INTEGER) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
    doc="Metadata-filtered vector search (the vector-store query shape: "
    "top-k under a structured predicate — here: candidates must share "
    "the query's label). The label constraint is applied BEFORE "
    "scoring: the query batch with its labels broadcasts, candidates "
    "are pre-filtered by the broadcast join, and only surviving rows "
    "enter the GEMM — filter-then-score, never score-then-filter, "
    "which at 100 TB is the difference between scanning a label "
    "partition and scanning the corpus.",
)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        collect_vectors,
        cosine_scores_vs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    q_ids, q_mat = collect_vectors(q)
    q_labels = q.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    # pre-filter: candidate must carry some query's label (broadcast
    # semi constraint), then score, then keep only matching pairs
    cands = emb.join(
        F.broadcast(q_labels.select("q_label").distinct()),
        emb.label == F.col("q_label"),
        "left_semi",
    )
    scored = cosine_scores_vs(cands, q_ids, q_mat).filter(
        F.col("cand_id") != F.col("query_id")
    )
    cand_labels = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("c_label")
    )
    matched = (
        scored.join(F.broadcast(q_labels), "query_id")
        .join(cand_labels, "cand_id")
        .filter(F.col("c_label") == F.col("q_label"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cand_id"))
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "cand_id", "score", "rn")
    )


_RRF_K = 60
_KW_TERMS = ("spark", "join", "filter")
_FUSE_DEPTH = 100


@register(
    "hybrid_rrf_search",
    oracle=f"""
    WITH kw AS (
      SELECT doc_id, kw_score, row_number() OVER (
               ORDER BY kw_score DESC, doc_id) AS r
      FROM (
        SELECT doc_id,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                               t -> list_contains({list(_KW_TERMS)!r}, t)))
                 AS kw_score
        FROM documents
      )
      ORDER BY kw_score DESC, doc_id LIMIT {_FUSE_DEPTH}
    ), vs AS (
      SELECT cand_id AS doc_id, score, row_number() OVER (
               ORDER BY score DESC, cand_id) AS r
      FROM (
        SELECT c.vec_id AS cand_id, {_COS_SQL} AS score
        FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        JOIN embeddings c ON c.vec_id <> 0
      )
      ORDER BY score DESC, cand_id LIMIT {_FUSE_DEPTH}
    )
    SELECT doc_id, rrf FROM (
      SELECT coalesce(kw.doc_id, vs.doc_id) AS doc_id,
             round(coalesce(1.0 / ({_RRF_K} + kw.r), 0)
                   + coalesce(1.0 / ({_RRF_K} + vs.r), 0), 6) AS rrf
      FROM kw FULL OUTER JOIN vs ON kw.doc_id = vs.doc_id
    )
    ORDER BY rrf DESC, doc_id LIMIT 20
    """,
    doc="Hybrid search with reciprocal rank fusion: keyword relevance "
    f"(occurrence count of the query terms {_KW_TERMS}) and vector "
    "relevance (cosine vs the vec_id=0 query embedding) are each "
    f"reduced to their top-{_FUSE_DEPTH} via TakeOrderedAndProject "
    "(per-partition heaps — no global sort of the corpus), ranked "
    "within that bounded set, and fused with 1/(60+rank) scores. "
    "Fusing bounded top lists instead of full rankings is both the "
    "standard IR practice and the only shape that scales: the corpus "
    "is touched by two embarrassingly parallel scoring passes, and "
    "everything downstream operates on 2x100 rows.",
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        collect_vectors,
        cosine_scores_vs,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    toks = F.split(F.trim("text"), r"\s+")
    kw_score = F.size(F.filter(toks, lambda t: t.isin(*_KW_TERMS)))
    kw_top = (
        docs.select("doc_id", kw_score.alias("kw_score"))
        .orderBy(F.col("kw_score").desc(), "doc_id")
        .limit(_FUSE_DEPTH)
    )
    # rank within the bounded fused set (100 rows — the single-partition
    # window is over workload-constant data, not the corpus)
    kw = kw_top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("kw_score").desc(), "doc_id"))
    )

    q_ids, q_mat = collect_vectors(emb.filter(F.col("vec_id") == 0))
    vs_top = (
        cosine_scores_vs(emb, q_ids, q_mat)
        .filter(F.col("cand_id") != 0)
        .select(F.col("cand_id").alias("v_doc_id"), "score")
        .orderBy(F.col("score").desc(), "v_doc_id")
        .limit(_FUSE_DEPTH)
    )
    vs = vs_top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("score").desc(), "v_doc_id"))
    )

    fused = kw.select("doc_id", F.col("r").alias("kw_r")).join(
        vs.select(F.col("v_doc_id").alias("doc_id"), F.col("r").alias("vs_r")),
        "doc_id",
        "full_outer",
    )
    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("kw_r")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("vs_r")), F.lit(0.0)),
        6,
    )
    return (
        fused.select("doc_id", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )
