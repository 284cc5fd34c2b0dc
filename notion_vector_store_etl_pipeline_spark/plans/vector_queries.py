"""Vector similarity queries (SURVEY.md §2.11 north star): brute-force
cosine top-k, threshold self-join, and an IVF-bucketed ANN variant (the
100 TB scale path: candidate generation via centroid buckets instead of
the full cross product).

Determinism: all math in double, sequential accumulation, `round(_, 6)`
in both engines, ties broken by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_vector_store_etl_pipeline_spark.functions import vectors as V
from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table

_COS_SQL = (
    "round(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6)"
)


@register(
    "knn_topk",
    oracle=f"""
    SELECT query_id, cand_id, score, rn FROM (
      SELECT query_id, cand_id, score,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id)
                  AS INTEGER) AS rn
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_SQL} AS score
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
      )
    ) WHERE rn <= 10
    """,
    doc="Brute-force cosine top-k per query vector (broadcast query side; "
    "per-partition partial top-k via ranking window).",
)
def knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        collect_vectors,
        cosine_scores_vs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q_ids, q_mat = collect_vectors(emb.filter(F.col("vec_id") < 5))
    scored = cosine_scores_vs(emb, q_ids, q_mat).filter(
        F.col("cand_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cand_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)


@register(
    "similarity_selfjoin",
    oracle=f"""
    SELECT a_id, b_id, score FROM (
      SELECT q.vec_id AS a_id, c.vec_id AS b_id, {_COS_SQL} AS score
      FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
    ) WHERE score >= 0.35
    """,
    doc="All-pairs cosine threshold self-join (near-dup by embedding). "
    "Quadratic by construction — the IVF/LSH variants are the scale path.",
)
def similarity_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        cosine_selfjoin_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_selfjoin_pairs(emb, threshold=0.35)


@register(
    "knn_ivf_approx",
    oracle=None,  # approximate by design; driver records rows-only
    doc="IVF-style ANN: deterministic centroid set (vec_id % 97 == 0), "
    "assign vectors to nearest centroid, probe the query's 4 nearest "
    "lists, exact rerank inside. Candidate set is bucket-local — at "
    "100 TB the inverted lists are the partition key.",
)
def knn_ivf_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", V.as_double("embedding").alias("emb"))
    cents = vecs.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("cent_emb")
    )

    def nearest(df: DataFrame, id_col: str, emb_col: str, topn: int, out: str) -> DataFrame:
        scored = df.join(F.broadcast(cents)).select(
            id_col,
            emb_col,
            "cent_id",
            F.round(V.cosine(F.col(emb_col), F.col("cent_emb")), 6).alias("cscore"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("cscore").desc(), F.col("cent_id").asc())
        return (
            scored.withColumn("crn", F.row_number().over(w))
            .filter(F.col("crn") <= topn)
            .select(id_col, emb_col, F.col("cent_id").alias(out))
        )

    assigned = nearest(vecs, "vec_id", "emb", 1, "list_id")
    queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    probes = nearest(queries, "query_id", "q_emb", 4, "list_id")
    cands = probes.join(assigned, "list_id").filter(F.col("vec_id") != F.col("query_id"))
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.round(V.cosine(F.col("q_emb"), F.col("emb")), 6).alias("score"),
    ).dropDuplicates(["query_id", "cand_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cand_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)


@register(
    "embedding_norms",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
    FROM embeddings
    """,
    doc="Per-vector L2 norm via array HOFs — narrow, zero-shuffle scoring.",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", F.round(V.norm(V.as_double("embedding")), 6).alias("l2_norm")
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         m AS (SELECT vec_id, label, e,
                      greatest(list_aggregate(list_transform(e, x -> abs(x)), 'max'), 1e-12) AS ma
               FROM b)
    SELECT vec_id, label,
           round(127.0 / ma, 6) AS scale,
           list_transform(e, x -> CAST(round(x * (127.0 / ma)) AS INTEGER)) AS q
    FROM m
    """,
    doc="Symmetric int8 quantization per vector (scale = 127/max|x|): the "
    "4x memory compression an ANN index applies before bucketing at scale. "
    "Pure array HOFs — narrow, zero-shuffle, stays in codegen; the max "
    "element maps to exactly +/-127 so the round boundary is never hit there.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = V.as_double("embedding")
    maxabs = F.greatest(
        F.array_max(F.transform(e, lambda x: F.abs(x))), F.lit(1e-12)
    )
    scale = F.lit(127.0) / maxabs
    return emb.select(
        "vec_id",
        "label",
        F.round(scale, 6).alias("scale"),
        F.transform(e, lambda x: F.round(x * scale).cast("int")).alias("q"),
    )


@register(
    "knn_ivf_quantized",
    oracle=None,  # approximate two-stage retrieval; recall tested in pytest
    doc="Two-stage ANN, the full 100 TB retrieval shape: IVF probe "
    "(nearest 4 inverted lists) -> int8-quantized cosine over the "
    "candidates (4x smaller vectors, integer dot products — the cheap "
    "first pass) -> exact double-precision rerank of the quantized "
    "top-30 -> top-10. Candidate generation, coarse scoring, and "
    "rerank are all candidate-local; the full-precision vectors are "
    "only touched for 30 rows per query.",
)
def knn_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = V.as_double("embedding")
    maxabs = F.greatest(F.array_max(F.transform(e, lambda x: F.abs(x))), F.lit(1e-12))
    quant = F.transform(e, lambda x: F.round(x * (F.lit(127.0) / maxabs)).cast("long"))
    qnorm = F.sqrt(
        F.aggregate(
            F.zip_with(quant, quant, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    # quantized norm computed ONCE per vector in the narrow projection —
    # after the candidate join it would be recomputed per (query, cand) pair
    vecs = emb.select("vec_id", e.alias("emb"), quant.alias("q"), qnorm.alias("qn"))
    cents = vecs.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("cent_emb")
    )

    def nearest(df: DataFrame, id_col: str, emb_col: str, topn: int, out: str, keep) -> DataFrame:
        scored = df.join(F.broadcast(cents)).select(
            *keep,
            id_col,
            "cent_id",
            F.round(V.cosine(F.col(emb_col), F.col("cent_emb")), 6).alias("cscore"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("cscore").desc(), F.col("cent_id").asc())
        return (
            scored.withColumn("crn", F.row_number().over(w))
            .filter(F.col("crn") <= topn)
            .select(*keep, id_col, F.col("cent_id").alias(out))
        )

    assigned = nearest(vecs, "vec_id", "emb", 1, "list_id", keep=["emb", "q", "qn"])
    queries = vecs.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("q").alias("q_quant"),
        F.col("qn").alias("q_qn"),
    ).filter(F.col("query_id") < 5)
    probes = nearest(queries, "query_id", "q_emb", 4, "list_id", keep=["q_emb", "q_quant", "q_qn"])

    cands = (
        probes.join(assigned, "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    # stage 1: integer dot product over int8 codes (the cheap pass);
    # norms were precomputed per vector, so the per-pair work is ONE
    # integer zip_with + a divide
    qdot = F.aggregate(
        F.zip_with("q_quant", "q", lambda x, y: x * y), F.lit(0).cast("long"), lambda a, x: a + x
    )
    coarse = cands.withColumn(
        "qscore", qdot.cast("double") / F.nullif(F.col("q_qn") * F.col("qn"), F.lit(0.0))
    )
    w1 = Window.partitionBy("query_id").orderBy(F.col("qscore").desc(), F.col("vec_id").asc())
    shortlist = coarse.withColumn("qrn", F.row_number().over(w1)).filter(F.col("qrn") <= 30)

    # stage 2: exact rerank of the shortlist only
    reranked = shortlist.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.round(V.cosine(F.col("q_emb"), F.col("emb")), 6).alias("score"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cand_id").asc())
    return reranked.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= 10)


@register(
    "neardup_components",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT q.vec_id AS a_id, c.vec_id AS b_id
      FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
      WHERE {_COS_SQL} >= 0.35
    ),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id, a_id FROM pairs
    ),
    walk(node, lab) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS vec_id, CAST(min(lab) AS BIGINT) AS component_id FROM walk GROUP BY node
    """,
    doc="Near-dup CLUSTERS: connected components over the cosine-threshold "
    "pair graph via iterative min-label propagation (keep-one-per-component "
    "is then a trivial filter component_id == vec_id). The oracle replays "
    "reachability as a recursive CTE. This is the piece that turns pairwise "
    "dedup into transitive-closure dedup — A~B and B~C collapse to one "
    "cluster even when A!~C.",
)
def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.similarity import (
        cosine_selfjoin_pairs,
    )
    from notion_vector_store_etl_pipeline_spark.operators.traversal import (
        connected_components,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_selfjoin_pairs(emb, threshold=0.35).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    return connected_components(pairs, nodes).select(
        F.col("node").alias("vec_id"), "component_id"
    )


@register(
    "neardup_cluster_survivors",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT q.vec_id AS a_id, c.vec_id AS b_id
      FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
      WHERE {_COS_SQL} >= 0.35
    ),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id, a_id FROM pairs
    ),
    walk(node, lab) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node
    ),
    comp AS (
      SELECT node AS vec_id, min(lab) AS component_id FROM walk GROUP BY node
    )
    SELECT component_id AS survivor_id,
           count(*) AS cluster_size,
           CAST(count(*) - 1 AS BIGINT) AS n_removed
    FROM comp GROUP BY component_id
    """,
    doc="The dedup DECISION from the clusters: one survivor per "
    "connected component (lowest id), with cluster size and removed "
    "count — the final output a 100 TB dedup job writes (survivor "
    "keep-list + removal ledger).",
)
def neardup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = neardup_components(spark, sf_dir)
    return comp.groupBy(F.col("component_id").alias("survivor_id")).agg(
        F.count(F.lit(1)).alias("cluster_size"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_removed"),
    )
