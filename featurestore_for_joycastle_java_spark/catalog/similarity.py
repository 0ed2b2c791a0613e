"""Similarity-search queries over the embeddings table (north-star §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators import similarity as S
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "sim_cosine_topk",
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
scored AS (
    SELECT q.query_id, e.vec_id,
           ROUND(list_inner_product(qv, v)
                 / (SQRT(list_inner_product(qv, qv))
                    * SQRT(list_inner_product(v, v))), 6) AS cos_sim
    FROM q CROSS JOIN e)
SELECT query_id, vec_id, cos_sim, rnk
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rnk
      FROM scored)
WHERE rnk <= 5
""",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a 10-query batch: broadcast queries ×
    corpus scan, HOF cosine (no UDF), per-query window top-k. Linear in
    the corpus; deterministic ranking via (rounded cosine, vec_id)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.brute_force_topk(e, queries, k=5)


# sim_lsh_topk (rows-only, r1-r3) was replaced in r4 by the boolean-
# oracled sim_lsh_recall in catalog/round4.py; the raw BRP top-k surface
# remains operators.similarity.lsh_topk (recall-asserted in tests).


@query(
    "sim_embedding_stats",
    oracle="""
WITH e AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings)
SELECT label,
       COUNT(*) AS n_vecs,
       ROUND(AVG(SQRT(list_inner_product(v, v))), 6) AS avg_norm,
       ROUND(MIN(SQRT(list_inner_product(v, v))), 6) AS min_norm,
       ROUND(MAX(SQRT(list_inner_product(v, v))), 6) AS max_norm
FROM e
GROUP BY label
""",
)
def sim_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding norm statistics — vector math as HOFs, then a
    plain agg. AVG of per-row doubles: both engines sum 50-200 identical
    doubles; 6dp rounding absorbs the summation-order ulps."""
    e = load_table(spark, sf_dir, "embeddings")
    norm = S.l2_norm(S.as_double(F.col("embedding")))
    return (
        e.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )
