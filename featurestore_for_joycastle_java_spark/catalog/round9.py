"""Round-9 additions: the production-parametrization SemDeDup query
(VERDICT r8 ask #2).

``dedup_semdedup`` (catalog/round7.py) registers the lowid/16-cell
variant because its cell assignment replays exactly in SQL — but
SCALETEST_r08 measured that geometry bending quadratic under growth
(alpha 1.40 at fixed cell count: low-id centroids don't track the data),
while the operator's own prescription — data-adaptive k-means centroids,
k ~ sqrt(n), bounded training sample — measured alpha 0.92. This module
registers that production parametrization under a recall/containment
boolean oracle (the ``sim_ivf_kmeans_recall`` pattern, catalog/round2.py),
so the scale-safe path is a driver-checkable query, not just a knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "dedup_semdedup_kmeans",
    # k-means cells are not SQL-replayable, so the oracle checks the
    # parts that ARE exact: corpus size, the k ~ sqrt(n) cell count, the
    # GLOBAL near-dup drop set (all-pairs rounded cosine — the same
    # engine-stable 6dp predicate as dedup_semdedup's oracle), and two
    # invariants the Spark side must prove: containment (every cell-local
    # drop is a genuine global near-dup — exact by semantics, any
    # clustering) and a recall floor on how much of the global drop set
    # the sqrt(n)-cell clustering catches.
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
g AS (
    SELECT DISTINCT b.vec_id
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ROUND(list_inner_product(a.v, b.v)
          / (SQRT(list_inner_product(a.v, a.v))
             * SQRT(list_inner_product(b.v, b.v))), 6) >= 0.4)
SELECT (SELECT COUNT(*) FROM e) AS n_vectors,
       CAST(GREATEST(4, FLOOR(SQRT((SELECT COUNT(*) FROM e)))) AS INT)
           AS n_cells,
       (SELECT COUNT(*) FROM g) AS n_global_drops,
       TRUE AS drops_contained,
       TRUE AS recall_ok
""",
    bench=False,  # recall-verification harness (kmeans fit + quadratic
    # ground truth); the operational semdedup path is benched as
    # dedup_semdedup and its scaling as SCALETEST's kmeans-sqrt curve
)
def dedup_semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the production parametrization (Abbas et al., 2023,
    arXiv:2303.09540): data-adaptive k-means centroids with k ~ sqrt(n)
    cells and a bounded training sample (``fit_sample = 64k``; below the
    40-points-per-centroid floor at fixture scale, so the fit is the
    seeded full-corpus k-means|| and the query is deterministic — at
    100 TB the same knob caps training at O(sample*k) while assignment
    stays one broadcast scan). This is the geometry SCALETEST_r08
    measured at alpha 0.92 under 2x/4x/8x corpus growth, vs alpha 1.40
    for the registered lowid/fixed-16-cell oracle variant
    (``dedup_semdedup``) — fixed low-id centroids don't track the data,
    so cells unbalance and the Sigma m_i^2 pair stage bends quadratic
    (see ``operators/similarity.py::semdedup_survivors`` for the full
    k-vs-n trade).

    Checked facts: ``n_global_drops`` is value-matched against DuckDB's
    exact all-pairs drop set (quadratic — bench=False verification
    harness, like ``sim_ivf_kmeans_recall``); ``drops_contained`` proves
    every cell-local drop is a genuine global near-dup (exact by
    semantics — a same-cell pair IS a pair); ``recall_ok`` floors the
    caught fraction at 0.25 (measured 0.371 / 0.321 / 0.303 at
    sf0.001/0.01/0.1, stable across local[8]/local[32] — vs ~1/k ~ 0.045
    for random cells, i.e. the clustering does ~7x better than chance on
    these weak-structure fixtures; floor just under the measured band so
    a clustering regression can't hide beneath it)."""
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        cosine_pairs,
        semdedup_survivors,
    )

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    k = max(4, int(n**0.5))
    sd = semdedup_survivors(
        e,
        "vec_id",
        "embedding",
        n_centroids=k,
        threshold=0.4,
        centroids="kmeans",
        seed=42,
        fit_sample=64 * k,
        # n already counted above (it sized k) — reusing it keeps the
        # sample-fraction sizing from paying a second corpus scan
        # (VERDICT r9 ask #4)
        corpus_rows=n,
    )
    gdrops = (
        cosine_pairs(e, "vec_id", "embedding", threshold=0.4)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__g", F.lit(True))
    )
    # one aggregate over (per-vector verdict LEFT JOIN global-drop set):
    # every metric falls out of the same pass
    return (
        sd.join(gdrops, "vec_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(
                F.when(~F.col("survivor") & F.col("__g").isNotNull(), 1)
                .otherwise(0)
            ).alias("__caught"),
            F.sum(
                F.when(~F.col("survivor") & F.col("__g").isNull(), 1)
                .otherwise(0)
            ).alias("__escaped"),
            F.sum(
                F.when(F.col("__g").isNotNull(), 1).otherwise(0)
            ).alias("n_global_drops"),
        )
        .select(
            "n_vectors",
            F.lit(k).cast("int").alias("n_cells"),
            "n_global_drops",
            (F.col("__escaped") == 0).alias("drops_contained"),
            # zero global drops → recall is vacuously satisfied; the
            # bare ratio would be NULL under Spark's non-ANSI division
            # while the oracle emits TRUE unconditionally (ADVICE r9)
            F.when(F.col("n_global_drops") == 0, F.lit(True))
            .otherwise(
                F.col("__caught") / F.col("n_global_drops") >= F.lit(0.25)
            )
            .alias("recall_ok"),
        )
    )
