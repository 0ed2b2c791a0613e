"""Round-11 addition: the constant-cell-size SemDeDup query (VERDICT
r10 ask #3 — the sole registry-freeze exception).

``dedup_semdedup_kmeans`` (catalog/round9.py) registers the k ~ sqrt(n)
parametrization — the fixed-hardware optimum — but SCALETEST_r10's 16x
octave measured that geometry bending to 2^1.57/octave once the
Sigma m^2 pair term dominates. The documented remedy is holding the
target cell SIZE constant (k = n/m-bar), which keeps the pair stage
linear (Sigma m^2 ~ n*m-bar for balanced cells) and moves the growth
into the zero-shuffle n*k assignment fold. This module registers that
parametrization as a driver-checkable query under the same
recall/containment boolean oracle as round9's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table

#: target cell size m-bar — small enough that the fixtures produce a
#: multi-cell clustering at every SF (500 vectors -> 16 cells, 2000 ->
#: 63), large enough that cells hold genuine neighborhoods. At 100 TB
#: the same knob is set to ~10^5 (block-sized cells).
_CELL_SIZE = 32


@query(
    "dedup_semdedup_cellsize",
    # k-means cells are not SQL-replayable, so the oracle checks the
    # parts that ARE exact (the round9 pattern): corpus size, the
    # k = ceil(n / m-bar) cell count, the GLOBAL near-dup drop set
    # (all-pairs rounded cosine, engine-stable 6dp predicate), and two
    # invariants the Spark side must prove: containment (every
    # cell-local drop is a genuine global near-dup — exact by
    # semantics, any clustering) and a recall floor on how much of the
    # global drop set the constant-cell-size clustering catches.
    # _CELL_SIZE is interpolated so the Python k-derivation and the
    # oracle's can never drift apart if the knob moves
    oracle=f"""
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
       CAST(GREATEST(4, ((SELECT COUNT(*) FROM e) + {_CELL_SIZE - 1})
            // {_CELL_SIZE}) AS INT) AS n_cells,
       (SELECT COUNT(*) FROM g) AS n_global_drops,
       TRUE AS drops_contained,
       TRUE AS recall_ok
""",
    bench=False,  # recall-verification harness (kmeans fit + quadratic
    # ground truth); the operational scaling evidence is SCALETEST's
    # semdedup_kmeans_cellsize curve (tools/scale_curve.py)
)
def dedup_semdedup_cellsize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at constant cell size (Abbas et al., 2023,
    arXiv:2303.09540; the linear-pair-stage parametrization): k-means
    centroids with k = max(4, ceil(n / 32)) cells — cell POPULATION
    held at ~32 as the corpus grows, so the per-cell quadratic compare
    costs Sigma m_i^2 ~ n*32, linear in n. This is the documented
    remedy for SCALETEST_r10's measured 16x bend of the k ~ sqrt(n)
    geometry (2^1.57/octave once Sigma m^2 dominates); the growth
    moves into the n*k broadcast assignment fold, which shuffles
    nothing (see ``operators/similarity.py::semdedup_survivors``).

    Checked facts (the ``dedup_semdedup_kmeans`` harness, same fixture):
    ``n_global_drops`` value-matched against DuckDB's exact all-pairs
    drop set; ``drops_contained`` proves every cell-local drop is a
    genuine global near-dup; ``recall_ok`` floors the caught fraction
    at 0.20 (measured 0.371/0.453/0.286 at sf0.001/0.01/0.1, vs
    ~m-bar/n ~ 0.03 for random cells at sf0.1 — the 0.286 low point is
    sf0.1's k=63, where cells are finer than the sqrt variant's 44 so
    recall sits just under its 0.303; floor set under the measured
    band so a clustering regression can't hide beneath it)."""
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        cosine_pairs,
        semdedup_survivors,
    )

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    k = max(4, -(-n // _CELL_SIZE))
    sd = semdedup_survivors(
        e,
        "vec_id",
        "embedding",
        threshold=0.4,
        centroids="kmeans",
        seed=42,
        # NO fit_sample: oracle-checked queries keep the full-corpus fit
        # (the module's exact-replayability rule — ADVICE r11: a sampled
        # fit is partitioning-dependent, so a file-split change could
        # move the clustering and flip recall_ok non-deterministically;
        # at fixture scale the 40·k sample floor exceeded n anyway, so
        # this drops a latent hazard, not a measured behavior).
        # n already counted above — target_cell_size re-derives k from
        # corpus_rows without a second scan (VERDICT r9 ask #4)
        corpus_rows=n,
        target_cell_size=_CELL_SIZE,
    )
    gdrops = (
        cosine_pairs(e, "vec_id", "embedding", threshold=0.4)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__g", F.lit(True))
    )
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
            # zero global drops -> recall vacuously satisfied (the
            # oracle emits TRUE unconditionally; ADVICE r9 pattern)
            F.when(F.col("n_global_drops") == 0, F.lit(True))
            .otherwise(
                F.col("__caught") / F.col("n_global_drops") >= F.lit(0.20)
            )
            .alias("recall_ok"),
        )
    )
