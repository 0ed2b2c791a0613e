"""Graph construction helpers shared by the graph-analytics queries
(triangle counting, link prediction): the co-supply projection and
degree frames.

Scale notes: the bipartite (part → supplier) projection dedups
(part, supplier) BEFORE pairing, so pair enumeration is Σ per-part m²
(bounded by the busiest part), never a global n² — the standard safe
shape for bipartite-to-unipartite projection. The degree frame is
node-sized and broadcast back onto edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.sources import load_table

__all__ = ["cosupply_edges", "degrees"]


def cosupply_edges(
    spark: SparkSession, sf_dir: str, min_qty: float = 49.0
) -> DataFrame:
    """Undirected co-supply edge list (u < v by supplier key):
    suppliers are adjacent iff they both ship the same part in a bulk
    lineitem (``l_quantity >= min_qty``). Columns: ``u``, ``v``."""
    bip = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= F.lit(min_qty))
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = bip.alias("a"), bip.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")),
        )
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Node degree frame for an undirected (u < v) edge list.
    Columns: ``x`` (node), ``d`` (degree)."""
    return (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
