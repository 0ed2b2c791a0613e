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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from featurestore_for_joycastle_java_spark.sources import load_table

__all__ = ["cosupply_edges", "degrees", "triangle_counts", "kcore_edges"]


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


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts for an undirected (u < v, deduped) edge
    list. Columns: ``x`` (node), ``n_triangles`` (bigint). Nodes in no
    triangle are absent from the output.

    Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    "Counting triangles and the curse of the last reducer", WWW 2011).
    Each undirected edge is directed from its (degree, key)-smaller
    endpoint to the larger; wedges are enumerated at the SMALLEST
    endpoint of each triangle and closed against the directed edge
    list, so every triangle is emitted exactly once and the wedge join
    fans out by OUT-degree, which the orientation bounds by O(√|E|)
    even on power-law graphs — the "last reducer" (max-degree hub)
    never enumerates its quadratic neighborhood. Degrees are computed
    in the same pass that orients the edges (see the plan note).

    Plan note (VERDICT r8 ask #5; measured at sf0.1 on the co-supply
    graph): every frame here is built to be referenced ONCE per
    consumer, because Spark's printed plan re-derives a DataFrame's
    subtree per reference and the old degree-join/unionAll shape
    nested references three deep (nodes -> 3x tri -> 3x ordered ->
    3x edges = up to 27 copies of the edge subtree, 229 Exchange nodes
    in the static text — runtime was fine via ReuseExchange, but a
    229-node plan is compile-time cost and an AQE-miss hazard at
    100 TB). Degrees are attached in one pass (explode each edge into
    its endpoint rows, window-count per endpoint, regroup to the edge
    grain) instead of two degree-frame joins, and triangle corners are
    exploded instead of unionAll'd, so the static plan keeps ~3
    references of the oriented-edge subtree total (23 exchanges,
    9x smaller; runtime 0.87-1.18 s vs 1.2-1.7 s before — fewer
    runtime-deduped shuffles to schedule). `.cache()` stays rejected: its materialization barrier
    measured 4.0 s vs 2.1 s (the reuse it buys, ReuseExchange already
    provides), and localCheckpoint would make construction eager and
    drop the query out of the plan audit entirely."""
    w2 = Window.partitionBy("x")
    ordered = (
        edges.select(
            F.explode(
                F.array(F.lit(True), F.lit(False)).alias("__sides")
            ).alias("at_u"),
            "u",
            "v",
        )
        .withColumn(
            "x", F.when(F.col("at_u"), F.col("u")).otherwise(F.col("v"))
        )
        .withColumn("d", F.count(F.lit(1)).over(w2))
        .groupBy("u", "v")
        .agg(
            F.max(F.when(F.col("at_u"), F.col("d"))).alias("du"),
            F.max(F.when(~F.col("at_u"), F.col("d"))).alias("dv"),
        )
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
            )
            .otherwise(
                F.struct(F.col("v").alias("src"), F.col("u").alias("dst"))
            )
            .alias("de")
        )
        .select("de.src", "de.dst")
    )
    e1, e2 = ordered.alias("e1"), ordered.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (F.col("e1.dst") != F.col("e2.dst")),
    ).select(
        F.col("e1.src").alias("a"),
        F.col("e1.dst").alias("b"),
        F.col("e2.dst").alias("c"),
    )
    e3 = ordered.alias("e3")
    tri = wedges.join(
        e3,
        (F.col("b") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst")),
    ).select("a", "b", "c")
    # one reference of tri: explode the three corners instead of a
    # 3-way unionAll (which would re-derive the whole triangle subtree
    # per branch in the static plan)
    nodes = tri.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("x")
    )
    return nodes.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def kcore_edges(
    edges: DataFrame, k: int, max_rounds: int | None = None
) -> DataFrame:
    """Surviving edge list of the k-core peel: the maximal subgraph in
    which every node retains degree ≥ k (Seidman 1983). Input/output
    columns: ``u``, ``v`` (undirected, u < v, deduped). An empty result
    (graph fully peeled) is a valid converged state.

    Algorithm: iterative peeling with the CC loop discipline — each
    round computes degrees over surviving edges, drops nodes below k,
    and restricts edges with two BROADCAST semi-joins (the alive set
    is node-sized); the surviving edge frame is re-materialized per
    round via ``localCheckpoint`` (lineage would otherwise grow by two
    joins per round) and the per-round kill COUNT is the only value
    that ever reaches the driver. O(peel-depth) rounds, each one
    degree-aggregate + edge filter over O(|E|) — at 100 TB the same
    shape as the CC loop, with reliable checkpoints available through
    the same knob documented there.

    ``max_rounds``: optional loud-failure bound (the CC-loop
    discipline): callers whose ORACLE unrolls the peel to a fixed
    stage count pass that count, so a fixture deep enough to out-peel
    the oracle raises here instead of silently diverging from it."""
    e = edges.localCheckpoint(eager=True)
    rounds = 0
    while True:
        # r13 (guide §2.4): one degree computation per round, not three.
        # The kill-count action materializes the lazily-checkpointed
        # degree frame; the two alive-side broadcast builds then scan the
        # persisted (node-sized) RDD instead of each re-running the
        # degree aggregate. The old tail's extra e.isEmpty() action is
        # gone too — a fully-peeled frame terminates through the next
        # round's n_kill == 0 over empty degrees, identical result.
        deg = degrees(e).localCheckpoint(eager=False)
        alive = deg.filter(F.col("d") >= k).select("x")
        n_kill = deg.filter(F.col("d") < k).count()
        if n_kill == 0:
            break
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            raise RuntimeError(
                f"k-core peel still shrinking after {max_rounds} rounds; "
                "raise the bound (and the oracle's unrolled stage count)"
            )
        e = (
            e.join(
                F.broadcast(alive.withColumnRenamed("x", "u")), "u", "semi"
            )
            .join(
                F.broadcast(alive.withColumnRenamed("x", "v")), "v", "semi"
            )
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return e
