"""Round-10f additions: three diagnostics closing the layout, embedding
-eval, and profiling families — zonemap overlap depth (the metric that
tells a table it needs re-clustering), exact-integer triplet-margin
accuracy (encoder QA without a single float comparison), and
functional-dependency profiling (TANE-style single-table FD checks).

Same house rules as the other round-10 continuation modules: exact
integer arithmetic end-to-end (the triplet comparison replaces the
float cosine with a sign-cased cross-multiplied squared inequality —
zero transcendentals in this module), identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "layout_overlap_depth",
    oracle="""
WITH f AS (
    SELECT l_orderkey // 400 AS file_id,
           CAST(MIN(l_partkey) AS BIGINT) AS lo,
           CAST(MAX(l_partkey) AS BIGINT) AS hi
    FROM lineitem GROUP BY 1),
ev AS (
    SELECT lo AS pos, 1 AS delta, 0 AS tie FROM f
    UNION ALL
    SELECT hi, -1, 1 FROM f),
sweep AS (
    SELECT pos,
           CAST(SUM(delta) OVER (ORDER BY pos, tie
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS depth
    FROM ev),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_files FROM f)
SELECT n.n_files,
       CAST(MAX(sweep.depth) AS BIGINT) AS max_overlap_depth,
       CAST((MAX(sweep.depth) * 1000000) // n.n_files AS BIGINT)
           AS depth_ratio_ppm
FROM sweep, n
GROUP BY n.n_files
""",
)
def layout_overlap_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonemap overlap depth for a simulated file layout: bucket
    lineitem into 'files' by order-key ranges (the natural ingest
    order), take each file's (min, max) zonemap on l_partkey — a column
    UNCORRELATED with ingest order — and sweep the interval set for the
    maximum number of files whose partkey ranges overlap at one point.
    This is THE metric behind Delta/Iceberg re-clustering decisions
    (OPTIMIZE ZORDER triggers when depth ≈ file count): depth 1 means
    partkey predicates prune to one file, depth ≈ n_files means zonemaps
    prune nothing — which is exactly what this fixture shows, and why
    ``layout_zorder_prune`` exists. Sweep is the classic
    boundary-event trick: +1 at each min, −1 after each max (tie column
    orders closes after opens at equal positions, counting touching
    intervals as overlapping), running max — all exact integers.

    Plan shape: one hash aggregate to n_files rows, one window over
    2·n_files boundary events (file-count-bounded, never row-bounded),
    one 1-row result. At 100 TB, n_files is the table's file count —
    exactly the frame a metadata service holds in memory."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.groupBy(
        F.expr("l_orderkey DIV 400").alias("file_id")
    ).agg(
        F.min("l_partkey").cast("bigint").alias("lo"),
        F.max("l_partkey").cast("bigint").alias("hi"),
    )
    ev = f.select(
        F.col("lo").alias("pos"), F.lit(1).alias("delta"), F.lit(0).alias("tie")
    ).unionByName(
        f.select(
            F.col("hi").alias("pos"),
            F.lit(-1).alias("delta"),
            F.lit(1).alias("tie"),
        )
    )
    w = Window.orderBy("pos", "tie").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = ev.select(F.sum("delta").over(w).cast("bigint").alias("depth"))
    n = f.agg(F.count(F.lit(1)).alias("n_files"))
    return (
        sweep.agg(F.max("depth").alias("max_overlap_depth"))
        .crossJoin(F.broadcast(n))
        .select(
            "n_files",
            "max_overlap_depth",
            F.expr(
                "CAST((max_overlap_depth * 1000000) DIV n_files AS BIGINT)"
            ).alias("depth_ratio_ppm"),
        )
    )


@query(
    "sim_triplet_margin_accuracy",
    oracle="""
WITH x AS (
    SELECT vec_id, label, i,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 10000.0) AS BIGINT)
               AS v4
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
nrm AS (SELECT vec_id, CAST(SUM(v4 * v4) AS HUGEINT) AS n2
        FROM x GROUP BY 1),
nl AS (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
       FROM embeddings),
pos AS (
    SELECT vec_id AS a_id, label,
           LEAD(vec_id) OVER (PARTITION BY label ORDER BY vec_id) AS p_id
    FROM embeddings),
neg AS (
    SELECT p.a_id, p.label, p.p_id,
           (SELECT MIN(e2.vec_id) FROM embeddings e2, nl
            WHERE e2.label = (p.label + 1) % nl.n_labels
              AND e2.vec_id > p.a_id) AS n_id
    FROM pos p WHERE p.p_id IS NOT NULL),
t AS (SELECT a_id, label, p_id, n_id FROM neg WHERE n_id IS NOT NULL),
dap AS (
    SELECT t.a_id, CAST(SUM(xa.v4 * xp.v4) AS HUGEINT) AS dot_ap
    FROM t JOIN x xa ON xa.vec_id = t.a_id
           JOIN x xp ON xp.vec_id = t.p_id AND xp.i = xa.i
    GROUP BY 1),
dan AS (
    SELECT t.a_id, CAST(SUM(xa.v4 * xn.v4) AS HUGEINT) AS dot_an
    FROM t JOIN x xa ON xa.vec_id = t.a_id
           JOIN x xn ON xn.vec_id = t.n_id AND xn.i = xa.i
    GROUP BY 1),
j AS (
    SELECT t.label, dap.dot_ap, dan.dot_an, np.n2 AS np2, nn.n2 AS nn2
    FROM t JOIN dap ON dap.a_id = t.a_id
           JOIN dan ON dan.a_id = t.a_id
           JOIN nrm np ON np.vec_id = t.p_id
           JOIN nrm nn ON nn.vec_id = t.n_id),
v AS (
    SELECT label,
           CASE WHEN dot_ap >= 0 AND dot_an < 0 THEN 1
                WHEN dot_ap < 0 AND dot_an >= 0 THEN 0
                WHEN dot_ap >= 0 AND dot_an >= 0 THEN
                     CASE WHEN dot_ap * dot_ap * nn2
                               > dot_an * dot_an * np2
                          THEN 1 ELSE 0 END
                ELSE CASE WHEN dot_ap * dot_ap * nn2
                               < dot_an * dot_an * np2
                          THEN 1 ELSE 0 END
           END AS ok
    FROM j)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_triplets,
       CAST(SUM(ok) AS BIGINT) AS n_correct,
       CAST((SUM(ok) * 1000000) // COUNT(*) AS BIGINT) AS accuracy_ppm
FROM v GROUP BY 1
""",
)
def sim_triplet_margin_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Triplet accuracy of the embedding space (Schroff et al. 2015,
    FaceNet's offline-eval form): for each anchor, pos = the next
    same-label vector by id, neg = the next vector of the successor
    label — deterministic triplets, no RNG — and the share where
    cos(anchor, pos) > cos(anchor, neg). The comparison is EXACT with
    zero floats: the anchor norm cancels, and the remaining inequality
    dot_ap/√|p| > dot_an/√|n| is sign-cased and cross-multiplied into
    an exact integer comparison dot²·norm² — components are
    floored to 1e4 units so the worst-case dot²·norm² ≈ 2.6e29 stays
    inside DECIMAL(38,0)/HUGEINT for ANY input (1e6 units would
    overflow at |v| = 1), so no sqrt, no tolerance, no engine
    disagreement is even possible. Encoder QA in one query: labels
    whose accuracy_ppm sits near 500000 are not clustered.

    Plan shape: pos pairing is one per-label LEAD window; neg pairing
    is a forward as-of on vec_id into the successor label (oracle: a
    correlated MIN — same semantics); the two dot products are
    dimension-equi-joins producing 64 rows per triplet (linear), with
    norms from one precomputed d-collapse. Everything partial-
    aggregates; triplet count = corpus count minus label boundaries."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.floor(F.col("val").cast("double") * F.lit(10000.0))
        .cast("bigint")
        .alias("v4"),
    )
    x = x.localCheckpoint(eager=True)
    nrm = x.groupBy("vec_id").agg(
        F.sum(F.col("v4") * F.col("v4")).cast("decimal(38,0)").alias("n2")
    )
    nl = e.agg(F.countDistinct("label").alias("n_labels"))
    w_lbl = Window.partitionBy("label").orderBy("vec_id")
    pos = e.select(
        F.col("vec_id").alias("a_id"),
        "label",
        F.lead("vec_id").over(w_lbl).alias("p_id"),
    ).filter(F.col("p_id").isNotNull())
    # forward as-of into the successor label: for each anchor, the
    # smallest vec_id > a_id among label (l+1) % n_labels — the
    # union+window as-of idiom (operators/asof.py), inlined because the
    # "time" axis here is the id
    cand = e.crossJoin(F.broadcast(nl)).select(
        F.col("vec_id").alias("n_id"),
        ((F.col("label") + F.col("n_labels") - 1) % F.col("n_labels")).alias(
            "__from_lbl"
        ),
    )
    probes = pos.select(
        F.col("a_id"), F.col("label").alias("__from_lbl"), F.col("p_id")
    )
    merged = probes.select(
        "__from_lbl",
        F.col("a_id").alias("__t"),
        F.col("a_id"),
        "p_id",
        F.lit(None).cast("long").alias("n_id"),
    ).unionByName(
        cand.select(
            "__from_lbl",
            F.col("n_id").alias("__t"),
            F.lit(None).cast("long").alias("a_id"),
            F.lit(None).cast("long").alias("p_id"),
            "n_id",
        )
    )
    w_asof = (
        Window.partitionBy("__from_lbl")
        .orderBy(F.col("__t").desc(), F.col("n_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = (
        merged.withColumn("__next", F.min("n_id").over(w_asof))
        .filter(F.col("a_id").isNotNull() & F.col("__next").isNotNull())
        .select("a_id", F.col("__from_lbl").alias("label"), "p_id",
                F.col("__next").alias("n_id"))
    )
    t = t.localCheckpoint(eager=True)
    xa = x.select(F.col("vec_id").alias("__aid"), "i", F.col("v4").alias("va"))
    xp = x.select(F.col("vec_id").alias("__pid"),
                  F.col("i").alias("__ip"), F.col("v4").alias("vp"))
    xn = x.select(F.col("vec_id").alias("__nid"),
                  F.col("i").alias("__in"), F.col("v4").alias("vn"))
    dap = (
        t.join(xa, t.a_id == xa.__aid)
        .join(xp, (t.p_id == xp.__pid) & (F.col("i") == F.col("__ip")))
        .groupBy("a_id")
        .agg(F.sum(F.col("va") * F.col("vp")).cast("decimal(38,0)").alias("dot_ap"))
    )
    dan = (
        t.join(xa, t.a_id == xa.__aid)
        .join(xn, (t.n_id == xn.__nid) & (F.col("i") == F.col("__in")))
        .groupBy(F.col("a_id").alias("__a2"))
        .agg(F.sum(F.col("va") * F.col("vn")).cast("decimal(38,0)").alias("dot_an"))
    )
    np2 = nrm.select(F.col("vec_id").alias("__np_id"), F.col("n2").alias("np2"))
    nn2 = nrm.select(F.col("vec_id").alias("__nn_id"), F.col("n2").alias("nn2"))
    j = (
        t.join(dap, "a_id")
        .join(dan, t.a_id == F.col("__a2"))
        .join(np2, t.p_id == F.col("__np_id"))
        .join(nn2, t.n_id == F.col("__nn_id"))
    )
    v = j.select(
        "label",
        F.expr(
            "CASE WHEN dot_ap >= 0 AND dot_an < 0 THEN 1"
            " WHEN dot_ap < 0 AND dot_an >= 0 THEN 0"
            " WHEN dot_ap >= 0 AND dot_an >= 0 THEN"
            "   CASE WHEN dot_ap * dot_ap * nn2 > dot_an * dot_an * np2"
            "        THEN 1 ELSE 0 END"
            " ELSE CASE WHEN dot_ap * dot_ap * nn2 < dot_an * dot_an * np2"
            "      THEN 1 ELSE 0 END END"
        ).alias("ok"),
    )
    return v.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triplets"),
        F.sum("ok").cast("bigint").alias("n_correct"),
        F.expr("CAST((SUM(ok) * 1000000) DIV COUNT(*) AS BIGINT)").alias(
            "accuracy_ppm"
        ),
    )


@query(
    "quality_functional_dependency",
    oracle="""
WITH pairs AS (
    SELECT 'l_orderkey->l_suppkey' AS fd,
           CAST(l_orderkey AS VARCHAR) AS lhs,
           CAST(l_suppkey AS VARCHAR) AS rhs
    FROM lineitem
    UNION ALL
    SELECT 'l_partkey->l_suppkey',
           CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey->l_returnflag',
           CAST(l_orderkey AS VARCHAR), l_returnflag
    FROM lineitem),
g AS (
    SELECT fd, lhs, rhs, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY 1, 2, 3),
grp AS (
    SELECT fd, lhs,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(n) AS BIGINT) AS n_major,
           CAST(COUNT(*) AS BIGINT) AS n_rhs
    FROM g GROUP BY 1, 2)
SELECT fd,
       CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
       CAST(COUNT(*) FILTER (WHERE n_rhs > 1) AS BIGINT)
           AS n_violating_groups,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(n_rows - n_major) AS BIGINT) AS n_violating_rows,
       CAST((SUM(n_major) * 1000000) // SUM(n_rows) AS BIGINT)
           AS confidence_ppm
FROM grp GROUP BY 1
""",
)
def quality_functional_dependency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate-functional-dependency profiling (TANE, Huhtanen et
    al. 1999; g3 error of Kivinen & Mannila 1995) for three candidate
    FDs on lineitem: per candidate, the number of violating LHS groups,
    the g3 violation count (rows that must be removed to make the FD
    hold = group size minus its majority RHS), and the confidence
    (1 − g3/n) in exact ppm. The fixture makes all three outcomes
    appear: order→returnflag holds strongly (few lines per order),
    order→suppkey is moderate, part→suppkey is weak — FD profiling is
    how a pipeline discovers which 'keys' are actually keys before
    trusting joins or dedup rules on them.

    Plan shape: one union-of-projections pass (column-pruned scans),
    one (fd, lhs, rhs) hash aggregate, one (fd, lhs) re-aggregate of
    the GROUPS (never the rows), one per-fd rollup — the
    ``eval_mutual_information`` collapse discipline applied to FD
    counting."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.select(
            F.lit("l_orderkey->l_suppkey").alias("fd"),
            F.col("l_orderkey").cast("string").alias("lhs"),
            F.col("l_suppkey").cast("string").alias("rhs"),
        )
        .unionByName(
            li.select(
                F.lit("l_partkey->l_suppkey").alias("fd"),
                F.col("l_partkey").cast("string").alias("lhs"),
                F.col("l_suppkey").cast("string").alias("rhs"),
            )
        )
        .unionByName(
            li.select(
                F.lit("l_orderkey->l_returnflag").alias("fd"),
                F.col("l_orderkey").cast("string").alias("lhs"),
                F.col("l_returnflag").alias("rhs"),
            )
        )
    )
    g = pairs.groupBy("fd", "lhs", "rhs").agg(F.count(F.lit(1)).alias("n"))
    grp = g.groupBy("fd", "lhs").agg(
        F.sum("n").alias("n_rows_g"),
        F.max("n").alias("n_major"),
        F.count(F.lit(1)).alias("n_rhs"),
    )
    return grp.groupBy("fd").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lhs_groups"),
        F.count(F.when(F.col("n_rhs") > 1, 1))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum("n_rows_g").cast("bigint").alias("n_rows"),
        F.sum(F.col("n_rows_g") - F.col("n_major"))
        .cast("bigint")
        .alias("n_violating_rows"),
        F.expr(
            "CAST((SUM(n_major) * 1000000) DIV SUM(n_rows_g) AS BIGINT)"
        ).alias("confidence_ppm"),
    )
