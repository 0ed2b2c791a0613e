"""Round-5 fifth-continuation additions (registered below the driver
window, after ``round5f``) — driver rows due in the r6 rotation; until
then covered by tests/test_oracle_parity.py and the SIM sweeps.

Gap analysis behind the picks (SURVEY §2 delta after round5f):

- ``feature_target_encoding_oof``: out-of-fold target encoding — the
  fold-level form of leakage-safe encoding (LOO is the per-row
  extreme, already implemented); composes the round5f GROUP k-fold
  with the encoding arithmetic every tabular pipeline ships.
- ``layout_zonemap_stats``: file-level min/max zone maps evaluated
  against a predicate under TWO layouts (natural arrival order vs
  clustered-by-column) — quantifying that zone maps only skip when
  the layout clusters the column (the WHY behind the Z-order and
  compaction ops).
- ``graph_kcore``: iterative k-core peeling (k = 18) with the CC
  loop discipline (localCheckpoint per round, count as the only
  driver value) — the cohesive-subgraph primitive; oracle is the
  peeling UNROLLED to a fixed stage depth (peeling is monotone, so
  surplus stages are no-ops once converged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.graphs import (
    cosupply_edges,
    degrees,
    kcore_edges,
)
from featurestore_for_joycastle_java_spark.operators.ranks import (
    global_row_number,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


# -------------------------------------------------------------- features


@query(
    "feature_target_encoding_oof",
    # OOF mean for (category, fold) = (S_cat − S_cat,fold) DIV
    # (n_cat − n_cat,fold) on exact micro integers; a category living
    # entirely inside one fold has no out-of-fold rows → NULL (CASE'd
    # identically on both engines).
    oracle="""
WITH f AS (
    SELECT user_id,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 5 AS fold
    FROM (SELECT DISTINCT user_id FROM events)),
e AS (
    SELECT ev.event_type, f.fold,
           CAST(FLOOR(ev.value * 1000000.0) AS BIGINT) AS vm
    FROM events ev JOIN f USING (user_id)),
per AS (
    SELECT event_type, fold,
           CAST(COUNT(*) AS BIGINT) AS n_in,
           CAST(SUM(vm) AS BIGINT) AS s_in
    FROM e GROUP BY 1, 2),
tot AS (
    SELECT event_type,
           CAST(SUM(n_in) AS BIGINT) AS n_tot,
           CAST(SUM(s_in) AS BIGINT) AS s_tot
    FROM per GROUP BY 1)
SELECT p.event_type, p.fold, p.n_in,
       t.n_tot - p.n_in AS n_out,
       t.s_tot - p.s_in AS oof_sum_micro,
       CAST(CASE WHEN t.n_tot = p.n_in THEN NULL
            ELSE (t.s_tot - p.s_in) // (t.n_tot - p.n_in) END AS BIGINT)
           AS oof_mean_micro
FROM per p JOIN tot t USING (event_type)
""",
)
def feature_target_encoding_oof(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Out-of-fold target encoding: for each (category, fold), the mean
    target over every OTHER fold's rows — the encoding a row in fold f
    is allowed to see without leaking its own fold's labels (fold-level
    analogue of the existing leave-one-out encoding; OOF is what
    scales, LOO is the per-row extreme). Folds are the round5f GROUP
    folds (md5(user) mod 5), so the no-user-straddles-folds guarantee
    carries over to the encoding.

    Scale shape: one map-side-combined pass to the (category × fold)
    frame (|C|·5 rows); totals are an aggregate OF that frame, joined
    back broadcast. The complement trick (S_tot − S_fold) avoids a
    fold × fold self-join entirely. Exact micro integers; one floor
    division at the end."""
    users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % 5
            ).alias("fold"),
        )
    )
    e = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("vm"),
        )
        .join(F.broadcast(users), "user_id")
    )
    per = e.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in"),
        F.sum("vm").cast("bigint").alias("s_in"),
    )
    tot = per.groupBy("event_type").agg(
        F.sum("n_in").cast("bigint").alias("n_tot"),
        F.sum("s_in").cast("bigint").alias("s_tot"),
    )
    return per.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "fold",
        "n_in",
        (F.col("n_tot") - F.col("n_in")).alias("n_out"),
        (F.col("s_tot") - F.col("s_in")).alias("oof_sum_micro"),
        F.when(F.col("n_tot") == F.col("n_in"), F.lit(None))
        .otherwise(
            F.expr("(s_tot - s_in) DIV (n_tot - n_in)")
        )
        .cast("bigint")
        .alias("oof_mean_micro"),
    )


# ---------------------------------------------------------------- layout


@query(
    "layout_zonemap_stats",
    # Two layouts of the same 50-doc files: natural (doc_id order) and
    # clustered (row_number by (n_chars, doc_id)). Zone map = per-file
    # MIN/MAX(n_chars); classes for predicate n_chars >= 450:
    # skip (hi < T), full (lo >= T), partial otherwise.
    oracle="""
WITH nat AS (
    SELECT doc_id // 50 AS fileno, n_chars FROM documents),
clu AS (
    SELECT (ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1) // 50
               AS fileno,
           n_chars
    FROM documents),
z AS (
    SELECT 'natural' AS layout, fileno,
           MIN(n_chars) AS lo, MAX(n_chars) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_chars >= 450 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_match
    FROM nat GROUP BY 2
    UNION ALL
    SELECT 'clustered', fileno, MIN(n_chars), MAX(n_chars),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n_chars >= 450 THEN 1 ELSE 0 END) AS BIGINT)
    FROM clu GROUP BY 2)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN hi < 450 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_skip,
       CAST(SUM(CASE WHEN lo >= 450 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_full,
       CAST(SUM(CASE WHEN hi >= 450 AND lo < 450 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_partial,
       CAST(SUM(CASE WHEN hi >= 450 THEN n_docs ELSE 0 END) AS BIGINT)
           AS n_docs_scanned,
       CAST(SUM(n_match) AS BIGINT) AS n_matching
FROM z GROUP BY 1
""",
)
def layout_zonemap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level min/max zone maps evaluated for `n_chars >= 450`
    under two layouts of the same 50-doc files: NATURAL (arrival
    order) and CLUSTERED (sorted by the predicate column). The output
    quantifies the whole point of clustering: under the natural layout
    every file straddles the range (zero skips — zone maps are
    useless), clustered nearly every non-matching file is skipped and
    `n_docs_scanned` collapses toward `n_matching`. This is the WHY
    artifact behind the Z-order layout and compaction ops: min/max
    pruning is a property of LAYOUT, not of the statistics.

    Scale shape: zone-map construction is one map-side-combined
    groupBy per layout to an O(files) frame; the clustered file
    assignment uses the two-pass bucketed `global_row_number` (no
    single-partition fact window); the summary is a metadata-frame
    aggregate. Identical `n_matching` across layouts doubles as an
    internal consistency check (tested)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    t = F.lit(450)
    nat = docs.select(
        F.expr("doc_id DIV 50").alias("fileno"), "n_chars"
    ).withColumn("layout", F.lit("natural"))
    ranked = global_row_number(docs, "n_chars", ["doc_id"], out_col="rn")
    clu = ranked.select(
        F.expr("CAST((rn - 1) DIV 50 AS BIGINT)").alias("fileno"), "n_chars"
    ).withColumn("layout", F.lit("clustered"))
    z = (
        nat.unionByName(clu)
        .groupBy("layout", "fileno")
        .agg(
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_chars") >= t, 1).otherwise(0))
            .cast("bigint")
            .alias("n_match"),
        )
    )
    return z.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(F.when(F.col("hi") < t, 1).otherwise(0))
        .cast("bigint")
        .alias("n_skip"),
        F.sum(F.when(F.col("lo") >= t, 1).otherwise(0))
        .cast("bigint")
        .alias("n_full"),
        F.sum(F.when((F.col("hi") >= t) & (F.col("lo") < t), 1).otherwise(0))
        .cast("bigint")
        .alias("n_partial"),
        F.sum(F.when(F.col("hi") >= t, F.col("n_docs")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_scanned"),
        F.sum("n_match").cast("bigint").alias("n_matching"),
    )


# ----------------------------------------------------------------- graph


_KCORE_K = 18
_KCORE_STAGES = 16  # ≥ 2× the deepest measured peel (7 rounds at sf0.1)


def _kcore_oracle(k: int = _KCORE_K, stages: int = _KCORE_STAGES) -> str:
    """Unrolled peeling oracle: stage i computes degrees over the
    surviving edge set, keeps nodes with degree ≥ k, and restricts
    edges to kept endpoints. Peeling is monotone (the surviving set
    only shrinks and a converged stage reproduces itself), so any
    stage depth ≥ the actual peel count yields the exact k-core; 16
    stages is > 2× the deepest measured fixture (7 rounds at sf0.1).
    The final SELECT reports each core node's degree WITHIN the core.
    """
    sql = """
WITH bip AS MATERIALIZED (
    SELECT DISTINCT l_partkey AS p, l_suppkey AS s
    FROM lineitem WHERE l_quantity >= 49.0),
e0 AS MATERIALIZED (
    SELECT DISTINCT a.s AS u, b.s AS v
    FROM bip a JOIN bip b ON a.p = b.p AND a.s < b.s)"""
    # every stage CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    # each stage references its predecessor ~3x, so the inlined tree
    # (and the number of parquet re-opens) would grow 3^stages
    for i in range(stages):
        sql += f""",
d{i} AS MATERIALIZED (
    SELECT x, COUNT(*) AS dg
    FROM (SELECT u AS x FROM e{i} UNION ALL SELECT v FROM e{i})
    GROUP BY 1),
a{i} AS MATERIALIZED (SELECT x FROM d{i} WHERE dg >= {k}),
e{i + 1} AS MATERIALIZED (
    SELECT e.u, e.v FROM e{i} e
    JOIN a{i} au ON au.x = e.u
    JOIN a{i} av ON av.x = e.v)"""
    sql += f"""
SELECT x AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM (SELECT u AS x FROM e{stages} UNION ALL SELECT v FROM e{stages})
GROUP BY 1
"""
    return sql


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the co-supply graph (k = 18): the maximal subgraph in
    which every supplier retains ≥ 18 co-supply partners — the
    cohesive-subgraph primitive (Seidman 1983) that separates a dense
    trading community from peripheral suppliers; the fifth graph read
    (PageRank, CC, triangles, link prediction, k-core), sharing
    `operators/graphs.py`.

    The peel loop lives in ``operators/graphs.py::kcore_edges``
    (shared, property-tested against a Python peeling reference on
    random graphs); algorithm and scale notes live on its docstring.
    Output: each core member's degree within the core. Empty result
    (graph fully peeled, e.g. the sparsest fixture) is a valid
    converged state."""
    # max_rounds = the oracle's unrolled stage count: a fixture deep
    # enough to out-peel the 16 stages raises loudly in the engine
    # instead of silently diverging from the non-converged oracle
    # (the graph_closeness_multi_bfs shared-bound discipline, r11)
    e = kcore_edges(
        cosupply_edges(spark, sf_dir), _KCORE_K, max_rounds=_KCORE_STAGES
    )
    return degrees(e).select(
        F.col("x").alias("s_suppkey"),
        F.col("d").cast("bigint").alias("core_degree"),
    )
