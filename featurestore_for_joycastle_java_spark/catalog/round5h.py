"""Round-5 sixth-continuation additions (registered below the driver
window, after ``round5g``) — driver rows due in the r6 rotation; until
then covered by tests/test_oracle_parity.py and the SIM sweeps.

Gap analysis behind the picks (SURVEY §2 delta after round5g):

- ``sim_rrf_hybrid``: Reciprocal Rank Fusion of the lexical (BM25) and
  vector (cosine) rankings — the standard hybrid-retrieval read
  (Cormack, Clarke & Buettcher, SIGIR 2009) that every RAG stack runs;
  fusion is PURE INTEGER arithmetic over ranks, so the only float
  discipline needed is what the two underlying rankings already pin.
- ``eval_ndcg_at10``: NDCG@10 of the value-score ranking against
  purchase labels per user — the graded-ranking metric beside AUC
  (pairwise), confusion (operating point) and calibration
  (probability); log2 discounts are pre-computed integer-ppm LITERALS
  (the Benford precedent — no transcendentals at query time).
- ``quality_freshness_sla``: per-source staleness lag against the
  freshest event with an SLA verdict — the first check every data-ops
  oncall reads; integer minute arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


# ------------------------------------------------------------- retrieval


_RRF_K = 60  # the standard RRF constant (Cormack et al. 2009)


@query(
    "sim_rrf_hybrid",
    # Both input rankings replay their proven oracles (BM25: fixed-order
    # float fold, 6dp round; cosine: HOF inner products, 6dp round) and
    # are then reduced to integer RANKS; the fusion score is
    # Σ 1e6 DIV (60 + rank) — exact integers, deterministic top-10 via
    # (rrf DESC, doc_id).
    oracle="""
WITH q(term, ord) AS (
    SELECT * FROM (VALUES ('spark', 1), ('stream', 2), ('join', 3))),
toks AS (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS toks
    FROM documents),
dl AS (SELECT doc_id, LEN(toks) AS dl FROM toks),
stats AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl),
tf AS (
    SELECT t.doc_id, q.term, q.ord,
           LEN(list_filter(t.toks, x -> x = q.term)) AS tf
    FROM toks t CROSS JOIN q),
idf AS (
    SELECT q.term,
           LN((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
              / (CAST(d.df AS DOUBLE) + 0.5) + 1.0) AS idf
    FROM q
    JOIN (SELECT term, COUNT(*) AS df FROM tf WHERE tf > 0 GROUP BY 1) d
        USING (term)
    CROSS JOIN stats s),
lex_scored AS (
    SELECT tf.doc_id,
           ROUND(list_reduce(
               list_transform(
                   list({'o': tf.ord,
                         'v': idf.idf * (CAST(tf.tf AS DOUBLE) * 2.2)
                              / (CAST(tf.tf AS DOUBLE) + 1.2
                                 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                                               / s.avgdl))}
                        ORDER BY tf.ord),
                   r -> r.v),
               (a, x) -> a + x), 6) AS score
    FROM tf
    JOIN dl USING (doc_id) CROSS JOIN stats s
    JOIN idf USING (term)
    GROUP BY tf.doc_id, dl.dl, s.avgdl
    HAVING SUM(tf.tf) > 0),
lex AS (
    SELECT doc_id, CAST(ROW_NUMBER() OVER (
               ORDER BY score DESC, doc_id) AS BIGINT) AS r_lex
    FROM lex_scored
    ORDER BY score DESC, doc_id
    LIMIT 20),
e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
vec_scored AS (
    SELECT e.vec_id AS doc_id,
           ROUND(list_inner_product(qv.qv, e.v)
                 / (SQRT(list_inner_product(qv.qv, qv.qv))
                    * SQRT(list_inner_product(e.v, e.v))), 6) AS cos_sim
    FROM e CROSS JOIN qv),
vec AS (
    SELECT doc_id, CAST(ROW_NUMBER() OVER (
               ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS r_vec
    FROM vec_scored
    ORDER BY cos_sim DESC, doc_id
    LIMIT 20),
fused AS (
    SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
           lex.r_lex, vec.r_vec,
           COALESCE(1000000 // (60 + lex.r_lex), 0)
           + COALESCE(1000000 // (60 + vec.r_vec), 0) AS rrf_scaled
    FROM lex FULL OUTER JOIN vec USING (doc_id))
SELECT doc_id, r_lex, r_vec, CAST(rrf_scaled AS BIGINT) AS rrf_scaled
FROM fused
ORDER BY rrf_scaled DESC, doc_id
LIMIT 10
""",
)
def sim_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: the top-20 lexical
    (BM25, fixed 3-term query) and top-20 vector (cosine to embedding
    0) rankings fused by Σ 1e6/(60 + rank) — the standard RAG-stack
    read that needs no score normalization across incomparable scales
    (ranks, not scores, fuse). The fusion layer is PURE INTEGER
    arithmetic; the two source rankings carry the repo's existing
    float discipline (fixed-order folds, 6dp rounds, doc-id
    tiebreaks), so determinism composes instead of being re-litigated.

    Scale shape: each branch is its proven scale path (BM25: broadcast
    term dim, HOF tf, no corpus explode; cosine: broadcast query row,
    HOF inner product, TakeOrdered top-k); the fusion joins two 20-row
    frames — free at any corpus size. Docs in only one list keep their
    one contribution (standard RRF)."""
    from featurestore_for_joycastle_java_spark.catalog.round5c import (
        text_bm25_topk,
    )
    from featurestore_for_joycastle_java_spark.operators import (
        similarity as S,
    )

    lex = text_bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .cast("bigint")
        .alias("r_lex"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vec = (
        S.brute_force_topk(emb, qv, k=20)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("rnk").cast("bigint").alias("r_vec"),
        )
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_vec",
        (
            F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + r_lex)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + r_vec)"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("rrf_scaled"),
    )
    return fused.orderBy(
        F.col("rrf_scaled").desc(), F.col("doc_id").asc()
    ).limit(10)


# ------------------------------------------------------------------ eval


#: floor(1e6 / log2(rank + 1)) for ranks 1..10 — pre-computed so no
#: transcendental runs at query time (the Benford-constants precedent).
_NDCG_W = [
    1000000, 630929, 500000, 430676, 386852,
    356207, 333333, 315464, 301029, 289064,
]


def _ndcg_case(col: str) -> str:
    arms = " ".join(
        f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W)
    )
    return f"CASE {col} {arms} ELSE 0 END"


@query(
    "eval_ndcg_at10",
    # Per-user DCG@10 = Σ rel·w(rank) with integer-ppm log2 discounts;
    # IDCG from the user's total positive count; ndcg = DCG·1e6 DIV
    # IDCG; the corpus metric is the integer mean over scoreable users.
    oracle=f"""
WITH r AS (
    SELECT user_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel,
           ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY CAST(FLOOR(value * 1000000.0) AS BIGINT) DESC,
                        event_id) AS rnk
    FROM events),
dcg AS (
    SELECT user_id,
           CAST(SUM(CASE WHEN rnk <= 10 AND rel = 1
                    THEN {_ndcg_case('rnk')} ELSE 0 END) AS BIGINT)
               AS dcg_ppm,
           CAST(SUM(rel) AS BIGINT) AS n_pos
    FROM r GROUP BY 1),
idcg AS (
    SELECT user_id, dcg_ppm,
           CAST(SUM({_ndcg_case('g.i')}) AS BIGINT) AS idcg_ppm
    FROM dcg
    JOIN (SELECT unnest(generate_series(1, 10)) AS i) g
      ON g.i <= LEAST(dcg.n_pos, 10)
    WHERE dcg.n_pos > 0
    GROUP BY 1, 2),
per AS (
    SELECT user_id,
           dcg_ppm * 1000000 // idcg_ppm AS ndcg_ppm
    FROM idcg)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(ndcg_ppm) // COUNT(*) AS BIGINT) AS mean_ndcg_ppm
FROM per
""",
)
def eval_ndcg_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the value-score ranking against purchase labels, per
    user, averaged — the graded-ranking metric completing the eval
    family (AUC = pairwise ranking, confusion = operating point,
    calibration = probability, NDCG = top-of-list quality, which is
    what a recommendation surface actually ships). The log2 position
    discounts are pre-computed integer-ppm literals, DCG/IDCG are
    integer sums, and both the per-user NDCG and the corpus mean are
    single floor divisions — bit-exact cross-engine; users with no
    positives are excluded (IDCG undefined).

    Scale shape: the ranking window partitions by user (fully
    parallel, no global window); everything after it is
    map-side-combined aggregation. IDCG needs only the user's positive
    COUNT — the ideal ranking's weights are a prefix sum of constants,
    attached via a broadcast 10-row series."""
    r = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "rel"
        ),
        F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("vm"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("vm").desc(), F.col("event_id").asc()
    )
    ranked = r.withColumn("rnk", F.row_number().over(w))
    warr = F.array(*[F.lit(v).cast("bigint") for v in _NDCG_W])
    dcg = ranked.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("rnk") <= 10) & (F.col("rel") == 1),
                F.element_at(warr, F.col("rnk")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("dcg_ppm"),
        F.sum("rel").cast("bigint").alias("n_pos"),
    )
    # IDCG = prefix sum of the weight constants up to min(n_pos, 10):
    # a 10-row broadcast series joined on i <= least(n_pos, 10)
    series = (
        spark.range(1, 11)
        .select(
            F.col("id").cast("int").alias("i"),
            F.element_at(warr, F.col("id").cast("int")).alias("wi"),
        )
    )
    idcg = (
        dcg.filter(F.col("n_pos") > 0)
        .join(
            F.broadcast(series),
            F.col("i") <= F.least(F.col("n_pos"), F.lit(10)),
        )
        .groupBy("user_id", "dcg_ppm")
        .agg(F.sum("wi").cast("bigint").alias("idcg_ppm"))
    )
    per = idcg.select(
        "user_id", F.expr("dcg_ppm * 1000000 DIV idcg_ppm").alias("ndcg_ppm")
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.expr("sum(ndcg_ppm) DIV count(1)")
        .cast("bigint")
        .alias("mean_ndcg_ppm"),
    )


# --------------------------------------------------------------- quality


@query(
    "quality_freshness_sla",
    # Integer minute lags between each source's newest event and the
    # globally freshest one; the SLA verdict is a plain integer compare.
    # Lag = (epoch_us(global) − epoch_us(last)) DIV 60e6 — ELAPSED
    # minutes, identical on both engines; DuckDB's date_diff('minute')
    # counts minute-BOUNDARY crossings instead and is avoided.
    oracle="""
WITH m AS (
    SELECT event_type, MAX(ts) AS last_ts FROM events GROUP BY 1),
g AS (SELECT MAX(last_ts) AS global_ts FROM m)
SELECT m.event_type,
       strftime(m.last_ts, '%Y-%m-%d %H:%M:%S') AS last_event,
       CAST((epoch_us(g.global_ts) - epoch_us(m.last_ts)) // 60000000
            AS BIGINT) AS lag_minutes,
       CAST(CASE WHEN (epoch_us(g.global_ts) - epoch_us(m.last_ts))
                      // 60000000 <= 120
            THEN 1 ELSE 0 END AS BIGINT) AS sla_ok
FROM m CROSS JOIN g
""",
)
def quality_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness lag: how far each event type's newest event
    trails the globally freshest one, with a 2-hour SLA verdict — the
    first dashboard a data-ops oncall reads (a silent upstream is
    invisible to row-level quality checks; it shows up ONLY as
    staleness). Integer minute arithmetic on identical timestamps;
    timestamps rendered as strings at the boundary (the repo's date
    discipline).

    Scale shape: one map-side-combined MAX per source; the global max
    is an aggregate of that |sources|-row frame attached by broadcast.
    One fact pass."""
    m = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.max("ts").alias("last_ts"))
    )
    g = m.agg(F.max("last_ts").alias("global_ts"))
    lag = F.expr(
        "(unix_micros(global_ts) - unix_micros(last_ts)) DIV 60000000"
    )
    return m.crossJoin(F.broadcast(g)).select(
        "event_type",
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_event"),
        lag.cast("bigint").alias("lag_minutes"),
        F.when(lag <= 120, 1).otherwise(0).cast("bigint").alias("sla_ok"),
    )
