"""Round-4 additions: the last quadratic-only LLM-pipeline surface gains
its bucketed twin (embedding near-dup PAIRS via SRP-LSH, full index-replay
oracle), and the two formerly rows-only queries are replaced by
driver-checkable boolean harnesses (``sim_lsh_recall``,
``dedup_simhash_check``) — the rows-only set is now empty.

Registered FIRST so the driver's 50-entry correctness window covers the
new queries, then rotates through the modules whose latest driver rows
are r1/r2 (asof, ingest, relational, round2, streaming, multimodal, …).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from featurestore_for_joycastle_java_spark.operators import dedup as D
from featurestore_for_joycastle_java_spark.operators import similarity as S
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "dedup_embedding_srp",
    # FULL index replay, the sim_srp_topk pattern self-joined: the
    # md5-parity hyperplanes are a public spec, so the oracle rebuilds
    # them, recomputes every bucket code, the equal-(table,code) candidate
    # self-join, and the exact cosine verify — the whole near-dup index,
    # not a recall floor. Whatever the index's recall, both engines see
    # the SAME candidates, so the match is exact by construction.
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
p AS (
    SELECT t.tbl, b.bit,
           list(CASE WHEN CAST(('0x' || substr(md5(t.tbl || '_' || b.bit
                                                || '_' || d.dim_i), 1, 1))
                          AS INT) % 2 = 1
                     THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
                ORDER BY d.dim_i) AS pv
    FROM range(8) AS t(tbl), range(8) AS b(bit), range(64) AS d(dim_i)
    GROUP BY 1, 2),
cc AS (
    SELECT e.vec_id, p.tbl,
           SUM(CASE WHEN list_inner_product(e.v, p.pv) > 0
                    THEN CAST(1 AS BIGINT) << p.bit
                    ELSE CAST(0 AS BIGINT) END) AS code
    FROM e CROSS JOIN p GROUP BY 1, 2),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM cc a JOIN cc b ON a.tbl = b.tbl AND a.code = b.code
                        AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b,
       ROUND(list_inner_product(ea.v, eb.v)
             / (SQRT(list_inner_product(ea.v, ea.v))
                * SQRT(list_inner_product(eb.v, eb.v))), 6) AS cos_sim
FROM cand c
JOIN e ea ON c.id_a = ea.vec_id
JOIN e eb ON c.id_b = eb.vec_id
WHERE ROUND(list_inner_product(ea.v, eb.v)
      / (SQRT(list_inner_product(ea.v, ea.v))
         * SQRT(list_inner_product(eb.v, eb.v))), 6) >= 0.4
""",
)
def dedup_embedding_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup PAIRS via SRP-LSH buckets — the 100 TB twin of
    the exact all-pairs anchor ``dedup_embedding_cosine`` (bench=False,
    quadratic): candidates only from equal (table, code) buckets of the
    corpus's own codes, exact cosine verify ≥ 0.4 on candidates only.
    Never all-pairs — the self-join shuffles on bucket values, so
    candidate volume is Σ_buckets m² (tune n_bits with corpus size), not
    n². 8 tables × 8 bits (256 buckets/table): the r4-initial 16×6 split
    the clustered fixture corpus into only 64 buckets/table and admitted
    24 % of ALL pairs as candidates (471 k of 2 M) — index parameters are
    the knob that keeps the candidate join linear-ish, and 4× more
    buckets at half the hyperplane count cut candidates ~5× and the
    encode fold 96→64 planes. Recall is a similarity-dependent index
    property, exactly replayed by the oracle: low at the 0.4 decision
    boundary (borderline-cos pairs rarely share buckets) and ≈0.93+ in
    the ≥0.9 band where true duplicates live — the operating regime of a
    dedup pass."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.srp_near_pairs(
        e, "vec_id", "embedding", threshold=0.4, n_tables=8, n_bits=8, dim=64
    )


@query(
    "sim_lsh_recall",
    oracle="""
SELECT COUNT(*) AS n_queries, 5 AS k, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
""",
    bench=False,  # recall-verification harness (runs LSH AND brute-force
    # ground truth); the operational BRP path stays benched via tests
)
def sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH top-5, checked by a recall bound
    against brute force (the ``sim_ivf_kmeans_recall`` pattern): BRP
    hashes are JVM-seeded so no external engine can replay the index —
    instead the average top-5 recall over the 10-query batch must clear
    0.8 (measured 0.98-1.0 across sf0.001-0.1; the floor sits under the
    band so only a real bucketing regression flips the boolean and fails
    the value hash). Replaces r1's rows-only ``sim_lsh_topk``
    registration — the raw top-k surface remains
    ``operators.similarity.lsh_topk``, recall-asserted in
    tests/test_similarity.py; oracle duty for SRP-style index replay
    lives with ``sim_srp_topk``."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lsh = S.lsh_topk(e, q, k=5).select("query_id", "vec_id")
    # r13: vectorized ground-truth stage (bit-identical ranking)
    brute = S.brute_force_topk_arrow(e, q, k=5).select("query_id", "vec_id")
    hits = lsh.join(brute, ["query_id", "vec_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    nq = q.agg(F.count(F.lit(1)).alias("n_queries"))
    return nq.crossJoin(hits).select(
        "n_queries",
        F.lit(5).cast("int").alias("k"),
        (F.col("n_hits") / (F.col("n_queries") * 5) >= 0.8).alias("recall_ok"),
    )


@query(
    "dedup_simhash_check",
    # The xxhash64 SimHash index is engine-local, but one property of it
    # is NOT hash-dependent: identical token multisets give identical
    # per-bit votes, hence identical simhash, hence hamming 0 — and
    # banding catches hamming 0 unconditionally (all bands equal). So
    # every exact-duplicate pair (fingerprint-equal, ≥1 token) MUST
    # appear in the banded output. The oracle computes the ground-truth
    # exact-dup pair count independently (md5 fingerprint join) and
    # asserts the containment booleans by construction — a broken hash,
    # vote, band split, or verify filter loses hamming-0 pairs and flips
    # n_missed/contains_exact_dups, failing the value hash.
    oracle="""
WITH d AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) >= 1),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_dup_pairs,
       CAST(0 AS BIGINT) AS n_missed,
       TRUE AS contains_exact_dups
FROM pairs
""",
    bench=False,  # verification harness (simhash + fingerprint ground
    # truth); the operational banded path is benched as dedup_simhash_md5
)
def dedup_simhash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 SimHash banding, checked by a structural containment
    bound: the banded near-dup output must contain EVERY exact-duplicate
    pair (hamming 0 is caught unconditionally by pigeonhole — identical
    normalized text ⇒ identical votes ⇒ identical hash). Ground truth is
    restricted to docs with ≥1 token on both sides (a token-less doc has
    no simhash row — structural, engine-independent). Replaces r1's
    rows-only ``dedup_simhash_pairs`` registration; the cross-engine
    value-oracled pair surface is ``dedup_simhash_md5``."""
    from featurestore_for_joycastle_java_spark.operators.text import (
        fingerprint,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh_pairs = D.simhash_near_pairs(
        docs, "doc_id", "text", max_hamming=3
    ).select("id_a", "id_b")
    gated = docs.filter(F.size(tokens(F.col("text"))) >= 1).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    a, b = gated.alias("a"), gated.alias("b")
    exact = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
    )
    missed = exact.join(sh_pairs, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_missed")
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_dup_pairs"))
    return n_exact.crossJoin(missed).select(
        "n_exact_dup_pairs",
        "n_missed",
        (F.col("n_missed") == 0).alias("contains_exact_dups"),
    )


# --- Behavioral feature-store queries (r4): funnel, cohorts, RFM ------------


@query(
    "funnel_conversion",
    oracle="""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
s1 AS (
    SELECT user_id, event_type, t,
           MIN(CASE WHEN event_type = 'view' THEN t END)
               OVER (PARTITION BY user_id) AS t_view
    FROM e),
s2 AS (
    SELECT *, MIN(CASE WHEN event_type = 'click' AND t >= t_view THEN t END)
                  OVER (PARTITION BY user_id) AS t_click
    FROM s1),
s3 AS (
    SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t >= t_click THEN t END)
                  OVER (PARTITION BY user_id) AS t_purchase
    FROM s2),
u AS (SELECT user_id, MIN(t_view) AS t_view, MIN(t_click) AS t_click,
             MIN(t_purchase) AS t_purchase
      FROM s3 GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(t_view) AS BIGINT) AS n_view,
       CAST(COUNT(t_click) AS BIGINT) AS n_view_click,
       CAST(COUNT(t_purchase) AS BIGINT) AS n_view_click_purchase,
       ROUND(CASE WHEN COUNT(t_view) > 0
                  THEN COUNT(t_click) / CAST(COUNT(t_view) AS DOUBLE) END,
             6) AS view_to_click,
       ROUND(CASE WHEN COUNT(t_click) > 0
                  THEN COUNT(t_purchase) / CAST(COUNT(t_click) AS DOUBLE) END,
             6) AS click_to_purchase
FROM u
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click-after-view →
    purchase-after-that-click) in ONE shuffle: three stacked window
    aggregates over the same user_id partitioning (Catalyst plans one
    exchange, three Window operators), then a per-user rollup that reuses
    that partitioning and a global count. No self-joins — the classic
    funnel-as-N-joins shape re-shuffles the fact table once per stage;
    this is the 100 TB funnel. Stage timestamps are epoch-µs integers so
    both engines compare identical values."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("t")
    )
    w = Window.partitionBy("user_id")
    is_view = F.col("event_type") == "view"
    s1 = ev.withColumn("t_view", F.min(F.when(is_view, F.col("t"))).over(w))
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("t") >= F.col("t_view")),
                F.col("t"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("t") >= F.col("t_click")),
                F.col("t"),
            )
        ).over(w),
    )
    u = s3.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    n_view = F.count("t_view")
    n_click = F.count("t_click")
    n_purch = F.count("t_purchase")
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        n_view.alias("n_view"),
        n_click.alias("n_view_click"),
        n_purch.alias("n_view_click_purchase"),
        F.round(
            F.when(n_view > 0, n_click / n_view.cast("double")), 6
        ).alias("view_to_click"),
        F.round(
            F.when(n_click > 0, n_purch / n_click.cast("double")), 6
        ).alias("click_to_purchase"),
    )


@query(
    "retention_cohorts",
    # Week arithmetic is anchor-based integer math (days since 2024-01-01
    # floor-divided by 7), NOT engine week-truncation — date_trunc('week')
    # semantics (ISO vs locale first-day) are exactly the kind of
    # cross-engine divergence an oracle must not depend on.
    oracle="""
WITH e AS (
    SELECT user_id,
           CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                      / 7.0) AS BIGINT) AS wk
    FROM events),
m AS (SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS wk0 FROM e),
d AS (SELECT DISTINCT user_id, wk0, wk - wk0 AS week_offset FROM m)
SELECT strftime(DATE '2024-01-01' + CAST(wk0 * 7 AS INT), '%Y-%m-%d')
           AS cohort_week,
       week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d GROUP BY 1, 2
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by first-activity week,
    counted at each later week offset — the activation/retention matrix
    every growth dashboard draws. Shape: one window min over user_id
    (cohort assignment, no join back to the fact), a distinct on (user,
    cohort, offset), one groupBy — exact distinct users per cell without
    countDistinct's second shuffle, because the distinct IS the dedup."""
    anchor = F.lit("2024-01-01").cast("date")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.datediff(F.to_date("ts"), anchor) / 7.0).alias("wk"),
    )
    w = Window.partitionBy("user_id")
    d = (
        ev.withColumn("wk0", F.min("wk").over(w))
        .select("user_id", "wk0", (F.col("wk") - F.col("wk0")).alias("week_offset"))
        .distinct()
    )
    return d.groupBy(
        F.date_format(
            F.date_add(anchor, (F.col("wk0") * 7).cast("int")), "yyyy-MM-dd"
        ).alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "feature_rfm",
    oracle="""
WITH p AS (
    SELECT user_id, CAST(ts AS DATE) AS d, value
    FROM events WHERE event_type = 'purchase'),
a AS (SELECT MAX(d) AS anchor FROM p),
u AS (
    SELECT user_id,
           CAST(date_diff('day', MAX(d), (SELECT anchor FROM a)) AS INT)
               AS recency_days,
           CAST(COUNT(*) AS BIGINT) AS frequency,
           CAST(SUM(CAST(value AS DECIMAL(23,6))) AS DOUBLE) AS monetary
    FROM p GROUP BY user_id),
s AS (
    SELECT *,
           CAST(NTILE(5) OVER (ORDER BY recency_days, user_id) AS INT)
               AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS INT)
               AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS INT)
               AS m_score
    FROM u)
SELECT user_id, recency_days, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
           || CAST(m_score AS VARCHAR) AS rfm_segment
FROM s
""",
)
def feature_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer scoring, the
    feature-store staple — with every quintile an EXACT global NTILE(5)
    computed scale-safely: two-pass range bucketing + ``ntile_from_rank``
    integer arithmetic (operators/ranks.py), so no window in the plan
    funnels the full user population through one task (a plain NTILE()
    OVER (ORDER BY …) would — the r1-flagged scale-killer). Score
    convention: 1 = best quintile (most recent / most frequent / highest
    spend); descending orders rank on the negated metric with user_id
    tiebreak, exactly NTILE's (metric DESC, user_id) order. Monetary sums
    decimal-exactly before the double cast (the ``exact_sum`` pattern) so
    both engines rank identical values.

    Plan shape (VERDICT r9 ask #2 — the triangles single-reference
    discipline): the three quintiles are NOT three independent rank
    cascades joined back on user_id (that shape referenced the per-user
    base TEN times in the static plan — 3 cascades x stats/rank/counts
    branches + the final join — 66 Exchange nodes, the r9 plan-audit
    max). Instead the base is MELTED once via explode into (user_id,
    metric, sortval) rows — sortval pre-negated for the descending
    metrics — ranked by ONE ``grouped_row_number`` partitioned on the
    3-value metric column (range-bucketed per metric, so no whole-metric
    window), scored, and pivoted back with a single groupBy(user_id).
    The base is referenced only by the melt's three audit branches
    (stats / rank / counts); the join-back disappears because the melt
    carries the base columns through."""
    from featurestore_for_joycastle_java_spark.operators.ranks import (
        grouped_row_number,
        ntile_from_rank,
    )
    from featurestore_for_joycastle_java_spark.operators.relational import exact_sum

    p = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    anchor = p.agg(F.max(F.to_date("ts")).alias("__anchor"))
    # The melted per-user frame feeds THREE plan branches (the grouped
    # rank's stats/rank/counts) — cache the base once or the events scan
    # + groupBy re-runs per branch. Same lifetime note as the other
    # operator caches: LRU-evictable, bounded by |users| rows. The
    # recency anchor stays OUT of the base: ordering by recency asc is
    # ordering by last-purchase-date desc (recency = anchor - last_d,
    # anchor constant), so the rank uses the negated day number and the
    # anchor joins once, after the pivot — keeping its agg subtree out
    # of all three melt branches.
    u = (
        p.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("__last_d"),
            F.count(F.lit(1)).alias("frequency"),
            exact_sum(F.col("value")).alias("monetary"),
        )
        .cache()
    )

    def metric_row(name: str, sortval) -> F.Column:
        return F.struct(
            F.lit(name).alias("metric"),
            sortval.cast("double").alias("sortval"),
        )

    epoch = F.lit("1970-01-01").cast("date")
    melted = u.select(
        "user_id",
        "__last_d",
        "frequency",
        "monetary",
        F.explode(
            F.array(
                metric_row("r", -F.datediff(F.col("__last_d"), epoch)),
                metric_row("f", -F.col("frequency")),
                metric_row("m", -F.col("monetary")),
            )
        ).alias("__ms"),
    ).select(
        "user_id",
        "__last_d",
        "frequency",
        "monetary",
        F.col("__ms.metric").alias("__metric"),
        F.col("__ms.sortval").alias("__sortval"),
    )

    ranked = grouped_row_number(
        melted, ["__metric"], "__sortval", ["user_id"], "__rn", "__n"
    )
    scored = ranked.withColumn(
        "__score", ntile_from_rank(F.col("__rn"), F.col("__n"), 5)
    )

    def pick(metric: str) -> F.Column:
        return F.max(
            F.when(F.col("__metric") == metric, F.col("__score"))
        )

    out = (
        scored.groupBy("user_id")
        .agg(
            F.max("__last_d").alias("__last_d"),
            F.max("frequency").alias("frequency"),
            F.max("monetary").alias("monetary"),
            pick("r").alias("r_score"),
            pick("f").alias("f_score"),
            pick("m").alias("m_score"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days", F.datediff(F.col("__anchor"), F.col("__last_d"))
        )
    )
    return out.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm_segment"),
    )


@query(
    "text_repetition",
    # Spark computes the top-bigram run length with a per-row HOF fold
    # over the SORTED bigram list (array_sort → aggregate with a
    # (prev, run, best) struct accumulator) — zero shuffle, zero explode.
    # The oracle reaches the same numbers the relational way (unnest →
    # count per gram → max), which is exactly the cross-check you want:
    # two different algorithms, one answer.
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
    FROM documents),
g AS (
    SELECT doc_id, len(tk) AS n_tokens,
           list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])
               AS g2
    FROM t WHERE len(tk) >= 2),
ex AS (SELECT doc_id, n_tokens, len(g2) AS n_2grams, unnest(g2) AS gram FROM g),
cnt AS (SELECT doc_id, n_tokens, n_2grams, gram, COUNT(*) AS c
        FROM ex GROUP BY 1, 2, 3, 4)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_2grams AS BIGINT) AS n_2grams,
       ROUND(1.0 - COUNT(*) / CAST(n_2grams AS DOUBLE), 6) AS dup_2gram_frac,
       ROUND(MAX(c) / CAST(n_2grams AS DOUBLE), 6) AS top_2gram_frac,
       ROUND(MAX(c) / CAST(n_2grams AS DOUBLE), 6) > 0.18 AS is_repetitive
FROM cnt GROUP BY doc_id, n_tokens, n_2grams
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate-
    bigram fraction and top-bigram fraction (fraction of all bigrams that
    are the single most frequent one), with the published 0.18
    top-2-gram gate as a boolean. ENTIRELY per-row Catalyst HOFs —
    bigrams via transform over an index sequence, distinct count via
    array_distinct, top run via a fold over the sorted list — so the
    operator is embarrassingly parallel: no explode, no shuffle, linear
    scan of the corpus. The quality-gate shape a 100 TB pretraining
    pipeline runs over every document. Docs with < 2 tokens have no
    bigrams and are excluded (structural, both engines)."""
    from featurestore_for_joycastle_java_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") >= 2
    )
    tk = F.col("tk")
    g2 = F.transform(
        F.sequence(F.lit(0), F.size(tk) - 2),
        lambda i: F.concat_ws(" ", F.get(tk, i), F.get(tk, i + 1)),
    )
    base = base.select("doc_id", F.size(tk).alias("n_tokens"), g2.alias("g2"))
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_c = F.aggregate(F.array_sort("g2"), acc0, step, lambda acc: acc["best"])
    n2 = F.size("g2")
    top_frac = F.round(top_c / n2.cast("double"), 6)
    return base.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        n2.cast("bigint").alias("n_2grams"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("g2")) / n2.cast("double"), 6
        ).alias("dup_2gram_frac"),
        top_frac.alias("top_2gram_frac"),
        (top_frac > 0.18).alias("is_repetitive"),
    )


@query(
    "feature_scd2_history",
    # Gaps-and-islands SCD2: collapse consecutive identical values with a
    # lag-change flag, then effective-date the change rows with lead.
    # Both windows share one user_id partitioning — one shuffle total.
    oracle="""
WITH p AS (
    SELECT user_id, event_id, value, epoch_us(ts) AS t
    FROM events WHERE event_type = 'purchase'),
chg AS (
    SELECT *, CASE WHEN LAG(t) OVER (PARTITION BY user_id
                                     ORDER BY t, event_id) IS NULL
                     OR value IS DISTINCT FROM
                        LAG(value) OVER (PARTITION BY user_id
                                         ORDER BY t, event_id)
                   THEN 1 ELSE 0 END AS is_chg
    FROM p),
hist AS (
    SELECT user_id, value, t AS valid_from_us,
           LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
               AS valid_to_us
    FROM chg WHERE is_chg = 1)
SELECT user_id, value, valid_from_us, valid_to_us,
       valid_to_us IS NULL AS is_current
FROM hist
""",
)
def feature_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build from a change
    log: per user, collapse runs of consecutive identical purchase values
    (lag-based change detection — the gaps-and-islands pattern), then
    effective-date each surviving change with [valid_from, valid_to)
    from lead; the open row is ``is_current``. The dimension-table
    maintenance every feature store does on entity attributes. Both
    windows hash-partition on user_id once; no self-join, no explode —
    at 100 TB this is one shuffle of the change log."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    p = ev.select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    chg = p.withColumn(
        "is_chg",
        # first row per user always opens a version, even a NULL value
        # (lag-ts null test; aligned with operators/scd.py, r5)
        (
            F.lag("t").over(w).isNull()
            | ~F.col("value").eqNullSafe(F.lag("value").over(w))
        ).cast("int"),
    ).filter(F.col("is_chg") == 1)
    w2 = Window.partitionBy("user_id").orderBy("t", "event_id")
    return chg.select(
        "user_id",
        "value",
        F.col("t").alias("valid_from_us"),
        F.lead("t").over(w2).alias("valid_to_us"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


@query(
    "feature_anomaly_zscore",
    # Cross-engine-exact z-scores WITHOUT trusting either engine's
    # stddev kernel: sums and sums-of-squares accumulate as DECIMAL
    # (order-independent, exact), and mean/variance/z are then the SAME
    # IEEE double expression evaluated left-to-right on both sides — so
    # the hashes match bit-for-bit where a builtin stddev (Welford vs
    # textbook, different merge order) would drift in the last ulp.
    oracle="""
WITH s AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(23,6))) AS DOUBLE) AS sum_v,
           CAST(SUM(CAST(value AS DECIMAL(18,6))
                    * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sumsq_v
    FROM events GROUP BY 1),
st AS (
    SELECT event_type, n,
           sum_v / CAST(n AS DOUBLE) AS mean_v,
           (sumsq_v - CAST(n AS DOUBLE) * (sum_v / CAST(n AS DOUBLE))
                      * (sum_v / CAST(n AS DOUBLE)))
               / (CAST(n AS DOUBLE) - 1) AS var_v
    FROM s WHERE n > 1)
SELECT e.event_id, e.user_id, e.event_type, e.value,
       ROUND((e.value - st.mean_v) / SQRT(st.var_v), 6) AS zscore
FROM events e JOIN st USING (event_type)
WHERE ABS(ROUND((e.value - st.mean_v) / SQRT(st.var_v), 6)) > 3.0
""",
)
def feature_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score anomaly flags per event type: exact decimal
    sum/sum-of-squares per type (tiny agg, map-side combined), broadcast
    the 5-row stats frame back onto the events, per-row arithmetic,
    filter |z| > 3. The outlier-detection shape for a 100 TB event
    stream: NO window over the fact table, no second pass — one partial
    aggregation and one broadcast join, everything else stateless."""
    ev = load_table(spark, sf_dir, "events")
    v_dec = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(23,6)")).cast("double").alias("sum_v"),
        F.sum(v_dec * v_dec).cast("double").alias("sumsq_v"),
    )
    n_d = F.col("n").cast("double")
    mean_v = F.col("sum_v") / n_d
    st = s.filter(F.col("n") > 1).select(
        "event_type",
        "n",
        mean_v.alias("mean_v"),
        ((F.col("sumsq_v") - n_d * mean_v * mean_v) / (n_d - 1)).alias("var_v"),
    )
    z = F.round(
        (F.col("value") - F.col("mean_v")) / F.sqrt(F.col("var_v")), 6
    )
    return (
        ev.join(F.broadcast(st), "event_type")
        .select("event_id", "user_id", "event_type", "value", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > 3.0)
    )


@query(
    "agg_value_histogram",
    oracle="""
SELECT event_type,
       CAST(FLOOR(value / 5.0) AS BIGINT) AS bucket,
       ROUND(CAST(FLOOR(value / 5.0) AS BIGINT) * 5.0, 1) AS bucket_lo,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(23,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""",
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (width-5 buckets):
    the distribution profile behind dashboards and data-quality checks.
    Pure map-side bucketing + one combined aggregation — the bucket id
    is arithmetic on the row, so the shuffle carries one row per
    (type, bucket), not per event."""
    from featurestore_for_joycastle_java_spark.operators.relational import exact_sum

    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 5.0)
    return ev.groupBy(
        "event_type",
        bucket.alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value")).alias("sum_value"),
    ).select(
        "event_type",
        "bucket",
        F.round(F.col("bucket") * 5.0, 1).alias("bucket_lo"),
        "n_events",
        "sum_value",
    )


#: Second SQL-text door (r4): ONE ANSI string with WINDOW functions —
#: running decimal ledger + partition count — parsed and executed by both
#: engines verbatim. Frame semantics are pinned by the unique ORDER BY key
#: (default RANGE UNBOUNDED PRECEDING..CURRENT ROW is identical when the
#: ordering is total), money math is decimal-accumulated.
_SQL_LEDGER_TEXT = """
SELECT user_id,
       event_id,
       CAST(SUM(CAST(value AS DECIMAL(23,6))) OVER (
            PARTITION BY user_id ORDER BY event_id) AS DOUBLE)
           AS running_spend,
       COUNT(*) OVER (PARTITION BY user_id) AS n_user_purchases
FROM events
WHERE event_type = 'purchase'
"""


@query("sql_frontend_ledger", oracle=_SQL_LEDGER_TEXT)
def sql_frontend_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text front end #2 — windowed: the identical ANSI string runs
    through ``spark.sql`` (temp views) and the DuckDB oracle, this time
    exercising window-function parsing/planning (running per-user spend
    ledger + partition count). Complements ``sql_frontend_revenue``
    (grouped aggregation door): between them the SQL-text path covers
    both optimizer shapes a warehouse user types most."""
    from featurestore_for_joycastle_java_spark.sources import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_LEDGER_TEXT)


@query(
    "asof_nearest_error_click",
    # Neither engine has a native NEAREST as-of: the oracle composes
    # DuckDB's backward + forward ASOF joins and picks the closer side
    # (backward wins exact ties) — the same decision rule the Spark
    # operator applies per row after its dual-window fill.
    oracle="""
WITH er AS (
    SELECT event_id, user_id, epoch_us(ts) AS t
    FROM events WHERE event_type = 'error'),
cl AS (
    SELECT event_id AS click_event_id, user_id, epoch_us(ts) AS t
    FROM events WHERE event_type = 'click'
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                               ORDER BY event_id) = 1),
b AS (
    SELECT er.event_id, er.user_id, er.t,
           c.click_event_id AS b_id, c.t AS b_t
    FROM er ASOF LEFT JOIN cl c
      ON er.user_id = c.user_id AND er.t >= c.t),
f AS (
    SELECT er.event_id, c.click_event_id AS f_id, c.t AS f_t
    FROM er ASOF LEFT JOIN cl c
      ON er.user_id = c.user_id AND er.t <= c.t)
SELECT b.event_id, b.user_id,
       CASE WHEN b.b_t IS NOT NULL
                 AND (f.f_t IS NULL OR b.t - b.b_t <= f.f_t - b.t)
            THEN b.b_id ELSE f.f_id END AS nearest_click_id,
       CASE WHEN b.b_t IS NOT NULL
                 AND (f.f_t IS NULL OR b.t - b.b_t <= f.f_t - b.t)
            THEN b.b_t ELSE f.f_t END AS t_us_matched
FROM b JOIN f USING (event_id)
""",
)
def asof_nearest_error_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join: for every error event, the user's
    temporally closest click in EITHER direction (the diagnostic-context
    lookup — 'what was the user doing around the failure'). Implemented
    as ONE shuffle: tagged union windowed ascending and descending over
    the same user partitioning, then per-row distance arithmetic; see
    ``operators.asof.asof_join_nearest``."""
    from featurestore_for_joycastle_java_spark.operators.asof import (
        asof_join_nearest,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "t_us", F.unix_micros(F.col("ts"))
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "t_us"
    )
    # as-of results are UNDEFINED on (key, ts) right-side ties (both
    # engines pick arbitrarily — the operators module doc requires a
    # deduplicated right side); keep the min-event_id click per
    # (user, µs). Dedup via lag over the SAME user_id partitioning the
    # as-of windows use — ordering (t_us, event_id) makes the first row
    # of each instant the min event_id, and the shared partitioning
    # means Catalyst reuses one exchange for dedup + both fills (the
    # plan gate pins exactly one shuffle).
    w_user = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("__prev_t", F.lag("t_us").over(w_user))
        .filter(F.col("__prev_t").isNull() | (F.col("__prev_t") != F.col("t_us")))
        .select(F.col("event_id").alias("nearest_click_id"), "user_id", "t_us")
    )
    out = asof_join_nearest(
        errors,
        clicks,
        on=["user_id"],
        left_ts="t_us",
        right_ts="t_us",
        right_cols=["nearest_click_id"],
    )
    return out.select("event_id", "user_id", "nearest_click_id", "t_us_matched")


@query(
    "agg_hll_mergeable_distinct",
    # The estimate itself is engine-local (DataSketches HLL), so the
    # oracle pins the EXACT distinct count plus the 5%-relative-error
    # boolean — the same bounded-error pattern as
    # agg_approx_distinct_bounded, but here the sketch is built in
    # PARTS (one per event_type) and merged, which is the property that
    # matters at scale and the property a broken merge would break.
    oracle="""
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_parts,
       TRUE AS est_ok
FROM events
""",
    bench=False,  # verification harness (sketch build + exact twin)
)
def agg_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches — the pre-aggregated-rollup property that
    makes approximate distinct usable at 100 TB: build one HLL sketch of
    user_id PER event_type (five independent partial sketches, as a
    rollup table would persist them), union-merge the sketch column, and
    estimate the global distinct count from the merge alone. The
    estimate must land within 5% of the exact count (relative error of
    the default lgConfigK=12 is ~1.6%, so the bound only trips on a
    broken build/merge, not on sketch variance). A naive
    approx_count_distinct re-scans raw data for every roll-up window;
    mergeable sketches make each window a metadata operation."""
    ev = load_table(spark, sf_dir, "events")
    parts = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = parts.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return exact.crossJoin(merged).select(
        "n_exact",
        "n_parts",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            / F.col("n_exact").cast("double")
            <= 0.05
        ).alias("est_ok"),
    )


@query(
    "pysource_synthetic_agg",
    # The source's generation rule is pure integer arithmetic on the row
    # id (see sources/pydatasource.py::SYNTH_SQL) — the oracle REGENERATES
    # the whole input in SQL and aggregates it, so the check covers the
    # connector end to end: partition planning, per-partition generation,
    # schema, and the aggregation on top.
    oracle="""
WITH src AS (
SELECT i AS event_id,
       h % 150 AS user_id,
       (['click', 'error', 'purchase', 'signup', 'view'])
           [CAST((h // 256) % 5 AS INT) + 1] AS event_type,
       ((h // 65536) % 10000) / 100.0 AS value
FROM (SELECT i, (i * 2654435761) % 4294967296 AS h
      FROM range(20000) t(i))
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(23,6))) AS DOUBLE) AS sum_value
FROM src GROUP BY 1
""",
)
def pysource_synthetic_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector door — Spark 4's Python Data Source API: a
    partition-parallel batch source (``synthetic_events``, 8 independent
    id-range partitions) read through the normal
    ``spark.read.format(...)`` path and aggregated. The source's rows
    derive from Knuth multiplicative hashing of the row id, so the
    DuckDB oracle regenerates the identical input from ``range(n)`` and
    the match verifies the CONNECTOR (planning, generation, schema), not
    just the aggregation. ``sf_dir`` is unused — the source IS the data."""
    from featurestore_for_joycastle_java_spark.operators.relational import exact_sum
    from featurestore_for_joycastle_java_spark.sources.pydatasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    src = (
        spark.read.format("synthetic_events")
        .option("rows", 20000)
        .option("partitions", 8)
        .load()
    )
    return src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        exact_sum(F.col("value")).alias("sum_value"),
    )


@query(
    "stream_pysource_counts",
    # Same regenerate-in-SQL oracle as pysource_synthetic_agg — here the
    # rows additionally flow through a real StreamingQuery (custom Python
    # stream reader -> stateful complete-mode aggregation -> memory
    # sink), so the check covers the streaming offset path end to end.
    oracle="""
WITH src AS (
SELECT (i * 2654435761) % 4294967296 AS h
FROM range(20000) t(i)
)
SELECT (['click', 'error', 'purchase', 'signup', 'view'])
           [CAST((h // 256) % 5 AS INT) + 1] AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(((h // 65536) % 10000) / 100.0 AS DECIMAL(23,6)))
            AS DOUBLE) AS sum_value
FROM src GROUP BY 1
""",
)
def stream_pysource_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python STREAMING source composed with a stateful
    aggregation: synthetic_events read via its offset-tracked stream
    reader (one availableNow prefetch batch — batchRows=rows; the
    multi-batch exactly-once progression is pinned in
    tests/test_streaming.py), complete-mode groupBy into a memory sink,
    oracle regenerates the input in SQL. ``sf_dir`` unused — the source
    IS the data."""
    from featurestore_for_joycastle_java_spark.catalog.streaming import _run
    from featurestore_for_joycastle_java_spark.operators.relational import exact_sum
    from featurestore_for_joycastle_java_spark.sources.pydatasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    src = (
        spark.readStream.format("synthetic_events")
        .option("rows", 20000)
        .option("batchRows", 20000)
        .load()
    )
    agg = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value")).alias("sum_value"),
    )
    return _run(spark, agg, "complete")


from featurestore_for_joycastle_java_spark.operators.layout import (  # noqa: E402
    morton_key,
    morton_sql,
)

# bits=17: the engine's own quality gate pins value < 1000, so
# y = floor(value·100) needs 17 bits (99,999 < 2^17); 16 would silently
# collide distinct y values at larger fixtures while every value-level
# oracle stayed green. morton_key also refuses out-of-range inputs
# executor-side.
_MORTON_ORACLE = f"""
SELECT event_id,
       user_id AS x,
       CAST(FLOOR(value * 100) AS BIGINT) AS y,
       CAST({morton_sql("user_id", "CAST(FLOOR(value * 100) AS BIGINT)", bits=17)}
            AS BIGINT) AS morton
FROM events
"""


@query("layout_morton_keys", oracle=_MORTON_ORACLE)
def layout_morton_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over (user_id, cents(value)) —
    the multi-dimensional data-layout primitive: range-partitioning files
    on this key gives BOTH dimensions min/max-stat locality, so 2-D box
    predicates prune files instead of scanning the corpus (see
    ``operators/layout.py``; the physical clustering itself is
    ``cluster_by_morton``, exercised with a layout-property test). The
    key is 32 unrolled shift/mask long-ops — whole-stage codegen, no
    HOFs — and the oracle rebuilds every bit with division/modulo
    arithmetic, so the interleaving is verified bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("user_id")
    y = F.floor(F.col("value") * 100).cast("long")
    return ev.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        morton_key(x, y, bits=17).cast("bigint").alias("morton"),
    )


@query(
    "quality_constraint_checks",
    oracle="""
SELECT * FROM (
SELECT 'events.event_id unique' AS constraint_name,
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS n_violations
FROM events
UNION ALL
SELECT 'events.user_id not null',
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'events.value in [0, 1000)',
       CAST(SUM(CASE WHEN value < 0 OR value >= 1000 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM events
UNION ALL
SELECT 'orders.o_custkey references customer',
       CAST(COUNT(*) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
) t
""",
)
def quality_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate — the validation pass a feature
    store runs before publishing a table: uniqueness, non-null, value
    range, and referential integrity, each as one aggregate returning a
    violation count (0 = constraint holds; the driver's value hash pins
    every count). Shapes: uniqueness = count vs distinct (one shuffle),
    RI = left-anti against the broadcastable dimension — all
    constant-output regardless of fact size, so the gate costs one scan
    per table at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    u = ev.agg(
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("n_violations")
    ).select(
        F.lit("events.event_id unique").alias("constraint_name"), "n_violations"
    )
    nn = ev.agg(
        F.sum(F.col("user_id").isNull().cast("long")).alias("n_violations")
    ).select(
        F.lit("events.user_id not null").alias("constraint_name"), "n_violations"
    )
    rng = ev.agg(
        F.sum(
            ((F.col("value") < 0) | (F.col("value") >= 1000)).cast("long")
        ).alias("n_violations")
    ).select(
        F.lit("events.value in [0, 1000)").alias("constraint_name"),
        "n_violations",
    )
    ri = (
        orders.join(
            F.broadcast(cust),
            orders.o_custkey == cust.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("orders.o_custkey references customer").alias(
                "constraint_name"
            ),
            "n_violations",
        )
    )
    return u.unionByName(nn).unionByName(rng).unionByName(ri)


@query(
    "profile_events_columns",
    # Column profiling with CROSS-ENGINE-EXACT numbers: null counts and
    # distinct counts are integers; min/max of value are exact doubles;
    # no averages of floats (engine-order-dependent) — the profile is
    # hash-comparable without tolerance.
    oracle="""
SELECT 'event_id' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(MIN(event_id) AS DOUBLE) AS min_value,
       CAST(MAX(event_id) AS DOUBLE) AS max_value
FROM events
UNION ALL
SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT user_id) AS BIGINT),
       CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE)
FROM events
UNION ALL
SELECT 'value', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT value) AS BIGINT),
       CAST(MIN(value) AS DOUBLE), CAST(MAX(value) AS DOUBLE)
FROM events
""",
)
def profile_events_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the DESCRIBE-EXTENDED/data-card pass): per
    numeric column — rows, nulls, exact distinct, min, max. One
    aggregation pass per column over the same cached scan; outputs are
    integers and exact extrema, so the profile hash-matches across
    engines with no tolerance."""
    ev = load_table(spark, sf_dir, "events").cache()

    def prof(col: str) -> DataFrame:
        return ev.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(col).isNull().cast("long")).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(F.col(col)).cast("double").alias("min_value"),
            F.max(F.col(col)).cast("double").alias("max_value"),
        ).select(
            F.lit(col).alias("column_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_value",
            "max_value",
        )

    return prof("event_id").unionByName(prof("user_id")).unionByName(
        prof("value")
    )


@query(
    "sim_pq_recall",
    oracle="""
SELECT COUNT(*) AS n_queries, 5 AS k, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
""",
    bench=False,  # verification harness (builds codebooks AND runs the
    # brute-force ground truth); operators are unit-benched in tests
)
def sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011 — the faiss IVF-PQ
    compression half): 16 per-subspace k-means codebooks turn each
    64-dim float vector into 16 small ints (~16× less scan traffic),
    queries scan CODES ONLY via an asymmetric-distance table, and an
    exact cosine re-rank of the ADC-top-100 shortlist yields the final
    top-5 — the production two-stage shape (quantized scan + exact
    re-rank touches full vectors for only shortlist·|queries| rows).
    JVM-seeded codebooks can't be replayed cross-engine, so the driver
    check is the recall bound: average top-5 recall vs brute force must
    clear 0.6 (measured 0.92–0.98 across sf0.001–0.1; the floor sits
    far under the band so only a real codebook/encode/ADC/re-rank
    regression flips the boolean)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        brute_force_topk_arrow,
        pq_topk,
    )

    pq = pq_topk(e, q, k=5, m=16, shortlist=100).select("query_id", "vec_id")
    # r13: vectorized ground-truth stage (bit-identical ranking)
    brute = brute_force_topk_arrow(e, q, k=5).select("query_id", "vec_id")
    hits = pq.join(brute, ["query_id", "vec_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    nq = q.agg(F.count(F.lit(1)).alias("n_queries"))
    return nq.crossJoin(hits).select(
        "n_queries",
        F.lit(5).cast("int").alias("k"),
        (F.col("n_hits") / (F.col("n_queries") * 5) >= 0.6).alias("recall_ok"),
    )


@query(
    "feature_scd2_lookup",
    # PIT lookup = as-of backward join against the SCD2 change rows, so
    # the plan is ONE shuffle on user_id — not an interval range join
    # (which explodes on long validity spans). The oracle does it the
    # declarative way: join on valid_from <= t < valid_to — two routes,
    # one answer.
    oracle="""
WITH p AS (
    SELECT user_id, event_id, value, epoch_us(ts) AS t
    FROM events WHERE event_type = 'purchase'
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                               ORDER BY event_id DESC) = 1),
chg AS (
    SELECT *, CASE WHEN LAG(t) OVER (PARTITION BY user_id
                                     ORDER BY t, event_id) IS NULL
                     OR value IS DISTINCT FROM
                        LAG(value) OVER (PARTITION BY user_id
                                         ORDER BY t, event_id)
                   THEN 1 ELSE 0 END AS is_chg
    FROM p),
hist AS (
    SELECT user_id, value AS tier_value, t AS valid_from_us,
           LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
               AS valid_to_us
    FROM chg WHERE is_chg = 1),
clicks AS (
    SELECT event_id, user_id, epoch_us(ts) AS t_us
    FROM events WHERE event_type = 'click')
SELECT c.event_id, c.user_id, h.tier_value
FROM clicks c
LEFT JOIN hist h
  ON c.user_id = h.user_id
 AND h.valid_from_us <= c.t_us
 AND (h.valid_to_us IS NULL OR c.t_us < h.valid_to_us)
""",
)
def feature_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 history: for
    every click, the purchase-value tier IN EFFECT at click time —
    leakage-free feature retrieval from an effective-dated dimension.
    Implemented as an as-of backward join on the CHANGE rows (validity
    intervals are contiguous per user, so 'latest change at-or-before t'
    ≡ 'interval containing t'): one user_id shuffle, no interval range
    join, no explode. Clicks before the user's first purchase get null
    (left-outer)."""
    from featurestore_for_joycastle_java_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "t_us", F.unix_micros(F.col("ts"))
    )
    # latest-wins dedup per (user, µs): two purchases in the same
    # microsecond would otherwise tie the as-of lookup, whose winner is
    # undefined in both engines (see operators/asof.py module doc).
    # lag over the same user_id partitioning as every later window
    # (ordering (t_us, event_id DESC) ⇒ first row per instant = max
    # event_id) so the whole pipeline shares one exchange.
    w_dedup = Window.partitionBy("user_id").orderBy(
        "t_us", F.col("event_id").desc()
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("__prev_t", F.lag("t_us").over(w_dedup))
        .filter(F.col("__prev_t").isNull() | (F.col("__prev_t") != F.col("t_us")))
        .select("user_id", "event_id", "value", "t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    chg = (
        p.withColumn(
            "is_chg",
            (
                F.lag("t_us").over(w).isNull()
                | ~F.col("value").eqNullSafe(F.lag("value").over(w))
            ).cast("int"),
        )
        .filter(F.col("is_chg") == 1)
        .select(
            "user_id",
            F.col("value").alias("tier_value"),
            F.col("t_us"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "t_us"
    )
    out = asof_join(
        clicks,
        chg,
        on=["user_id"],
        left_ts="t_us",
        right_ts="t_us",
        right_cols=["tier_value"],
        direction="backward",
    )
    return out.select("event_id", "user_id", "tier_value")


@query(
    "agg_countmin_user_counts",
    # The sketch is deterministic md5 arithmetic, so unlike HLL this one
    # replays COMPLETELY cross-engine: DuckDB rebuilds all d×w counters,
    # re-derives every key's d cells, takes the same min — full value
    # oracle on the estimates themselves, plus the structural
    # never-underestimates boolean.
    oracle="""
WITH cells AS (
    SELECT i.i AS row_i,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '_' || i.i),
                                1, 15)) AS BIGINT) % 64 AS col_j,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events CROSS JOIN range(4) AS i(i)
    GROUP BY 1, 2),
keys AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
    FROM events GROUP BY 1),
est AS (
    SELECT k.user_id, k.n_exact, MIN(c.c) AS cms_est
    FROM keys k
    CROSS JOIN range(4) AS i(i)
    JOIN cells c
      ON c.row_i = i.i
     AND c.col_j = CAST(('0x' || substr(md5(CAST(k.user_id AS VARCHAR)
                                            || '_' || i.i), 1, 15))
                        AS BIGINT) % 64
    GROUP BY 1, 2)
SELECT user_id, n_exact, cms_est, cms_est >= n_exact AS never_under
FROM est
""",
)
def agg_countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter counts (Cormode & Muthukrishnan
    2005): d=4 hash rows × w=64 counters estimate every user's event
    count from a 256-cell table — constant memory regardless of key
    cardinality, mergeable across partitions/streams by cell-wise
    addition (the partial aggregation IS the merge). Hashing is
    md5-derived (engine-portable, no seed), so the oracle rebuilds the
    identical sketch and the VALUE of every estimate is checked, not
    just a bound; ``never_under`` pins CMS's one-sided error
    structurally. Build shape: explode d rows per event → groupBy
    (row, col) map-side-combines to d·w cells before the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    d, wdt = 4, 64

    def cell(key_col, i):
        h = F.conv(
            F.substring(
                F.md5(F.concat(key_col.cast("string"), F.lit(f"_{i}"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        return h % wdt

    cells = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row_i"),
                            cell(F.col("user_id"), i).alias("col_j"),
                        )
                        for i in range(d)
                    ]
                )
            ).alias("rc")
        )
        .groupBy("rc.row_i", "rc.col_j")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    lookups = keys.select(
        "user_id",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        cell(F.col("user_id"), i).alias("col_j"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("rc"),
    ).select("user_id", "n_exact", "rc.row_i", "rc.col_j")
    est = (
        lookups.join(F.broadcast(cells), ["row_i", "col_j"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "user_id",
        "n_exact",
        "cms_est",
        (F.col("cms_est") >= F.col("n_exact")).alias("never_under"),
    )
