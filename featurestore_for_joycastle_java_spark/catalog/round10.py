"""Round-10 additions: twelve LLM-pipeline / feature-engineering
queries that extend SURVEY §2.3's north-star surface along axes the
catalog did not yet cover — substring-level dedup signal, rule-based
quality filtering, supervised category encoding diagnostics, dependence
/ calibration / agreement measurement, two-sample hypothesis testing
(rank-based and parametric), robust trend estimation, and the two
product-analytics classics (sequenced funnel, cohort retention).

All twelve follow the house rules: integer/ppm arithmetic (or
micro-rounded doubles where a transcendental is intrinsic), every
computed column aliased identically in Spark and the DuckDB oracle, no
row-at-a-time UDFs, 1-row stats frames joined via
``crossJoin(broadcast(...))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.operators.text import (
    bind_once,
    shingles,
    tokens,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table

#: Gopher-rule stopword probe (Rae et al. 2021, arXiv:2112.11446 use a
#: small closed-class list; ours matches the en-stopword family used by
#: ``operators/text.py::LANG_STOPWORDS`` where it intersects the fixture
#: vocabulary, so the >= 2 distinct-stopword rule actually discriminates).
_GOPHER_STOPS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]


@query(
    "dedup_substring_ngrams",
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
    FROM documents),
w AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, CAST(len(toks) AS BIGINT) - 6),
               i -> array_to_string(toks[i:i+7], ' '))) AS grams
    FROM t),
g AS (SELECT doc_id, UNNEST(grams) AS gram FROM w),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
per AS (
    SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
    FROM g JOIN dup USING (gram) GROUP BY 1)
SELECT w.doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(COALESCE(per.n_dup, 0) AS BIGINT) AS n_dup_grams,
       CASE WHEN len(grams) > 0
            THEN (CAST(COALESCE(per.n_dup, 0) AS BIGINT) * 1000000)
                 // CAST(len(grams) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS dup_ppm
FROM w LEFT JOIN per USING (doc_id)
""",
)
def dedup_substring_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring coverage — the ExactSubstr-style
    dedup signal of Lee et al. 2022 (arXiv:2107.06499, "Deduplicating
    Training Data Makes Language Models Better"), discretized to token
    8-grams: for each document, how many of its distinct 8-token spans
    also occur in at least one OTHER document, and that count as a ppm
    ratio of its span vocabulary. Pipelines threshold ``dup_ppm`` to drop
    or trim boilerplate-heavy documents.

    Plan shape: ``shingles(k=8)`` builds the distinct span set per row
    with HOFs (no explode until the inverted index is actually needed),
    then ONE explode feeds both the span-frequency aggregate and the
    join-back — two hash shuffles on the gram key, pairs never
    materialized.

    Shuffle-key default, MEASURED (SCALETEST_r12, ask #5): raw gram
    string vs ``xxhash64(gram)`` at 2x/4x/8x/16x of sf0.1 — the hash
    saves only 2–4% on local[32] (34.2 vs 35.6 s at 16x, alpha 0.97 vs
    0.98), because a single-host shuffle is CPU/hash-bound, not
    byte-bound. The raw string therefore STAYS the default (exact
    oracle replay, zero collision surface); ``xxhash64``-before-shuffle
    is the opt-in for real clusters, where the ~50-byte→8-byte key
    shrink cuts NETWORK shuffle bytes ~2.5x on this pipeline's two
    gram-keyed exchanges — a win the local measurement structurally
    cannot show."""
    d = load_table(spark, sf_dir, "documents")
    # The gram-set frame feeds THREE plan branches (the inverted index's
    # explode twice — dup + join-back — and the final n_grams select);
    # cache it so tokenize + distinct-8-gram construction runs once, not
    # three times (r12 opt, the minhash shingle-cache pattern; measured
    # interleaved A/B at sf0.1: 3.86 → 2.21 s). Same lifetime note as
    # minhash_lsh_pairs: blocks free with the plan via ContextCleaner.
    base = d.select(
        "doc_id", shingles(F.col("text"), k=8).alias("grams")
    ).cache()
    ex = base.select("doc_id", F.explode("grams").alias("gram"))
    dup = (
        ex.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("gram")
    )
    per = ex.join(dup, "gram").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n_dup")
    )
    return (
        base.select(
            "doc_id", F.size("grams").cast("bigint").alias("n_grams")
        )
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("__n_dup"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_grams"),
            F.expr(
                "CASE WHEN n_grams > 0 THEN "
                "(CAST(COALESCE(__n_dup, 0) AS BIGINT) * 1000000) DIV n_grams "
                "ELSE CAST(0 AS BIGINT) END"
            ).alias("dup_ppm"),
        )
    )


@query(
    "text_gopher_rules",
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
    FROM documents),
s AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
               AS sum_len,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
               AS BIGINT) AS n_alpha,
           CAST(len(list_intersect(toks,
               ['the','a','and','of','to','in','is','for','on','with']))
               AS BIGINT) AS n_stop_distinct
    FROM t)
SELECT doc_id, n_words,
       CASE WHEN n_words > 0 THEN (sum_len * 100) // n_words
            ELSE CAST(0 AS BIGINT) END AS mean_word_len_x100,
       CASE WHEN n_words > 0 THEN (n_alpha * 1000000) // n_words
            ELSE CAST(0 AS BIGINT) END AS alpha_ppm,
       n_stop_distinct,
       (n_words BETWEEN 50 AND 100000
        AND (CASE WHEN n_words > 0 THEN (sum_len * 100) // n_words
                  ELSE CAST(0 AS BIGINT) END) BETWEEN 300 AND 1000
        AND (CASE WHEN n_words > 0 THEN (n_alpha * 1000000) // n_words
                  ELSE CAST(0 AS BIGINT) END) >= 800000
        AND n_stop_distinct >= 2) AS keep
FROM s
""",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): word count in [50, 100000], mean word
    length in [3, 10] chars, >= 80% of words containing an alphabetic
    character, and at least 2 distinct stopwords present — ``keep`` is
    the conjunction, emitted alongside every rule input so a pipeline
    can audit WHICH rule rejected a document.

    Ratios are integer (x100 chars / ppm) so the oracle replays exactly.
    Plan shape: pure per-row narrow HOF arithmetic over the token array
    — the array is bound ONCE via ``bind_once`` (Catalyst does no CSE
    across HOF lambda boundaries), zero shuffles, trivially
    data-parallel at any scale."""
    d = load_table(spark, sf_dir, "documents")

    def build(tk):
        n_words = F.size(tk).cast("bigint")
        sum_len = F.aggregate(
            tk, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        )
        n_alpha = F.size(
            F.filter(tk, lambda x: x.rlike("[a-z]"))
        ).cast("bigint")
        n_stop = F.size(
            F.array_intersect(tk, F.array(*[F.lit(s) for s in _GOPHER_STOPS]))
        ).cast("bigint")
        return F.struct(
            n_words.alias("n_words"),
            sum_len.alias("sum_len"),
            n_alpha.alias("n_alpha"),
            n_stop.alias("n_stop_distinct"),
        )

    s = d.select(
        "doc_id", bind_once(tokens(F.col("text")), build).alias("s")
    ).select("doc_id", "s.*")
    mean_expr = (
        "CASE WHEN n_words > 0 THEN (sum_len * 100) DIV n_words "
        "ELSE CAST(0 AS BIGINT) END"
    )
    alpha_expr = (
        "CASE WHEN n_words > 0 THEN (n_alpha * 1000000) DIV n_words "
        "ELSE CAST(0 AS BIGINT) END"
    )
    return s.select(
        "doc_id",
        "n_words",
        F.expr(mean_expr).alias("mean_word_len_x100"),
        F.expr(alpha_expr).alias("alpha_ppm"),
        "n_stop_distinct",
        (
            F.col("n_words").between(50, 100000)
            & F.expr(mean_expr).between(300, 1000)
            & (F.expr(alpha_expr) >= 800000)
            & (F.col("n_stop_distinct") >= 2)
        ).alias("keep"),
    )


@query(
    "feature_woe_iv",
    oracle="""
WITH e AS (
    SELECT event_type, CASE WHEN value >= 50 THEN 1 ELSE 0 END AS y
    FROM events),
c AS (
    SELECT event_type,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(1 - y) AS BIGINT) AS n_neg
    FROM e GROUP BY 1),
t AS (
    SELECT CAST(SUM(n_pos) AS BIGINT) AS pos_t,
           CAST(SUM(n_neg) AS BIGINT) AS neg_t
    FROM c),
w AS (
    SELECT event_type, n_pos, n_neg,
           LN(((CAST(n_pos AS DOUBLE) + 0.5) / (CAST(pos_t AS DOUBLE) + 2.5))
              / ((CAST(n_neg AS DOUBLE) + 0.5)
                 / (CAST(neg_t AS DOUBLE) + 2.5))) AS woe,
           ((CAST(n_pos AS DOUBLE) + 0.5) / (CAST(pos_t AS DOUBLE) + 2.5))
           - ((CAST(n_neg AS DOUBLE) + 0.5) / (CAST(neg_t AS DOUBLE) + 2.5))
               AS pdiff
    FROM c, t)
SELECT event_type, n_pos, n_neg,
       CAST(ROUND(woe * 1000000, 0) AS BIGINT) AS woe_micro,
       CAST(SUM(CAST(ROUND(pdiff * woe * 1000000, 0) AS BIGINT)) OVER ()
            AS BIGINT) AS iv_micro
FROM w
""",
)
def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence encoding + Information Value per event_type
    against the binary target ``value >= 50`` (~39% positive on the
    fixture) — the classic supervised categorical encoder and its
    feature-screening statistic (Siddiqi 2006, credit-scorecard WOE/IV;
    the same smoothing idea as Micci-Barreca 2001 target encoding,
    already registered as ``feature_target_encoding``, but log-odds
    scaled and with the global IV diagnostic). Laplace 0.5 per cell
    (K=5 categories -> +2.5 on totals) keeps zero cells finite.

    Integerization: WOE and the per-category IV contribution are rounded
    to micro units BEFORE the IV sum, so both engines sum identical
    integers (the established 6dp-transcendental pattern — ``LN`` differs
    by <= 1 ulp between libm and JVM, invisible at 1e-6 granularity).
    Plan shape: one hash aggregate over events (map-side combine), then
    two 1-row ``crossJoin(broadcast(...))`` stats frames — no window
    over an unpartitioned frame, no second scan of events."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.when(F.col("value") >= 50, F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    c = e.groupBy("event_type").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).cast("bigint").alias("n_neg"),
    )
    t = c.agg(
        F.sum("n_pos").cast("bigint").alias("__pos_t"),
        F.sum("n_neg").cast("bigint").alias("__neg_t"),
    )
    p_pos = (F.col("n_pos").cast("double") + F.lit(0.5)) / (
        F.col("__pos_t").cast("double") + F.lit(2.5)
    )
    p_neg = (F.col("n_neg").cast("double") + F.lit(0.5)) / (
        F.col("__neg_t").cast("double") + F.lit(2.5)
    )
    woe = F.log(p_pos / p_neg)
    pdiff = p_pos - p_neg
    wm = c.crossJoin(F.broadcast(t)).select(
        "event_type",
        "n_pos",
        "n_neg",
        F.round(woe * F.lit(1000000), 0).cast("bigint").alias("woe_micro"),
        F.round(pdiff * woe * F.lit(1000000), 0)
        .cast("bigint")
        .alias("__contrib"),
    )
    iv = wm.agg(F.sum("__contrib").cast("bigint").alias("iv_micro"))
    return wm.select("event_type", "n_pos", "n_neg", "woe_micro").crossJoin(
        F.broadcast(iv)
    )


@query(
    "eval_mutual_information",
    oracle="""
WITH e AS (
    SELECT event_type AS x,
           LEAST(9, CAST(FLOOR(value / 10) AS BIGINT)) AS yb
    FROM events),
j AS (SELECT x, yb, CAST(COUNT(*) AS BIGINT) AS n_xy FROM e GROUP BY 1, 2),
mx AS (SELECT x, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM j GROUP BY 1),
my AS (SELECT yb, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM j GROUP BY 1),
tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM j)
SELECT tot.n AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CAST(ROUND((CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))
            * LN((CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE))
                 / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))
            * 1000000, 0) AS BIGINT)) AS BIGINT) AS mi_micronats
FROM j JOIN mx USING (x) JOIN my USING (yb) CROSS JOIN tot
GROUP BY tot.n
""",
)
def eval_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(X;Y) in micronats between event_type and the
    decile-binned value (LEAST(9, value DIV 10) — value is ~Exp(50), so
    the cap folds the tail into the top bin), the standard
    feature-vs-target dependence screen (Cover & Thomas ch. 2; what
    sklearn's ``mutual_info_score`` computes on a contingency table).

    Plan shape: ONE hash aggregate builds the contingency table (at most
    |X| x 10 cells — tiny whatever the row count), marginals re-aggregate
    the CELLS not the rows, and both marginals plus the 1-row total
    broadcast back onto the cell frame: events is scanned exactly once.
    Per-cell contributions are micro-rounded before the sum so both
    engines add identical integers."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.col("event_type").alias("x"),
        F.least(
            F.lit(9).cast("bigint"), F.floor(F.col("value") / 10)
        ).alias("yb"),
    )
    j = e.groupBy("x", "yb").agg(F.count(F.lit(1)).alias("n_xy"))
    mx = j.groupBy("x").agg(F.sum("n_xy").cast("bigint").alias("n_x"))
    my = j.groupBy("yb").agg(F.sum("n_xy").cast("bigint").alias("n_y"))
    tot = j.agg(F.sum("n_xy").cast("bigint").alias("n"))
    contrib = (
        F.round(
            (F.col("n_xy").cast("double") / F.col("n").cast("double"))
            * F.log(
                (F.col("n_xy").cast("double") * F.col("n").cast("double"))
                / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
            )
            * F.lit(1000000),
            0,
        )
        .cast("bigint")
    )
    return (
        j.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "yb")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("n").alias("n_rows"))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(contrib).cast("bigint").alias("mi_micronats"),
        )
    )


@query(
    "eval_brier_decomposition",
    oracle="""
WITH e AS (
    SELECT CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v6,
           CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS y
    FROM events),
m AS (SELECT MAX(v6) AS max6 FROM e),
s AS (SELECT (v6 * 1000000) // m.max6 AS score_ppm, y FROM e, m),
b AS (
    SELECT LEAST(9, score_ppm // 100000) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_k,
           CAST(SUM(score_ppm) AS BIGINT) AS sum_score,
           CAST(SUM(y) AS BIGINT) AS sum_y
    FROM s GROUP BY 1),
bb AS (
    SELECT bin, n_k, sum_score // n_k AS pbar_ppm,
           (sum_y * 1000000) // n_k AS ybar_k_ppm
    FROM b),
g AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS sum_y,
           CAST(SUM((score_ppm - y * 1000000) * (score_ppm - y * 1000000))
                AS BIGINT) AS brier_num
    FROM s),
gg AS (SELECT n, brier_num, (sum_y * 1000000) // n AS ybar_ppm FROM g)
SELECT gg.n AS n_rows,
       brier_num // (gg.n * 1000000) AS brier_micro,
       CAST(SUM(n_k * (pbar_ppm - ybar_k_ppm) * (pbar_ppm - ybar_k_ppm))
            AS BIGINT) // (gg.n * 1000000) AS reliability_micro,
       CAST(SUM(n_k * (ybar_k_ppm - ybar_ppm) * (ybar_k_ppm - ybar_ppm))
            AS BIGINT) // (gg.n * 1000000) AS resolution_micro,
       (ybar_ppm * (1000000 - ybar_ppm)) // 1000000 AS uncertainty_micro
FROM bb CROSS JOIN gg
GROUP BY gg.n, brier_num, ybar_ppm
""",
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score — reliability
    (calibration), resolution, and uncertainty over 10 equal-width score
    bins — for the max-normalized event value as a pseudo-probability of
    the 'purchase' label. The model-eval companion to the registered
    ``eval_calibration_bins``: BS = REL - RES + UNC, the standard
    verification identity (exact over the binned estimator; our
    integer-ppm floors truncate each term independently, identically in
    both engines).

    All-integer ppm arithmetic end-to-end (scores max-normalized to
    [0, 1e6], means as floor-divided ppm) — no doubles anywhere, so the
    oracle match is exact by construction. Plan shape: one 1-row max
    frame broadcast onto the scan, one 10-bin hash aggregate + one
    global aggregate (both map-side combinable), then a 10x1 broadcast
    cross join — two scans of events total, no wide shuffle (the bin
    key has 10 values)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.floor(F.col("value") * F.lit(1000000.0)).alias("v6"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("y"),
    )
    m = e.agg(F.max("v6").alias("__max6"))
    s = e.crossJoin(F.broadcast(m)).select(
        F.expr("(v6 * 1000000) DIV __max6").alias("score_ppm"), "y"
    )
    b = s.groupBy(
        F.least(F.lit(9).cast("bigint"), F.expr("score_ppm DIV 100000")).alias(
            "__bin"
        )
    ).agg(
        F.count(F.lit(1)).alias("__n_k"),
        F.sum("score_ppm").alias("__sum_score"),
        F.sum("y").alias("__sum_y"),
    )
    bb = b.select(
        "__n_k",
        F.expr("__sum_score DIV __n_k").alias("__pbar_ppm"),
        F.expr("(__sum_y * 1000000) DIV __n_k").alias("__ybar_k_ppm"),
    )
    g = s.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("y").alias("__sum_y_t"),
        F.sum(
            F.expr("(score_ppm - y * 1000000) * (score_ppm - y * 1000000)")
        ).alias("__brier_num"),
    )
    gg = g.select(
        "__n",
        "__brier_num",
        F.expr("(__sum_y_t * 1000000) DIV __n").alias("__ybar_ppm"),
    )
    return (
        bb.crossJoin(F.broadcast(gg))
        .groupBy("__n", "__brier_num", "__ybar_ppm")
        .agg(
            F.sum(
                F.expr(
                    "__n_k * (__pbar_ppm - __ybar_k_ppm)"
                    " * (__pbar_ppm - __ybar_k_ppm)"
                )
            ).alias("__rel_num"),
            F.sum(
                F.expr(
                    "__n_k * (__ybar_k_ppm - __ybar_ppm)"
                    " * (__ybar_k_ppm - __ybar_ppm)"
                )
            ).alias("__res_num"),
        )
        .select(
            F.col("__n").alias("n_rows"),
            F.expr("__brier_num DIV (__n * 1000000)").alias("brier_micro"),
            F.expr("__rel_num DIV (__n * 1000000)").alias(
                "reliability_micro"
            ),
            F.expr("__res_num DIV (__n * 1000000)").alias("resolution_micro"),
            F.expr("(__ybar_ppm * (1000000 - __ybar_ppm)) DIV 1000000").alias(
                "uncertainty_micro"
            ),
        )
    )


@query(
    "ts_mann_kendall",
    oracle="""
WITH d AS (
    SELECT event_type, DATE_TRUNC('day', ts) AS day,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2),
p AS (
    SELECT a.event_type,
           CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1
                         WHEN b.cnt < a.cnt THEN -1
                         ELSE 0 END) AS BIGINT) AS s_stat
    FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day
    GROUP BY 1),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM d GROUP BY 1),
tie AS (
    SELECT event_type,
           CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
    FROM (SELECT event_type, cnt, CAST(COUNT(*) AS BIGINT) AS t
          FROM d GROUP BY 1, 2)
    GROUP BY 1),
v AS (
    SELECT n.event_type, n_days, COALESCE(s_stat, 0) AS s_stat,
           n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18
    FROM n JOIN tie USING (event_type) LEFT JOIN p USING (event_type))
SELECT event_type, n_days, s_stat, var18,
       CAST(ROUND(CASE WHEN s_stat > 0
                       THEN (CAST(s_stat AS DOUBLE) - 1.0)
                            / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                       WHEN s_stat < 0
                       THEN (CAST(s_stat AS DOUBLE) + 1.0)
                            / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                       ELSE 0.0 END * 1000000, 0) AS BIGINT) AS z_micro,
       CASE WHEN s_stat > 0 THEN 'increasing'
            WHEN s_stat < 0 THEN 'decreasing'
            ELSE 'flat' END AS trend
FROM v
""",
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall non-parametric trend test (Mann 1945; Kendall 1975)
    on the daily event count per event_type: the S statistic
    (sum of sign(later - earlier) over all day pairs), the tie-corrected
    variance numerator ``var18 = 18 * Var(S)`` (kept as the exact
    integer ``n(n-1)(2n+5) - sum t(t-1)(2t+5)``), and the
    continuity-corrected z in micro units. The standard "is this metric
    drifting?" monitor for pipeline health dashboards — rank-based, so
    robust to the heavy-tailed counts a mean-slope fit would chase.

    Plan shape: the day rollup is one combine-friendly aggregate that
    collapses the row count to (types x days) BEFORE the pairwise stage,
    so the self-join compares days, not events — O(days^2) per type with
    days bounded by the calendar, types parallel across the cluster, and
    the equi-key on event_type keeps it a hash/merge join, never a
    cartesian. z's SQRT is the one double op, micro-rounded per the
    house transcendental pattern."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a = d.select(
        "event_type", F.col("day").alias("__da"), F.col("cnt").alias("__ca")
    )
    b = d.select(
        F.col("event_type").alias("__et"),
        F.col("day").alias("__db"),
        F.col("cnt").alias("__cb"),
    )
    p = (
        a.join(
            b,
            (F.col("event_type") == F.col("__et"))
            & (F.col("__da") < F.col("__db")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("__cb") > F.col("__ca"), 1)
                .when(F.col("__cb") < F.col("__ca"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    tie = (
        d.groupBy("event_type", "cnt")
        .agg(F.count(F.lit(1)).alias("__t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("__t * (__t - 1) * (2 * __t + 5)")).alias(
                "__tie_term"
            )
        )
    )
    v = (
        n.join(tie, "event_type")
        .join(p, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            F.coalesce(F.col("s_stat"), F.lit(0)).cast("bigint").alias(
                "s_stat"
            ),
            F.expr(
                "n_days * (n_days - 1) * (2 * n_days + 5) - __tie_term"
            ).alias("var18"),
        )
    )
    z = F.expr(
        "CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)"
        " / SQRT(CAST(var18 AS DOUBLE) / 18.0)"
        " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)"
        " / SQRT(CAST(var18 AS DOUBLE) / 18.0)"
        " ELSE 0.0 END"
    )
    return v.select(
        "event_type",
        "n_days",
        "s_stat",
        "var18",
        F.round(z * F.lit(1000000), 0).cast("bigint").alias("z_micro"),
        F.when(F.col("s_stat") > 0, F.lit("increasing"))
        .when(F.col("s_stat") < 0, F.lit("decreasing"))
        .otherwise(F.lit("flat"))
        .alias("trend"),
    )


@query(
    "eval_mann_whitney",
    # rank-sum entirely in integers: average ranks are half-integers, so
    # everything is carried x2 (r1_x2, u1_x2); the only doubles are the
    # final variance/z, micro-rounded per the house pattern.
    oracle="""
WITH e AS (
    SELECT value AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
    FROM events WHERE event_type IN ('purchase', 'click')),
g AS (
    SELECT v, CAST(SUM(a) AS BIGINT) AS c1,
           CAST(SUM(1 - a) AS BIGINT) AS c2
    FROM e GROUP BY 1),
c AS (
    SELECT v, c1, c2, c1 + c2 AS t,
           CAST(COALESCE(SUM(c1 + c2) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum_prev
    FROM g),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n_a,
             CAST(SUM(c2) AS BIGINT) AS n_b FROM g),
r AS (SELECT CAST(SUM(c1 * (2 * cum_prev + t + 1)) AS BIGINT) AS r1_x2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cubes
      FROM c),
d AS (
    SELECT n_a, n_b, tie_cubes,
           (2 * n_a * n_b + n_a * (n_a + 1) - r1_x2) AS u1_x2,
           (2 * n_a * n_b + n_a * (n_a + 1) - r1_x2) - n_a * n_b AS numer_x2,
           (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
           * (CAST(n_a + n_b + 1 AS DOUBLE)
              - CAST(tie_cubes AS DOUBLE)
                / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))
               AS var_u
    FROM n CROSS JOIN r)
SELECT n_a, n_b, u1_x2, tie_cubes,
       CAST(ROUND(CASE WHEN numer_x2 > 0
                       THEN (CAST(numer_x2 - 1 AS DOUBLE) / 2.0) / SQRT(var_u)
                       WHEN numer_x2 < 0
                       THEN (CAST(numer_x2 + 1 AS DOUBLE) / 2.0) / SQRT(var_u)
                       ELSE 0.0 END * 1000000, 0) AS BIGINT) AS z_micro
FROM d
""",
)
def eval_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947) comparing the
    value distribution of 'purchase' vs 'click' events — the
    non-parametric two-sample location test (the KS drift monitor's
    sup-distance sibling, sensitive to median shift rather than any
    shape difference). Average ranks over ties are computed EXACTLY in
    integers by carrying everything doubled (``u1_x2 = 2*U1``); the
    tie-corrected variance and continuity-corrected z are the only
    doubles, micro-rounded.

    Scale shape (same as ``quality_ks_drift``): collapse to the
    distinct-value frame FIRST (one combine-friendly aggregate), then
    rank-cumulate there — the global-order window runs over distinct
    values, not rows, and U falls out of one pass. Verified against an
    independent Python reference in tests."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
    )
    g = e.groupBy("v").agg(
        F.sum("a").cast("bigint").alias("c1"),
        F.sum(F.lit(1) - F.col("a")).cast("bigint").alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("t"),
        F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(w), F.lit(0))
        .cast("bigint")
        .alias("cum_prev"),
    )
    r = c.agg(
        F.sum(
            F.col("c1") * (2 * F.col("cum_prev") + F.col("t") + 1)
        )
        .cast("bigint")
        .alias("r1_x2"),
        F.sum(F.expr("t * t * t - t")).cast("bigint").alias("tie_cubes"),
    )
    n = g.agg(
        F.sum("c1").cast("bigint").alias("n_a"),
        F.sum("c2").cast("bigint").alias("n_b"),
    )
    d = n.crossJoin(F.broadcast(r)).select(
        "n_a",
        "n_b",
        "tie_cubes",
        F.expr("2 * n_a * n_b + n_a * (n_a + 1) - r1_x2").alias("u1_x2"),
        F.expr(
            "(2 * n_a * n_b + n_a * (n_a + 1) - r1_x2) - n_a * n_b"
        ).alias("numer_x2"),
        F.expr(
            "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)"
            " * (CAST(n_a + n_b + 1 AS DOUBLE)"
            "    - CAST(tie_cubes AS DOUBLE)"
            "      / (CAST(n_a + n_b AS DOUBLE)"
            "         * CAST(n_a + n_b - 1 AS DOUBLE)))"
        ).alias("var_u"),
    )
    return d.select(
        "n_a",
        "n_b",
        "u1_x2",
        "tie_cubes",
        F.round(
            F.expr(
                "CASE WHEN numer_x2 > 0"
                " THEN (CAST(numer_x2 - 1 AS DOUBLE) / 2.0) / SQRT(var_u)"
                " WHEN numer_x2 < 0"
                " THEN (CAST(numer_x2 + 1 AS DOUBLE) / 2.0) / SQRT(var_u)"
                " ELSE 0.0 END"
            )
            * F.lit(1000000),
            0,
        )
        .cast("bigint")
        .alias("z_micro"),
    )


@query(
    "eval_welch_ttest",
    # sums of v6 and v6^2 are exact integers (HUGEINT / DECIMAL(38,0));
    # doubles appear only when forming means/variances from them, with
    # textually identical expressions on both engines.
    oracle="""
WITH e AS (
    SELECT CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v6,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
    FROM events WHERE event_type IN ('purchase', 'click')),
s AS (
    SELECT a, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(v6) AS s1, SUM(v6 * v6) AS s2
    FROM e GROUP BY 1),
p AS (
    SELECT MAX(CASE WHEN a = 1 THEN n END) AS n_a,
           MAX(CASE WHEN a = 0 THEN n END) AS n_b,
           MAX(CASE WHEN a = 1 THEN CAST(s1 AS DOUBLE) END) AS sa1,
           MAX(CASE WHEN a = 0 THEN CAST(s1 AS DOUBLE) END) AS sb1,
           MAX(CASE WHEN a = 1 THEN CAST(s2 AS DOUBLE) END) AS sa2,
           MAX(CASE WHEN a = 0 THEN CAST(s2 AS DOUBLE) END) AS sb2,
           MAX(CASE WHEN a = 1 THEN CAST(s1 AS HUGEINT) END) AS ia1,
           MAX(CASE WHEN a = 0 THEN CAST(s1 AS HUGEINT) END) AS ib1
    FROM s),
d AS (
    SELECT n_a, n_b,
           CAST(ia1 // n_a AS BIGINT) AS mean_a_micro,
           CAST(ib1 // n_b AS BIGINT) AS mean_b_micro,
           (sa2 - sa1 * sa1 / CAST(n_a AS DOUBLE))
               / (CAST(n_a AS DOUBLE) - 1.0) AS va,
           (sb2 - sb1 * sb1 / CAST(n_b AS DOUBLE))
               / (CAST(n_b AS DOUBLE) - 1.0) AS vb,
           sa1 / CAST(n_a AS DOUBLE) - sb1 / CAST(n_b AS DOUBLE) AS mdiff
    FROM p)
SELECT n_a, n_b, mean_a_micro, mean_b_micro,
       CAST(ROUND(mdiff / SQRT(va / CAST(n_a AS DOUBLE)
                               + vb / CAST(n_b AS DOUBLE))
                  * 1000000, 0) AS BIGINT) AS t_micro,
       CAST(ROUND((va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
                  * (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
                  / ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))
                         / (CAST(n_a AS DOUBLE) - 1.0)
                     + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))
                         / (CAST(n_b AS DOUBLE) - 1.0))
                  * 1000, 0) AS BIGINT) AS df_milli
FROM d
""",
)
def eval_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (Welch 1947) on the micro-
    integerized value of 'purchase' vs 'click' events, with the
    Welch-Satterthwaite effective degrees of freedom in milli units —
    the parametric companion to ``eval_mann_whitney`` (same contrast,
    mean-shift instead of rank-shift). Order-independence: the naive
    float sum-of-squares would differ across partitionings, so values
    are floored to micro integers and Sum(v6)/Sum(v6^2) are EXACT
    (DECIMAL(38,0) on Spark, HUGEINT on DuckDB); means/variances then
    form from those exact integers with textually identical double
    expressions. One aggregate over the filtered scan, a 2-row pivot,
    zero joins — embarrassingly scalable."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        F.floor(F.col("value") * F.lit(1000000.0)).alias("v6"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
    )
    s = e.groupBy("a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v6").alias("s1"),
        F.sum((F.col("v6") * F.col("v6")).cast("decimal(38,0)")).alias("s2"),
    )
    p = s.agg(
        F.max(F.when(F.col("a") == 1, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("a") == 0, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("a") == 1, F.col("s1").cast("double"))).alias(
            "sa1"
        ),
        F.max(F.when(F.col("a") == 0, F.col("s1").cast("double"))).alias(
            "sb1"
        ),
        F.max(F.when(F.col("a") == 1, F.col("s2").cast("double"))).alias(
            "sa2"
        ),
        F.max(F.when(F.col("a") == 0, F.col("s2").cast("double"))).alias(
            "sb2"
        ),
        F.max(F.when(F.col("a") == 1, F.col("s1"))).alias("ia1"),
        F.max(F.when(F.col("a") == 0, F.col("s1"))).alias("ib1"),
    )
    d = p.select(
        "n_a",
        "n_b",
        F.expr("CAST(ia1 DIV n_a AS BIGINT)").alias("mean_a_micro"),
        F.expr("CAST(ib1 DIV n_b AS BIGINT)").alias("mean_b_micro"),
        F.expr(
            "(sa2 - sa1 * sa1 / CAST(n_a AS DOUBLE))"
            " / (CAST(n_a AS DOUBLE) - 1.0)"
        ).alias("va"),
        F.expr(
            "(sb2 - sb1 * sb1 / CAST(n_b AS DOUBLE))"
            " / (CAST(n_b AS DOUBLE) - 1.0)"
        ).alias("vb"),
        F.expr(
            "sa1 / CAST(n_a AS DOUBLE) - sb1 / CAST(n_b AS DOUBLE)"
        ).alias("mdiff"),
    )
    return d.select(
        "n_a",
        "n_b",
        "mean_a_micro",
        "mean_b_micro",
        F.round(
            F.expr(
                "mdiff / SQRT(va / CAST(n_a AS DOUBLE)"
                " + vb / CAST(n_b AS DOUBLE))"
            )
            * F.lit(1000000),
            0,
        )
        .cast("bigint")
        .alias("t_micro"),
        F.round(
            F.expr(
                "(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))"
                " * (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))"
                " / ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))"
                "        / (CAST(n_a AS DOUBLE) - 1.0)"
                "    + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))"
                "        / (CAST(n_b AS DOUBLE) - 1.0))"
            )
            * F.lit(1000),
            0,
        )
        .cast("bigint")
        .alias("df_milli"),
    )


@query(
    "eval_cohens_kappa",
    oracle="""
WITH e AS (
    SELECT CASE WHEN value >= 50 THEN 1 ELSE 0 END AS ra,
           CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END
               AS rb
    FROM events),
c AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ra * rb) AS BIGINT) AS n11,
           CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
           CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
           CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00
    FROM e)
SELECT n AS n_rows, n11 + n00 AS n_agree,
       ((n11 + n00) * 1000000) // n AS po_ppm,
       (((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) * 1000000)
           // (n * n) AS pe_ppm,
       CAST(ROUND((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
                   - CAST((n11 + n10) * (n11 + n01)
                          + (n01 + n00) * (n10 + n00) AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                  / (1.0 - CAST((n11 + n10) * (n11 + n01)
                                + (n01 + n00) * (n10 + n00) AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                  * 1000000, 0) AS BIGINT) AS kappa_micro
FROM c
""",
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) — chance-corrected agreement between
    two binary raters, here the value-threshold labeler (value >= 50)
    vs the type-based labeler (purchase/signup) — the standard
    inter-annotator agreement statistic for LLM labeling and
    preference-data pipelines (a judge panel that only reports raw
    agreement ``po`` overstates itself when the base rates are skewed;
    kappa subtracts the chance floor ``pe``). The agreement table is
    exact integers from one aggregate; po/pe are emitted in ppm and
    kappa in micro units from exactly-representable integer ratios
    (n^2 <= 1e24 is beyond int64 only past ~3e9 rows per side — and the
    double formation is exact below 2^53). One scan, one aggregate,
    no joins."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.when(F.col("value") >= 50, 1).otherwise(0).alias("ra"),
        F.when(F.col("event_type").isin("purchase", "signup"), 1)
        .otherwise(0)
        .alias("rb"),
    )
    c = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("ra * rb")).cast("bigint").alias("n11"),
        F.sum(F.expr("ra * (1 - rb)")).cast("bigint").alias("n10"),
        F.sum(F.expr("(1 - ra) * rb")).cast("bigint").alias("n01"),
        F.sum(F.expr("(1 - ra) * (1 - rb)")).cast("bigint").alias("n00"),
    )
    return c.select(
        F.col("n").alias("n_rows"),
        F.expr("n11 + n00").alias("n_agree"),
        F.expr("((n11 + n00) * 1000000) DIV n").alias("po_ppm"),
        F.expr(
            "(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
            " * 1000000) DIV (n * n)"
        ).alias("pe_ppm"),
        F.round(
            F.expr(
                "(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)"
                " - CAST((n11 + n10) * (n11 + n01)"
                "        + (n01 + n00) * (n10 + n00) AS DOUBLE)"
                "   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
                " / (1.0 - CAST((n11 + n10) * (n11 + n01)"
                "              + (n01 + n00) * (n10 + n00) AS DOUBLE)"
                "   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
            )
            * F.lit(1000000),
            0,
        )
        .cast("bigint")
        .alias("kappa_micro"),
    )


@query(
    "feature_funnel_stages",
    oracle="""
WITH mv AS (
    SELECT user_id, MIN(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY 1),
mc AS (
    SELECT e.user_id, MIN(e.ts) AS t_click
    FROM events e JOIN mv USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > mv.t_view
          AND e.ts <= mv.t_view + INTERVAL 24 HOUR
    GROUP BY 1),
mp AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase
    FROM events e JOIN mc USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > mc.t_click
          AND e.ts <= mc.t_click + INTERVAL 24 HOUR
    GROUP BY 1),
u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
cv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_view FROM mv),
cc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_click FROM mc),
cp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchase FROM mp)
SELECT n_users, n_view, n_click, n_purchase,
       (n_view * 1000000) // n_users AS view_ppm,
       CASE WHEN n_view > 0 THEN (n_click * 1000000) // n_view
            ELSE CAST(0 AS BIGINT) END AS click_given_view_ppm,
       CASE WHEN n_click > 0 THEN (n_purchase * 1000000) // n_click
            ELSE CAST(0 AS BIGINT) END AS purchase_given_click_ppm
FROM u CROSS JOIN cv CROSS JOIN cc CROSS JOIN cp
""",
)
def feature_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase with a 24 h
    step window: a user reaches a stage only via an event STRICTLY after
    their previous-stage timestamp and within 24 h of it — the sequenced
    definition product analytics means by "funnel" (an unordered
    exists-per-type count would overcount users who purchased before
    ever viewing). Emits absolute stage counts plus per-step conversion
    in ppm (measured 150 -> 60 -> 25 of 150 users at sf0.01 — the window
    is what makes the fixture discriminate).

    Plan shape: three per-user min-timestamp aggregates chained by
    equi-joins on user_id (each join keyed and combine-friendly; at
    100 TB these co-partition under a user_id bucketing), then three
    1-row counts broadcast onto the user total. The event scan is read
    once per stage with only (user_id, ts, event_type) columns pruned."""
    ev = load_table(spark, sf_dir, "events")
    mv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    mc = (
        ev.filter(F.col("event_type") == "click")
        .join(mv, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    mp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(mc, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    u = ev.agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    cv = mv.agg(F.count(F.lit(1)).alias("n_view"))
    cc = mc.agg(F.count(F.lit(1)).alias("n_click"))
    cp = mp.agg(F.count(F.lit(1)).alias("n_purchase"))
    return (
        u.crossJoin(F.broadcast(cv))
        .crossJoin(F.broadcast(cc))
        .crossJoin(F.broadcast(cp))
        .select(
            "n_users",
            "n_view",
            "n_click",
            "n_purchase",
            F.expr("(n_view * 1000000) DIV n_users").alias("view_ppm"),
            F.expr(
                "CASE WHEN n_view > 0 THEN (n_click * 1000000) DIV n_view"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("click_given_view_ppm"),
            F.expr(
                "CASE WHEN n_click > 0 THEN (n_purchase * 1000000) DIV n_click"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("purchase_given_click_ppm"),
        )
    )


@query(
    "feature_cohort_retention",
    oracle="""
WITH f AS (
    SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort
    FROM events WHERE event_type = 'purchase' GROUP BY 1),
a AS (
    SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk
    FROM events WHERE event_type = 'purchase'),
sz AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1),
r AS (
    SELECT f.cohort,
           CAST(DATE_DIFF('day', f.cohort, a.wk) // 7 AS BIGINT)
               AS offset_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM a JOIN f USING (user_id) GROUP BY 1, 2)
SELECT strftime(r.cohort, '%Y-%m-%d') AS cohort_week, offset_weeks, n_active,
       cohort_size, (n_active * 1000000) // cohort_size AS retention_ppm
FROM r JOIN sz USING (cohort)
""",
)
def feature_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle on purchase activity: users are
    cohorted by the ISO week of their FIRST purchase, and each (cohort,
    offset-in-weeks) cell counts users with any purchase in that week,
    as a ppm of the cohort size — the standard retention curve behind
    every product dashboard (purchase-based rather than any-event-based
    because the fixture's users emit events continuously; first PURCHASE
    varies, so cohorts and decay actually discriminate: two cohorts with
    143->90 and 7->2 decay at sf0.01).

    Plan shape: both the cohort assignment and the activity set are
    per-user combine-friendly aggregates over the same filtered scan;
    the join back is keyed on user_id (bucketing co-partitions it at
    scale) and the output is |cohorts| x |offsets| rows — tiny whatever
    the input. Week truncation is engine-portable (both Spark and
    DuckDB date_trunc('week') start Monday); offsets divide exactly
    because both endpoints are week-truncated."""
    ev = load_table(spark, sf_dir, "events")
    pe = ev.filter(F.col("event_type") == "purchase")
    f = pe.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    a = pe.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    sz = f.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    r = (
        a.join(f, "user_id")
        .groupBy(
            "cohort",
            F.expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)").alias(
                "offset_weeks"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return r.join(sz, "cohort").select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        "offset_weeks",
        "n_active",
        "cohort_size",
        F.expr("(n_active * 1000000) DIV cohort_size").alias(
            "retention_ppm"
        ),
    )


@query(
    "ts_theil_sen",
    # exact integer median: the two middle order statistics are summed
    # (x2 for odd counts), so no interpolation semantics can diverge
    # between engines; ties in slope_micro are safe because the k-th
    # order statistic is tie-order-independent.
    oracle="""
WITH d AS (
    SELECT event_type, DATE_TRUNC('day', ts) AS day,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2),
p AS (
    SELECT a.event_type,
           CAST(ROUND(CAST(b.cnt - a.cnt AS DOUBLE)
                / CAST(DATE_DIFF('day', a.day, b.day) AS DOUBLE)
                * 1000000, 0) AS BIGINT) AS slope_micro
    FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day),
rk AS (
    SELECT event_type, slope_micro,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY slope_micro) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
    FROM p)
SELECT event_type, n_pairs,
       CAST(SUM(CASE WHEN n_pairs % 2 = 1 AND rn = (n_pairs + 1) // 2
                     THEN 2 * slope_micro
                     WHEN n_pairs % 2 = 0
                          AND rn IN (n_pairs // 2, n_pairs // 2 + 1)
                     THEN slope_micro
                     ELSE 0 END) AS BIGINT) AS sen_slope_x2_micro
FROM rk GROUP BY 1, 2
""",
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope estimator (Theil 1950; Sen 1968) on the daily
    event count per event_type: the median of all pairwise slopes
    (cnt_j - cnt_i) / (day_j - day_i), doubled to stay integer-exact
    (``sen_slope_x2_micro`` = twice the median, in micro events/day).
    The robust companion to ``ts_mann_kendall``: MK answers IS there a
    monotone trend, Theil-Sen answers HOW STEEP, with a 29.3% breakdown
    point against the outlier days a least-squares slope would chase.

    Plan shape: the same collapsed (type x day) frame as MK feeds the
    O(days^2)-per-type pair stage (days bounded by the calendar, types
    parallel), then the exact median comes from a per-type rank window
    over the PAIRS frame — the order statistic trick used by
    ``agg_exact_median``, no interpolation, no floats except the
    pre-rounded micro slope."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a = d.select(
        "event_type", F.col("day").alias("__da"), F.col("cnt").alias("__ca")
    )
    b = d.select(
        F.col("event_type").alias("__et"),
        F.col("day").alias("__db"),
        F.col("cnt").alias("__cb"),
    )
    p = a.join(
        b,
        (F.col("event_type") == F.col("__et"))
        & (F.col("__da") < F.col("__db")),
    ).select(
        "event_type",
        F.round(
            (F.col("__cb") - F.col("__ca")).cast("double")
            / F.datediff(F.col("__db"), F.col("__da")).cast("double")
            * F.lit(1000000),
            0,
        )
        .cast("bigint")
        .alias("slope_micro"),
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro")
    rk = p.select(
        "event_type",
        "slope_micro",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("bigint")
        .alias("n_pairs"),
    )
    return rk.groupBy("event_type", "n_pairs").agg(
        F.sum(
            F.expr(
                "CASE WHEN n_pairs % 2 = 1 AND rn = (n_pairs + 1) DIV 2"
                " THEN 2 * slope_micro"
                " WHEN n_pairs % 2 = 0"
                "      AND rn IN (n_pairs DIV 2, n_pairs DIV 2 + 1)"
                " THEN slope_micro"
                " ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("sen_slope_x2_micro")
    )


def _hits_oracle(iterations: int) -> str:
    """Declarative replay of the integer HITS loop — one authority and
    one hub half-step (each with its exact-integer max renormalization)
    per iteration, identical arithmetic to ``operators/graph.py::
    hits_int`` (`//` = Spark's DIV on non-negative scores)."""
    cte = [
        """
WITH e AS (
    SELECT DISTINCT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
h0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS h FROM e)"""
    ]
    for i in range(1, iterations + 1):
        prev_h = "h0" if i == 1 else f"h{i - 1}"
        cte.append(
            f"""
ar{i} AS (SELECT e.dst AS node, CAST(SUM(p.h) AS BIGINT) AS raw
          FROM e JOIN {prev_h} p ON p.node = e.src GROUP BY 1),
am{i} AS (SELECT MAX(raw) AS m FROM ar{i}),
a{i} AS (SELECT node, (raw * 1000000) // m AS a FROM ar{i}, am{i}),
hr{i} AS (SELECT e.src AS node, CAST(SUM(p.a) AS BIGINT) AS raw
          FROM e JOIN a{i} p ON p.node = e.dst GROUP BY 1),
hm{i} AS (SELECT MAX(raw) AS m FROM hr{i}),
h{i} AS (SELECT node, (raw * 1000000) // m AS h FROM hr{i}, hm{i})"""
        )
    return (
        ",".join(cte)
        + f"""
SELECT 'customer' AS kind, node // 2 AS key, 'hub' AS side,
       h AS score_micro
FROM h{iterations}
UNION ALL
SELECT 'supplier' AS kind, node // 2 AS key, 'authority' AS side,
       a AS score_micro
FROM a{iterations}
"""
    )


@query("graph_hits_int", oracle=_hits_oracle(3))
def graph_hits_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the directed
    customer→supplier trade graph — 'which customers are the broadest
    buyers (hubs) and which suppliers the most sought-after
    (authorities)'. The third integer-deterministic iterative graph
    algorithm (after connected components and PageRank): float HITS
    L2-normalizes each half-step, which no SQL replay can reproduce
    bit-exactly, so ``operators/graph.py::hits_int`` renormalizes by the
    exact integer MAX instead (the power iteration's fixed point is
    scale-free, so the eigenvector direction is unchanged) and the
    oracle replays all three iterations declaratively — every score
    matches exactly, no tolerance. Same scale schedule as
    ``graph_pagerank_int``: O(k·|E|) with co-partitioned edge joins,
    map-side combined sums, 1-row broadcast max frames, per-round
    checkpointing."""
    from featurestore_for_joycastle_java_spark.operators.graph import hits_int

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    r = hits_int(e, iterations=3)
    return r.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.expr("node DIV 2").alias("key"),
        "side",
        "score_micro",
    )


@query(
    "sim_gram_matrix",
    oracle="""
WITH x AS (
    SELECT vec_id, i,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
               AS v6
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors FROM embeddings)
SELECT a.i AS i, b.i AS j, n.n_vectors,
       CAST(SUM(a.v6 * b.v6) AS BIGINT) AS gram_micro2
FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
CROSS JOIN n
GROUP BY 1, 2, 3
""",
)
def sim_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram matrix Σ x xᵀ of the embedding corpus in
    exact micro² integers — the one-pass precursor to PCA / whitening /
    covariance-based drift monitors (subtract the mean outer product to
    get covariance; power-iterate for the top component). Elements are
    floored to micro integers so the d(d+1)/2 cell sums are EXACT
    (DECIMAL(38,0) on Spark, HUGEINT on DuckDB) — the float version
    would be partitioning-dependent in the last ulps.

    Scale shape (r12 opt): per-task partial Grams via one NumPy int64
    matmul per Arrow batch (``operators/gram.py::gram_cells`` — exact
    Python-int accumulation across batches, guide §4.2), then ONE hash
    aggregate over (#tasks × d(d+1)/2) partial cells — arithmetic
    identical to the previous posexplode + self-equi-join form (which
    pushed 20.5 M joined rows through the row pipeline at sf0.1), with
    the per-partition partial combine done by vectorized native code.
    Output stays d(d+1)/2 = 2080 cells for d = 64, corpus-size-
    independent. Measured interleaved A/B at sf0.1: 2.04 → 0.57 s."""
    from featurestore_for_joycastle_java_spark.operators.gram import (
        gram_cells,
    )

    e = load_table(spark, sf_dir, "embeddings")
    n = e.agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        gram_cells(e, upper_only=True)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("__g"))
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            "n_vectors",
            F.col("__g").cast("bigint").alias("gram_micro2"),
        )
    )
