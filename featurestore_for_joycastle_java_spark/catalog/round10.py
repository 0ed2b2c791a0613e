"""Round-10 additions: six LLM-pipeline / feature-engineering queries
that extend SURVEY §2.3's north-star surface along axes the catalog did
not yet cover — substring-level dedup signal, rule-based quality
filtering, supervised category encoding diagnostics, dependence and
calibration measurement, and non-parametric trend detection.

All six follow the house rules: integer/ppm arithmetic (or 6dp-rounded
doubles where a transcendental is intrinsic), every computed column
aliased identically in Spark and the DuckDB oracle, no row-at-a-time
UDFs, 1-row stats frames joined via ``crossJoin(broadcast(...))``.
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
    materialized. At 100 TB the gram string would be ``xxhash64``-ed
    before the shuffle to bound key width (same trick as
    ``operators/dedup.py``'s fingerprint path); kept as the raw string
    here because the oracle must replay it exactly."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", shingles(F.col("text"), k=8).alias("grams"))
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
