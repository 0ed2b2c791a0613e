"""Round-10e additions: four queries closing diagnostic gaps — the
blocking-quality metrics every entity-resolution pipeline needs before
trusting its clusters, the log₂-bucketed histogram telemetry uses for
heavy-tailed values, an exact rolling median for robust baselines, and
one-level binary-segmentation changepoint localization beside CUSUM's
detection.

Same house rules as the other round-10 continuation modules: exact
integer/micro arithmetic end-to-end (no transcendental anywhere in
this module — the log₂ bucket is ``length(bin(v)) − 1``, exact on both
engines), identical aliases both sides, collapse-to-bounded-frames
before windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "er_blocking_metrics",
    oracle="""
WITH r AS (
    SELECT c_custkey AS record_id, c_name AS nm,
           c_nationkey AS nk, c_acctbal AS ab
    FROM customer
    UNION ALL
    SELECT c_custkey + 1000000, substr(c_name, 1, 17) || 'X',
           c_nationkey, c_acctbal
    FROM customer WHERE c_custkey % 50 = 0),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_records FROM r),
truth AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_true
    FROM customer WHERE c_custkey % 50 = 0),
cand AS (
    SELECT a.record_id AS id_a, b.record_id AS id_b,
           (levenshtein(a.nm, b.nm) <= 1 AND a.ab = b.ab) AS matched
    FROM r a JOIN r b
      ON a.nk = b.nk AND substr(a.nm, 10, 4) = substr(b.nm, 10, 4)
     AND a.record_id < b.record_id),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
           CAST(COUNT(*) FILTER (
               WHERE id_b = id_a + 1000000 AND id_a % 50 = 0)
               AS BIGINT) AS n_true_cand,
           CAST(COUNT(*) FILTER (WHERE matched) AS BIGINT) AS n_matched,
           CAST(COUNT(*) FILTER (
               WHERE matched AND id_b = id_a + 1000000 AND id_a % 50 = 0)
               AS BIGINT) AS n_true_matched
    FROM cand)
SELECT n.n_records, truth.n_true AS n_true_pairs,
       agg.n_cand AS n_candidate_pairs, agg.n_matched AS n_matched_pairs,
       CAST((agg.n_true_cand * 1000000) // truth.n_true AS BIGINT)
           AS pair_completeness_ppm,
       CAST(1000000 - (agg.n_cand * 1000000)
            // (n.n_records * (n.n_records - 1) // 2) AS BIGINT)
           AS reduction_ratio_ppm,
       CAST(CASE WHEN agg.n_matched > 0
            THEN (agg.n_true_matched * 1000000) // agg.n_matched
            ELSE 0 END AS BIGINT) AS precision_ppm,
       CAST((agg.n_true_matched * 1000000) // truth.n_true AS BIGINT)
           AS recall_ppm
FROM n, truth, agg
""",
)
def er_blocking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking- and matcher-quality metrics for the ER pipeline that
    ``er_customer_clusters`` runs (same fixture contract: every 50th
    customer re-enters with a corrupted name; same (nationkey, 4-char
    name slice) blocking; same levenshtein≤1 ∧ exact-acctbal compound
    matcher — the constructions are kept textually in sync): pair
    completeness (how much ground truth the blocking keeps), reduction
    ratio (how much of the n(n−1)/2 pair space it prunes), and the
    matcher's precision/recall against the known synthetic-pair truth —
    the Christen 2012 ("Data Matching", ch. 7) diagnostic quartet. An
    ER pipeline that reports clusters without these numbers can't tell
    'the blocking dropped the matches' from 'the matcher rejected
    them'; this query separates the two failure modes, all in exact
    integer ppm.

    Scale shape: the candidate join is the SAME bounded block join the
    clustering query pays (Σ block² — never n²); truth and totals are
    single aggregates; everything meets in 1-row broadcast frames."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("record_id"),
        F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("ab"),
    )
    dirty = cust.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("record_id"),
        F.concat(F.substring("c_name", 1, 17), F.lit("X")).alias("nm"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("ab"),
    )
    r = base.unionByName(dirty)
    n = r.agg(F.count(F.lit(1)).alias("n_records"))
    truth = cust.filter(F.col("c_custkey") % 50 == 0).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    blocked = r.withColumn("blk", F.substring("nm", 10, 4))
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = a.join(
        b,
        (F.col("a.nk") == F.col("b.nk"))
        & (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.record_id") < F.col("b.record_id")),
    ).select(
        F.col("a.record_id").alias("id_a"),
        F.col("b.record_id").alias("id_b"),
        # acctbal equality FIRST: codegen And short-circuits left-to-
        # right, so the (rare) balance match gates the bounded
        # levenshtein instead of every candidate pair paying it
        (
            (F.col("a.ab") == F.col("b.ab"))
            & (F.levenshtein(F.col("a.nm"), F.col("b.nm"), 1) >= 0)
        ).alias("matched"),
    )
    agg = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand"),
        F.count(
            F.when(
                (F.col("id_b") == F.col("id_a") + 1000000)
                & (F.col("id_a") % 50 == 0),
                1,
            )
        )
        .cast("bigint")
        .alias("n_true_cand"),
        F.count(F.when(F.col("matched"), 1)).cast("bigint").alias("n_matched"),
        F.count(
            F.when(
                F.col("matched")
                & (F.col("id_b") == F.col("id_a") + 1000000)
                & (F.col("id_a") % 50 == 0),
                1,
            )
        )
        .cast("bigint")
        .alias("n_true_matched"),
    )
    return (
        n.crossJoin(F.broadcast(truth))
        .crossJoin(F.broadcast(agg))
        .select(
            "n_records",
            F.col("n_true").alias("n_true_pairs"),
            F.col("n_cand").alias("n_candidate_pairs"),
            F.col("n_matched").alias("n_matched_pairs"),
            F.expr(
                "CAST((n_true_cand * 1000000) DIV n_true AS BIGINT)"
            ).alias("pair_completeness_ppm"),
            F.expr(
                "CAST(1000000 - (n_cand * 1000000)"
                " DIV (n_records * (n_records - 1) DIV 2) AS BIGINT)"
            ).alias("reduction_ratio_ppm"),
            F.expr(
                "CAST(CASE WHEN n_matched > 0"
                " THEN (n_true_matched * 1000000) DIV n_matched"
                " ELSE 0 END AS BIGINT)"
            ).alias("precision_ppm"),
            F.expr(
                "CAST((n_true_matched * 1000000) DIV n_true AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


@query(
    "agg_log2_histogram",
    oracle="""
WITH v AS (
    SELECT event_type,
           CAST(FLOOR(value * 100.0) AS BIGINT) + 1 AS vc
    FROM events)
SELECT event_type,
       CAST(LENGTH(bin(vc)) - 1 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(vc) AS BIGINT) AS lo_cents,
       CAST(MAX(vc) AS BIGINT) AS hi_cents
FROM v GROUP BY 1, 2
""",
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-bucketed value histogram per event type — the HdrHistogram
    / DDSketch bucket layout (Dunning & Ertl; relative-error buckets)
    that telemetry systems use for heavy-tailed quantities, with the
    bucket index computed EXACTLY on both engines as
    ``length(bin(v)) − 1`` = ⌊log₂ v⌋ over cent-integers (+1 shift for
    zero) — no float log anywhere, so no boundary value can land in
    different buckets on different engines. Each bucket carries count
    and exact min/max, which is what makes merged histograms
    re-quantilable downstream.

    Plan shape: ONE map-side-combinable hash aggregate over events;
    output is types × ~⌈log₂ max⌉ rows, corpus-size-independent — the
    mergeable-summary shape (per-partition partial buckets combine
    exactly) a 1000-executor telemetry rollup wants."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        (F.floor(F.col("value") * 100.0).cast("bigint") + 1).alias("vc"),
    )
    return v.groupBy(
        "event_type",
        (F.length(F.bin(F.col("vc"))) - 1).cast("bigint").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("vc").cast("bigint").alias("lo_cents"),
        F.max("vc").cast("bigint").alias("hi_cents"),
    )


@query(
    "ts_rolling_median_7d",
    oracle="""
WITH d AS (
    SELECT event_type, DATE_TRUNC('day', ts) AS day,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2),
w AS (
    SELECT event_type, day, cnt,
           list_sort(list(cnt) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
    FROM d)
SELECT event_type, day, cnt,
       CAST(len(win) AS BIGINT) AS n_window,
       CAST(win[CAST((len(win) + 1) // 2 AS BIGINT)]
            + win[CAST(len(win) // 2 + 1 AS BIGINT)] AS BIGINT)
           AS med7_x2
FROM w
""",
)
def ts_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day median of the daily event count per type,
    as a ×2 integer (the ``agg_exact_median`` convention: lower+upper
    middle order statistics, so even windows need no float midpoint) —
    the robust rolling baseline for ratio/deviation alerts where
    ``window_rolling_7d``'s mean gets dragged by one spike day. The
    window median is computed by sorting the ≤7-element window list
    in both engines — bounded work per row, no percentile UDAF, and
    deterministic because integer sort has no ties to break.

    Plan shape: collapse-first to (type × day), one per-type window
    carrying a ≤7-element array — calendar-bounded rows, constant work
    per row, partition-parallel across types."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    w = d.select(
        "event_type",
        "day",
        "cnt",
        F.array_sort(F.collect_list("cnt").over(w7)).alias("win"),
    )
    return w.select(
        "event_type",
        "day",
        "cnt",
        F.size("win").cast("bigint").alias("n_window"),
        (
            F.element_at("win", F.expr("CAST((size(win) + 1) DIV 2 AS INT)"))
            + F.element_at("win", F.expr("CAST(size(win) DIV 2 + 1 AS INT)"))
        )
        .cast("bigint")
        .alias("med7_x2"),
    )


@query(
    "ts_binary_segmentation",
    oracle="""
WITH d AS (
    SELECT event_type, DATE_TRUNC('day', ts) AS day,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2),
tot AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cnt) AS BIGINT) AS s
    FROM d GROUP BY 1),
c AS (
    SELECT d.event_type, d.day, d.cnt, tot.n, tot.s,
           CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type
                                   ORDER BY d.day) AS BIGINT) AS t,
           CAST(SUM(d.cnt * tot.n - tot.s) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cusum,
           CAST(SUM(d.cnt) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS psum
    FROM d JOIN tot USING (event_type)),
best AS (
    SELECT event_type, day AS split_day, t, cusum, psum, n, s
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY event_type
              ORDER BY ABS(cusum) DESC, t ASC) AS rk
          FROM c WHERE t < n)
    WHERE rk = 1)
SELECT event_type, split_day,
       t AS n_left, n - t AS n_right,
       CAST(ABS(cusum) AS BIGINT) AS cusum_peak,
       CAST(psum // t AS BIGINT) AS mean_left,
       CAST((s - psum) // (n - t) AS BIGINT) AS mean_right
FROM best
""",
)
def ts_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One level of binary-segmentation changepoint LOCALIZATION
    (Scott & Knott 1974; the top split of the recursive scheme) on each
    type's daily counts: the split point maximizing the exact n-scaled
    CUSUM |Σ_{i≤t}(n·xᵢ − S)| (ties → earliest day), with the two
    segment means in exact integer division. ``ts_cusum_changepoint``
    answers IS there a level shift; this answers WHERE, and what the
    before/after levels are — the pair a monitoring pipeline pages
    with. Deeper recursion is the same query applied per segment.

    Everything is exact integers: the n-scaling (n·x − S) avoids the
    float mean, the argmax is a window over calendar-bounded rows, and
    the segment means are truncated integer division (counts are
    non-negative). Collapse-first, type-partitioned windows only.

    Overflow envelope (ADVICE r10, the ``eval_kendall_tau``
    discipline): unlike ``ts_autoperiod`` there is NO squared term —
    the largest intermediate is the prefix CUSUM |Σ(n·x − S)| ≤ n²·C,
    so int64 holds up to C ≈ 7×10¹³ events/day/type over a year
    (n=365). Daily counts anywhere near that are physically
    implausible (10⁸ events/sec sustained), so BIGINT is kept; if the
    envelope is ever approached, escalate the cusum/psum window sums
    to decimal(38,0)/HUGEINT exactly as ts_autoperiod does."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("s")
    )
    j = d.join(F.broadcast(tot), "event_type")
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = j.select(
        "event_type",
        "day",
        "n",
        "s",
        F.row_number().over(w_ord).cast("bigint").alias("t"),
        F.sum(F.col("cnt") * F.col("n") - F.col("s"))
        .over(w_cum)
        .cast("bigint")
        .alias("cusum"),
        F.sum("cnt").over(w_cum).cast("bigint").alias("psum"),
    ).filter(F.col("t") < F.col("n"))
    best = (
        c.groupBy("event_type")
        .agg(
            F.max(
                F.struct(
                    F.abs(F.col("cusum")).alias("ac"),
                    (-F.col("t")).alias("nt"),
                    F.col("day").alias("day"),
                    F.col("psum").alias("psum"),
                    F.col("n").alias("n"),
                    F.col("s").alias("s"),
                )
            ).alias("m")
        )
        .select(
            "event_type",
            F.col("m.day").alias("split_day"),
            (-F.col("m.nt")).alias("t"),
            F.col("m.ac").alias("cusum_peak"),
            F.col("m.psum").alias("psum"),
            F.col("m.n").alias("n"),
            F.col("m.s").alias("s"),
        )
    )
    return best.select(
        "event_type",
        "split_day",
        F.col("t").alias("n_left"),
        (F.col("n") - F.col("t")).alias("n_right"),
        F.col("cusum_peak").cast("bigint"),
        F.expr("CAST(psum DIV t AS BIGINT)").alias("mean_left"),
        F.expr("CAST((s - psum) DIV (n - t) AS BIGINT)").alias("mean_right"),
    )
