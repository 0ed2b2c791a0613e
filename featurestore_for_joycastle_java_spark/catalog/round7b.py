"""Round-7 continuation (batch B): classic analytics shapes the registry
did not cover yet — interval gaps-and-islands merge, Pareto/ABC
classification, Spearman rank correlation, Jensen-Shannon segment drift,
sequential trigram motifs, and an l-diversity privacy audit.

Each one is chosen for a distinct SCALE shape:

- islands merge: per-entity ordered windows (bounded per-user groups);
- ABC: a GLOBAL ordered prefix sum done without a global window
  (``operators.ranks.grouped_prefix_sum`` with one logical group — the
  only single-task window sees <= n_buckets rows);
- Spearman: two exact global average-ranks via the two-pass range-bucket
  ``global_row_number`` (no whole-table ``Window.orderBy``), tie groups
  resolved by the avg-of-row-numbers identity;
- JS divergence / trigrams / l-diversity: plain combine-friendly
  aggregations (map-side partial aggs, one shuffle each).

Cross-engine float discipline (same rules as the rest of the catalog):
monetary values go through exact integer cents (prices are 2-decimal
doubles in the fixtures), ranks are exact halves (sums stay exact in
binary64), and every genuinely-float output (log terms, correlation) is
rounded to 6 decimals on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from featurestore_for_joycastle_java_spark.operators.ranks import (
    global_row_number,
    grouped_prefix_sum,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


# ------------------------------------------------------- gaps & islands


@query(
    "interval_merge_overlaps",
    oracle="""
WITH iv AS (
    SELECT user_id,
           CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) AS start_s,
           CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) + 900 AS end_s
    FROM events),
f AS (
    SELECT user_id, start_s, end_s,
           CASE WHEN MAX(end_s) OVER w IS NULL
                  OR start_s > MAX(end_s) OVER w
                THEN 1 ELSE 0 END AS new_i
    FROM iv
    WINDOW w AS (PARTITION BY user_id ORDER BY start_s, end_s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
g AS (
    SELECT user_id, start_s, end_s,
           CAST(SUM(new_i) OVER (
               PARTITION BY user_id ORDER BY start_s, end_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS island_id
    FROM f)
SELECT user_id, island_id,
       MIN(start_s) AS start_s, MAX(end_s) AS end_s,
       COUNT(*) AS n_events
FROM g GROUP BY user_id, island_id
""",
)
def interval_merge_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merge: each event opens a 15-minute
    activity interval; overlapping/back-to-back intervals per user are
    merged into maximal islands (the classic running-max trick: a row
    starts a new island iff its start exceeds the max end of every
    earlier interval). Unlike ``sessionize_users`` (gap between
    CONSECUTIVE events) this merges by COVERAGE — a long interval can
    swallow several later short ones — the semantics needed for
    on-call/availability windows and validity-range compaction.

    Scale shape: both windows partition by user (bounded per-entity
    groups), ordered by integer epochs; one shuffle on user_id, two
    frame passes over each partition, then a combine-friendly groupBy.
    All arithmetic is integer-exact."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("start_s"),
        (F.unix_timestamp("ts") + 900).alias("end_s"),
    )
    w = Window.partitionBy("user_id").orderBy("start_s", "end_s")
    prev_end = F.max("end_s").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_i",
        F.when(prev_end.isNull() | (F.col("start_s") > prev_end), 1).otherwise(
            0
        ),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_i")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.min("start_s").alias("start_s"),
        F.max("end_s").alias("end_s"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ------------------------------------------------------------ ABC/Pareto


@query(
    "agg_abc_pareto",
    oracle="""
WITH rev AS (
    SELECT l_partkey,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_e4
    FROM lineitem GROUP BY 1),
c AS (
    SELECT l_partkey, rev_e4,
           SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_e4,
           SUM(rev_e4) OVER () AS tot_e4
    FROM rev),
k AS (
    SELECT CASE WHEN cum_e4 * 5 <= tot_e4 * 4 THEN 'A'
                WHEN cum_e4 * 20 <= tot_e4 * 19 THEN 'B'
                ELSE 'C' END AS abc_class,
           rev_e4, tot_e4
    FROM c)
SELECT abc_class,
       COUNT(*) AS n_parts,
       CAST(SUM(rev_e4) AS BIGINT) AS rev_e4,
       ROUND(CAST(SUM(rev_e4) AS DOUBLE) / CAST(MAX(tot_e4) AS DOUBLE), 6)
           AS rev_share
FROM k GROUP BY 1
""",
)
def agg_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by discounted
    revenue; class A = the head covering the first 80 % of cumulative
    revenue, B = up to 95 %, C = the tail. Thresholds compare exact
    integers (``cum*5 <= tot*4``) — no float boundary can flip a part's
    class between engines.

    Scale shape: the GLOBAL revenue-descending cumulative sum is the
    textbook 100 TB trap (one task sees every part). Implemented with
    ``operators.ranks.grouped_prefix_sum`` over one logical group: parts
    are range-bucketed on revenue, the running sum is an ordinary
    hash-partitioned window within (group, bucket), and only the
    <= n_buckets bucket totals flow through the single-partition
    prefix window. Revenue is exact integer ten-thousandths (prices are
    2-decimal doubles; ``round(x*100)`` recovers exact cents)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    dpct = F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    rev = li.groupBy("l_partkey").agg(F.sum(cents * dpct).alias("rev_e4"))
    tot = rev.agg(F.sum("rev_e4").alias("tot_e4"))
    cum = grouped_prefix_sum(
        rev.withColumn("_g", F.lit(1)).withColumn(
            "_neg", -F.col("rev_e4")
        ),
        ["_g"],
        "_neg",
        "rev_e4",
        out_col="cum_e4",
        tiebreak_cols=["l_partkey"],
    ).crossJoin(F.broadcast(tot))
    classed = cum.select(
        F.when(F.col("cum_e4") * 5 <= F.col("tot_e4") * 4, "A")
        .when(F.col("cum_e4") * 20 <= F.col("tot_e4") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_e4",
        "tot_e4",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_e4").alias("rev_e4"),
        F.round(
            F.sum("rev_e4").cast("double") / F.max("tot_e4").cast("double"),
            6,
        ).alias("rev_share"),
    )


# ------------------------------------------------------------- Spearman


@query(
    "eval_spearman_corr",
    # Average-rank identity: AVG(row_number) over a tie group of size c
    # starting at position r is r + (c-1)/2 == RANK() + (COUNT() OVER
    # tie - 1)/2 — and both are the same exactly-representable multiple
    # of 0.5 (the integer rank sum is exactly divisible by c), so the
    # two engines agree bit-for-bit before the final round.
    oracle="""
WITH b AS (SELECT l_quantity AS q, l_extendedprice AS p FROM lineitem),
r AS (
    SELECT
        RANK() OVER (ORDER BY q)
            + (COUNT(*) OVER (PARTITION BY q) - 1) / 2.0 AS rq,
        RANK() OVER (ORDER BY p)
            + (COUNT(*) OVER (PARTITION BY p) - 1) / 2.0 AS rp,
        COUNT(*) OVER () AS n
    FROM b)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       ROUND(SUM((rq - (n + 1) / 2.0) * (rp - (n + 1) / 2.0))
             / SQRT(SUM((rq - (n + 1) / 2.0) * (rq - (n + 1) / 2.0))
                    * SUM((rp - (n + 1) / 2.0) * (rp - (n + 1) / 2.0))), 6)
           AS spearman_rho
FROM r
""",
)
def eval_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (Spearman 1904) between order quantity
    and extended price, with proper AVERAGE ranks for ties — the
    monotonic-association complement to ``eval_feature_corr``'s Pearson.

    Scale shape: the oracle's ``RANK() OVER (ORDER BY ...)`` is a
    single-task global window; the engine instead takes two passes of
    the range-bucketed ``global_row_number`` (every heavy window is
    hash-partitioned by bucket) and converts row numbers to average
    ranks per VALUE group (AVG of consecutive integers — exact), then
    joins the per-value rank back: a 50-row broadcast for quantity, one
    hash join for price. Centering uses the closed form mean rank
    (n+1)/2 (sum of average ranks is always n(n+1)/2), so no float mean
    enters the sums; every sum term is an exact multiple of 0.25."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("k"),
    )
    nn = li.agg(F.count(F.lit(1)).alias("n"))

    rq = global_row_number(li, "q", ["k"], out_col="rn_q")
    aq = rq.groupBy("q").agg(F.avg("rn_q").alias("rq"))  # <= 50 rows
    rp = global_row_number(li, "p", ["k"], out_col="rn_p")
    ap = rp.groupBy("p").agg(F.avg("rn_p").alias("rp"))

    joined = (
        li.join(F.broadcast(aq), "q")
        .join(ap, "p")
        .crossJoin(F.broadcast(nn))
    )
    x = F.col("rq") - (F.col("n") + 1) / 2.0
    y = F.col("rp") - (F.col("n") + 1) / 2.0
    return joined.agg(
        F.max("n").alias("n"),
        F.round(
            F.sum(x * y) / F.sqrt(F.sum(x * x) * F.sum(y * y)), 6
        ).alias("spearman_rho"),
    )


# -------------------------------------------------------- JS divergence


@query(
    "eval_js_divergence",
    oracle="""
WITH seg AS (
    SELECT event_type,
           SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
           SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
    FROM events GROUP BY 1),
tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM seg),
t AS (
    SELECT CAST(na AS DOUBLE) / ta AS p, CAST(nb AS DOUBLE) / tb AS q
    FROM seg, tot)
SELECT COUNT(*) AS n_types,
       ROUND(SUM(0.5 * (CASE WHEN p > 0 THEN p * LN(p / ((p + q) / 2))
                             ELSE 0 END)
               + 0.5 * (CASE WHEN q > 0 THEN q * LN(q / ((p + q) / 2))
                             ELSE 0 END)), 6) AS jsd_nats
FROM t
""",
)
def eval_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (Lin 1991) between the event-type
    distributions of two user segments (even vs odd user id) — the
    symmetric, always-finite cousin of KL, complementing
    ``quality_psi_drift`` (PSI needs smoothing to survive empty
    buckets; JSD does not).

    Scale shape: one combine-friendly groupBy to <= |event_type| rows,
    a 1-row total broadcast back, and a 5-term final sum — the fact
    table is shuffled zero times beyond the partial-agg exchange."""
    ev = load_table(spark, sf_dir, "events")
    seg = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("nb"),
    )
    tot = seg.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    t = seg.crossJoin(F.broadcast(tot)).select(
        (F.col("na").cast("double") / F.col("ta")).alias("p"),
        (F.col("nb").cast("double") / F.col("tb")).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    term = 0.5 * F.when(
        F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)
    ).otherwise(0.0) + 0.5 * F.when(
        F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)
    ).otherwise(0.0)
    return t.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.sum(term), 6).alias("jsd_nats"),
    )


# ------------------------------------------------------- trigram motifs


@query(
    "seq_trigram_motifs",
    oracle="""
WITH s AS (
    SELECT event_type AS e1,
           LEAD(event_type, 1) OVER w AS e2,
           LEAD(event_type, 2) OVER w AS e3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e1, e2, e3, COUNT(*) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, e1, e2, e3
LIMIT 20
""",
)
def seq_trigram_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, fixed length 3: the 20 most frequent
    consecutive event-type trigrams across user journeys (the n-gram
    specialization of GSP, Srikant & Agrawal 1996) — extends
    ``feature_event_transitions`` (bigram Markov) one step deeper,
    enough to separate 'view>click>purchase' from 'click>view>click'
    loops.

    Scale shape: one shuffle on user_id for the lead window (bounded
    per-user partitions), then a combine-friendly count over at most
    |event_type|^3 keys and a TakeOrderedAndProject top-20 with a
    total-order tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        s.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(20)
    )


# ---------------------------------------------------------- l-diversity


@query(
    "quality_l_diversity",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT CAST(FLOOR(c_acctbal / 100.0) AS BIGINT))
           AS l_distinct,
       COUNT(DISTINCT CAST(FLOOR(c_acctbal / 100.0) AS BIGINT)) >= 3
           AS is_diverse
FROM customer
GROUP BY 1, 2
""",
)
def quality_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006): within each
    quasi-identifier group (nation x market segment) the sensitive
    attribute ($100 account-balance bucket) must take >= l distinct
    values, or the group is re-identifiable even when k-anonymous —
    the companion gate to ``quality_k_anonymity`` (which only counts
    group SIZE).

    Scale shape: a single exact distinct-count aggregation — Spark
    expands COUNT DISTINCT to a two-stage partial agg (map-side dedup
    per group before the exchange); one shuffle on the group key."""
    c = load_table(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 100.0).cast("long")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(sens).alias("l_distinct"),
        (F.countDistinct(sens) >= 3).alias("is_diverse"),
    )
