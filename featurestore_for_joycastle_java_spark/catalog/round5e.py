"""Round-5 third-continuation additions (registered below the 50-query
driver window, after ``round5d``) — driver rows due in the r6 rotation;
until then covered by tests/test_oracle_parity.py and the full-registry
sweeps (SIM_r05_*.json).

Gap analysis behind the picks (SURVEY §2 delta after round5d):

- The engine had NO time-series family: ``ts_autocorr_hourly`` (exact
  lag-1 autocorrelation), ``ts_cusum_changepoint`` (integer-scaled CUSUM
  change-point), ``ts_seasonal_residuals`` (seasonality-adjusted
  anomaly cells) add the three reads a metrics pipeline runs daily.
- ``eval_chi2_independence``: categorical-association screening (chi²)
  beside the existing eval family (AUC=ranking, corr=linear,
  calibration=probability) — in exact integer ppm so the oracle is
  bit-for-bit.
- ``feature_gini_concentration``: revenue-concentration Gini via the
  scale-safe two-pass global rank (never a single-partition window).
- ``graph_triangles_cosupply``: triangle counting with DEGREE-ORDERED
  edge orientation (Suri & Vassilvitskii, WWW 2011) — the third graph
  op beside PageRank and connected components.
- ``agg_weighted_median``: exact weighted TYPE-1 median — the weighted
  companion to the unweighted exact-quantile ops (winsorize/percentile).
- ``quality_benford_digits``: Benford first-digit audit — a
  fraud/data-generation screen over any positive amount column.

No transcendental functions anywhere except IEEE-exact ``sqrt`` (the
``eval_feature_corr`` precedent): counts, sums and products are wide
integers; doubles appear only in final closed forms that are the
identical expression on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from featurestore_for_joycastle_java_spark.operators.graphs import (
    cosupply_edges,
    degrees,
    triangle_counts,
)
from featurestore_for_joycastle_java_spark.operators.ranks import (
    global_row_number,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


# ------------------------------------------------------------ time series


@query(
    "ts_autocorr_hourly",
    # Hour index is pure calendar arithmetic (days-since-anchor * 24 +
    # hour) — no epoch/timezone conversion, so both engines agree on the
    # grid; gaps are zero-filled from the dense hour sequence. The five
    # moment sums over (x_t, x_{t+1}) pairs are exact wide integers;
    # doubles only in the final closed form (sqrt is IEEE-exact).
    oracle="""
WITH h AS (
    SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) * 24
           + EXTRACT(hour FROM ts) AS h,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1),
grid AS (
    SELECT g.h, COALESCE(hh.c, 0) AS c
    FROM (SELECT unnest(generate_series((SELECT MIN(h) FROM h),
                                        (SELECT MAX(h) FROM h))) AS h) g
    LEFT JOIN h hh USING (h)),
p AS (
    SELECT a.c AS x, b.c AS y
    FROM grid a JOIN grid b ON b.h = a.h + 1),
s AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(x) AS HUGEINT) AS sx,
           CAST(SUM(y) AS HUGEINT) AS sy,
           CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
    FROM p)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
              * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS autocorr_lag1
FROM s
""",
)
def ts_autocorr_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lag-1 autocorrelation of the hourly event-count series —
    the "is load sticky hour-over-hour" read that sizes smoothing
    windows and anomaly thresholds. Missing hours count as ZERO (the
    series is zero-filled over the dense min..max hour grid), not
    skipped — skipping gaps silently biases the estimate upward.

    Scale shape: the fact table collapses to the hourly frame in one
    map-side-combined groupBy (rows = hours, not events — 720 here,
    ~9 000 per year at any data scale), so the dense-grid fill, the
    h→h+1 self-join and the moment pass all run on a frame that is
    CALENDAR-sized, independent of event volume. Moments are exact
    wide integers (the `eval_feature_corr` pattern); never float
    running sums.

    Overflow bound: with n hour-pairs and per-hour counts ≤ c_max, the
    widest intermediate is n·Σxy ≤ n²·c_max², so DECIMAL(38,0) holds
    while n·c_max < 10¹⁹ — e.g. a full DECADE of hours (n ≈ 9·10⁴)
    tolerates ~10¹⁴ events per hour. Spark decimal overflow is loud
    (null / ANSI exception), never a silently wrapped value."""
    ev = load_table(spark, sf_dir, "events").select(
        (
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            * 24
            + F.hour("ts")
        ).alias("h")
    )
    h = ev.groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rng = h.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = rng.select(
        F.explode(F.sequence("lo", "hi")).alias("h")
    ).join(h, "h", "left").select(
        "h", F.coalesce("c", F.lit(0).cast("bigint")).alias("c")
    )
    a, b = grid.alias("a"), grid.alias("b")
    p = a.join(b, F.col("b.h") == F.col("a.h") + 1).select(
        F.col("a.c").alias("x"), F.col("b.c").alias("y")
    )
    s = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(_dec(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(_dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(_dec(F.col("y")) * F.col("y")).alias("syy"),
    )
    n, sx, sy = _dec(F.col("n")), _dec(F.col("sx")), _dec(F.col("sy"))
    num = (n * F.col("sxy") - sx * sy).cast("double")
    dx = F.sqrt((n * F.col("sxx") - sx * sx).cast("double"))
    dy = F.sqrt((n * F.col("syy") - sy * sy).cast("double"))
    return s.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        (num / (dx * dy)).alias("autocorr_lag1"),
    )


@query(
    "ts_cusum_changepoint",
    # CUSUM_k = n·prefix_k − k·S is the cumulative deviation from the
    # global mean scaled by n (all integers — no mean division); the
    # argmax day (earliest on ties) is the classic change-point
    # estimate. Window runs over the CALENDAR-sized daily frame.
    oracle="""
WITH d AS (
    SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1),
tot AS (
    SELECT CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
    FROM d),
cum AS (
    SELECT day, c,
           SUM(c) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS pfx,
           ROW_NUMBER() OVER (ORDER BY day) AS k
    FROM d),
sc AS (
    SELECT cum.day,
           CAST(tot.n * cum.pfx - cum.k * tot.s AS BIGINT)
               AS cusum_scaled,
           tot.n AS n_days, tot.s AS total_events
    FROM cum CROSS JOIN tot)
SELECT strftime(day, '%Y-%m-%d') AS change_day, cusum_scaled,
       ABS(cusum_scaled) AS cusum_abs, n_days, total_events
FROM sc
ORDER BY ABS(cusum_scaled) DESC, day ASC
LIMIT 1
""",
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volume: the day k
    maximizing |Σ_{i≤k} (x_i − mean)| is the most likely level-shift
    point (Page 1954; the standard at-most-one-changepoint estimator).
    Kept in exact integers by scaling with n: n·prefix_k − k·S — no
    mean division, no float accumulation, so the argmax (earliest day
    on ties) is bit-deterministic on both engines.

    Scale shape: the fact collapses to the DAILY frame first (one
    map-side-combined groupBy; 30 rows here, 365/year at any volume) —
    the running-sum window and the top-1 sort are calendar-sized
    metadata ops, same accept as `layout_compaction_bins`."""
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = d.agg(
        F.sum("c").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = d.select(
        "day",
        F.sum("c").over(w).alias("pfx"),
        F.row_number().over(Window.orderBy("day")).alias("k"),
    )
    sc = cum.crossJoin(F.broadcast(tot)).select(
        F.col("day").alias("change_day"),
        (F.col("n") * F.col("pfx") - F.col("k") * F.col("s"))
        .cast("bigint")
        .alias("cusum_scaled"),
        F.col("n").alias("n_days"),
        F.col("s").alias("total_events"),
    )
    return (
        sc.withColumn("cusum_abs", F.abs("cusum_scaled"))
        .orderBy(F.col("cusum_abs").desc(), F.col("change_day").asc())
        .limit(1)
        .select(
            F.date_format("change_day", "yyyy-MM-dd").alias("change_day"),
            "cusum_scaled", "cusum_abs", "n_days", "total_events",
        )
    )


@query(
    "ts_seasonal_residuals",
    # Expected count for cell (day, hour) under the independence
    # (day-effect × hour-effect) model is daytot·hourtot/grand;
    # residual_scaled = cnt·grand − daytot·hourtot keeps it integer.
    # Top-20 by |residual| with (day, hour) tiebreak is deterministic.
    oracle="""
WITH o AS (
    SELECT CAST(ts AS DATE) AS day, EXTRACT(hour FROM ts) AS hour,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2),
dt AS (SELECT day, CAST(SUM(cnt) AS BIGINT) AS daytot FROM o GROUP BY 1),
ht AS (SELECT hour, CAST(SUM(cnt) AS BIGINT) AS hourtot FROM o GROUP BY 1),
g AS (SELECT CAST(SUM(cnt) AS BIGINT) AS grand FROM o),
c AS (
    SELECT dt.day, ht.hour, COALESCE(o.cnt, 0) AS cnt,
           dt.daytot, ht.hourtot
    FROM dt CROSS JOIN ht
    LEFT JOIN o ON o.day = dt.day AND o.hour = ht.hour)
SELECT strftime(c.day, '%Y-%m-%d') AS day,
       CAST(c.hour AS BIGINT) AS hour, c.cnt,
       CAST(c.cnt * g.grand - c.daytot * c.hourtot AS BIGINT)
           AS residual_scaled
FROM c CROSS JOIN g
ORDER BY ABS(CAST(c.cnt * g.grand - c.daytot * c.hourtot AS BIGINT))
         DESC, c.day ASC, c.hour ASC
LIMIT 20
""",
)
def ts_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly cells: the 20 (day, hour) cells
    whose event count deviates most from the day-effect × hour-effect
    expectation (daytot·hourtot/grand — the rank-1 margin model every
    ops dashboard uses). Unlike the global z-score query this flags
    "3 AM spiked *for a 3 AM*", not "3 AM is below the all-hours mean".
    Cells are ZERO-FILLED over the observed-days × observed-hours grid
    — a silent hour (zero events where the margins expect thousands)
    is exactly the outage signature the read exists to flag; skipping
    absent cells would hide it. Integer-scaled residual (cnt·grand −
    daytot·hourtot) — exact, and sums to zero over the full grid
    (margin-model identity, property-tested).

    Scale shape: fact → (day, hour) cell frame in one map-side-combined
    groupBy; the zero-fill grid is days × 24 (calendar-sized, built
    from the two broadcast margin frames, never from the fact); the
    top-20 is a TakeOrderedAndProject, never a global sort."""
    o = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.to_date("ts").alias("day"),
            F.hour("ts").cast("bigint").alias("hour"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    dt = o.groupBy("day").agg(F.sum("cnt").cast("bigint").alias("daytot"))
    ht = o.groupBy("hour").agg(F.sum("cnt").cast("bigint").alias("hourtot"))
    g = o.agg(F.sum("cnt").cast("bigint").alias("grand"))
    res = (
        dt.crossJoin(F.broadcast(ht))
        .join(o, ["day", "hour"], "left")
        .select(
            "day",
            "hour",
            F.coalesce("cnt", F.lit(0).cast("bigint")).alias("cnt"),
            "daytot",
            "hourtot",
        )
        .crossJoin(F.broadcast(g))
        .select(
            "day",
            "hour",
            "cnt",
            (
                F.col("cnt") * F.col("grand")
                - F.col("daytot") * F.col("hourtot")
            )
            .cast("bigint")
            .alias("residual_scaled"),
        )
    )
    return (
        res.orderBy(
            F.abs("residual_scaled").desc(),
            F.col("day").asc(),
            F.col("hour").asc(),
        )
        .limit(20)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "hour", "cnt", "residual_scaled",
        )
    )


# ----------------------------------------------------------------- eval


@query(
    "eval_chi2_independence",
    # Per-cell contribution (n·O − r·c)²/(n·r·c) is computed as an
    # integer ppm floor on wide decimals, then SUMMED AS INTEGERS —
    # never a float sum over cells (order-dependent). The double chi²
    # is derived from the integer ppm once.
    oracle="""
WITH o AS (
    SELECT event_type, EXTRACT(hour FROM ts) AS hour,
           CAST(COUNT(*) AS HUGEINT) AS obs
    FROM events GROUP BY 1, 2),
r AS (SELECT event_type, CAST(SUM(obs) AS HUGEINT) AS rt FROM o GROUP BY 1),
c AS (SELECT hour, CAST(SUM(obs) AS HUGEINT) AS ct FROM o GROUP BY 1),
g AS (SELECT CAST(SUM(obs) AS HUGEINT) AS n,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT hour) AS BIGINT) AS nc
      FROM o),
cell AS (
    SELECT (g.n * o.obs - r.rt * c.ct) * (g.n * o.obs - r.rt * c.ct)
           * 1000000 // (g.n * r.rt * c.ct) AS ppm
    FROM o JOIN r USING (event_type) JOIN c USING (hour) CROSS JOIN g)
SELECT CAST(g.n AS BIGINT) AS n,
       (g.nr - 1) * (g.nc - 1) AS dof,
       CAST(SUM(cell.ppm) AS BIGINT) AS chi2_ppm,
       CAST(SUM(cell.ppm) AS DOUBLE) / 1000000.0 AS chi2
FROM cell CROSS JOIN g
GROUP BY g.n, g.nr, g.nc
""",
)
def eval_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and hour of
    day — the categorical-association screen beside AUC (ranking), corr
    (linear) and calibration (probability): "does this categorical
    feature carry calendar signal at all?". Each cell's (O−E)²/E is
    computed scale-free as (n·O − r·c)²/(n·r·c) in exact wide-decimal
    arithmetic, floored to integer ppm, and the statistic is an INTEGER
    sum of cell ppms — a float sum over cells would be
    addition-order-dependent and unverifiable cross-engine.

    Scale shape: fact → contingency cells in one map-side-combined
    groupBy (cells = |types|×24, not rows); margins are cell-frame
    aggregates broadcast back. One fact pass at any scale.

    Overflow bound: the widest intermediate is (n·O − r·c)²·10⁶ with
    O, r, c ≤ n, so DECIMAL(38,0) is guaranteed exact while
    n⁴·10⁶ < 10³⁸, i.e. **n ≤ 10⁸ events**. Past that, Spark decimal
    overflow is LOUD, not silently wrong (null, or an exception under
    ANSI mode — never a wrapped value), and the driver compare would
    flag it; the scale-up fix is dropping the ppm factor (n ≤ 10⁹·⁵)
    or computing cells in double and accepting float summation."""
    o = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").cast("bigint").alias("hour"))
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    r = o.groupBy("event_type").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("hour").agg(F.sum("obs").alias("ct"))
    g = o.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("event_type").alias("nr"),
        F.countDistinct("hour").alias("nc"),
    )
    cell = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "hour")
        .crossJoin(F.broadcast(g))
        .select(
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * obs - CAST(rt AS DECIMAL(38,0)) * ct)"
                " * (CAST(n AS DECIMAL(38,0)) * obs - CAST(rt AS DECIMAL(38,0)) * ct)"
                " * 1000000 AS DECIMAL(38,0))"
                " div (CAST(n AS DECIMAL(38,0)) * rt * ct)"
            ).alias("ppm"),
            "n",
            "nr",
            "nc",
        )
    )
    return cell.groupBy("n", "nr", "nc").agg(
        F.sum("ppm").cast("bigint").alias("chi2_ppm")
    ).select(
        F.col("n").cast("bigint").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        "chi2_ppm",
        (F.col("chi2_ppm").cast("double") / F.lit(1000000.0)).alias("chi2"),
    )


# -------------------------------------------------------------- features


@query(
    "feature_gini_concentration",
    # Gini from the sorted-rank identity G = (2·Σ i·x_i − (n+1)·Σx)
    # / (n·Σx), ranks 1..n ascending by (revenue, custkey) — exact
    # integers until the single final division.
    oracle="""
WITH rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1),
rk AS (
    SELECT cents,
           ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rn
    FROM rev),
s AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(cents) AS HUGEINT) AS sx,
           CAST(SUM(CAST(rn AS HUGEINT) * cents) AS HUGEINT) AS srx
    FROM rk)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(sx AS BIGINT) AS total_cents,
       CAST(CAST(2 AS HUGEINT) * srx - (n + 1) * sx AS DOUBLE)
           / CAST(n * sx AS DOUBLE) AS gini
FROM s
""",
)
def feature_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    whale-dependence number (0 = spend spread evenly, →1 = one
    customer is the business) that retention/monetization teams track
    per cohort. Uses the sorted-rank identity G = (2Σi·x_i − (n+1)Σx)
    / (nΣx) with exact integer cents and ranks; one double division at
    the end.

    Scale shape: the fact aggregates to the customer frame first
    (distributed groupBy); the required global rank uses the two-pass
    range-bucketed `global_row_number` (operators/ranks.py) — NO
    single-partition window touches the customer frame; the only
    global window inside the helper sees n_buckets rows. The moment
    reduction is one map-side-combined pass."""
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    rk = global_row_number(rev, "cents", ["o_custkey"], out_col="rn")
    s = rk.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(_dec(F.col("rn")) * F.col("cents")).alias("srx"),
    )
    n, sx = _dec(F.col("n")), _dec(F.col("sx"))
    gini = (
        (F.lit(2).cast("decimal(38,0)") * F.col("srx") - (n + 1) * sx)
        .cast("double")
        / (n * sx).cast("double")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("sx").cast("bigint").alias("total_cents"),
        gini.alias("gini"),
    )


# ----------------------------------------------------------------- graph


@query(
    "graph_triangles_cosupply",
    # The oracle is the DECLARATIVE key-ordered triple join (a<b<c on
    # supplier keys) — independent of the engine's degree-ordered
    # orientation, so it proves the algorithm, not just replays it.
    oracle="""
WITH bip AS (
    SELECT DISTINCT l_partkey AS p, l_suppkey AS s
    FROM lineitem WHERE l_quantity >= 49.0),
e AS (
    SELECT DISTINCT a.s AS u, b.s AS v
    FROM bip a JOIN bip b ON a.p = b.p AND a.s < b.s),
tri AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
nodes AS (
    SELECT a AS s_suppkey FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri)
SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY 1
""",
)
def graph_triangles_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle counts in the co-supply graph (suppliers
    adjacent iff they ship the same part in a bulk lineitem,
    qty ≥ 49) — the clustering/community-density primitive beside
    PageRank (centrality) and connected components (reachability).

    Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    "Counting triangles and the curse of the last reducer", WWW 2011).
    Each undirected edge is directed from its (degree, key)-smaller
    endpoint to the larger; wedges are enumerated at the SMALLEST
    endpoint of each triangle and closed against the directed edge
    list, so every triangle is emitted exactly once and the wedge join
    fans out by OUT-degree, which the orientation bounds by O(√|E|)
    even on power-law graphs — the "last reducer" (max-degree hub)
    never enumerates its quadratic neighborhood. The bipartite
    part→supplier projection dedups (part, supplier) BEFORE pairing,
    and pairs are per-part (Σ per-part m² , never global n²).

    The wedge-closure engine lives in ``operators/graphs.py::
    triangle_counts`` (shared, property-tested against a brute-force
    reference on random graphs); plan/perf notes live on its docstring."""
    return triangle_counts(cosupply_edges(spark, sf_dir)).select(
        F.col("x").alias("s_suppkey"), "n_triangles"
    )


# ------------------------------------------------------------------- agg


@query(
    "agg_weighted_median",
    # TYPE-1 weighted median: smallest value whose cumulative weight
    # reaches ceil(W/2) = (W+1) DIV 2 — integer rank arithmetic over
    # the distinct-value frame, no interpolation (the winsorize
    # pattern, weighted).
    oracle="""
WITH e AS (
    SELECT l_returnflag,
           CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents,
           CAST(FLOOR(l_quantity) AS BIGINT) AS w
    FROM lineitem),
d AS (
    SELECT l_returnflag, cents, CAST(SUM(w) AS BIGINT) AS wc
    FROM e GROUP BY 1, 2),
cum AS (
    SELECT l_returnflag, cents, wc,
           SUM(wc) OVER (PARTITION BY l_returnflag ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cw
    FROM d),
tot AS (
    SELECT l_returnflag, CAST(SUM(wc) AS BIGINT) AS tw FROM d GROUP BY 1)
SELECT t.l_returnflag, t.tw AS total_weight,
       MIN(CASE WHEN cum.cw >= (t.tw + 1) // 2 THEN cum.cents END)
           AS wmedian_cents
FROM tot t JOIN cum ON cum.l_returnflag = t.l_returnflag
GROUP BY 1, 2
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted TYPE-1 median of extended price per return flag,
    weighted by quantity — "the price point at which half the UNITS
    (not half the line items) sit below". The weighted companion to
    the exact unweighted quantile ops (winsorize, percentile): row
    medians mislead whenever weights are skewed.

    Scale shape: identical to `feature_winsorize` — collapse to the
    distinct-(group, value) frame with summed weights (map-side
    combine), run the cumulative window there (partition-parallel per
    group, frame size = value cardinality not row count), attach
    per-group totals by broadcast. No interpolation anywhere, so no
    cross-engine float hazard."""
    e = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * F.lit(100.0))
        .cast("bigint")
        .alias("cents"),
        F.floor("l_quantity").cast("bigint").alias("w"),
    )
    d = e.groupBy("l_returnflag", "cents").agg(
        F.sum("w").cast("bigint").alias("wc")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.withColumn("cw", F.sum("wc").over(w))
    tot = d.groupBy("l_returnflag").agg(
        F.sum("wc").cast("bigint").alias("tw")
    )
    return (
        cum.join(F.broadcast(tot), "l_returnflag")
        .groupBy("l_returnflag", F.col("tw").alias("total_weight"))
        .agg(
            F.min(
                F.when(
                    F.col("cw") >= F.expr("(tw + 1) DIV 2"),
                    F.col("cents"),
                )
            ).alias("wmedian_cents")
        )
    )


# --------------------------------------------------------------- quality


_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


@query(
    "quality_benford_digits",
    # Benford expectations log10(1+1/d) are pre-computed integer ppm
    # LITERALS (no log10 at query time — transcendental results differ
    # across engines); shares are integer ppm floors.
    oracle="""
WITH d AS (
    SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM lineitem),
c AS (
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT c.digit, c.n,
       CAST(c.n * 1000000 // t.total AS BIGINT) AS share_ppm,
       CAST(CASE c.digit
            WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
            WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
            WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757
            END AS BIGINT) AS benford_ppm,
       CAST(ABS(c.n * 1000000 // t.total
                - CASE c.digit
                  WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
                  WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
                  WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757
                  END) AS BIGINT) AS dev_ppm
FROM c CROSS JOIN t
""",
)
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of extended price — the
    fraud/synthetic-data screen: organically-generated positive amounts
    follow P(d) = log10(1+1/d); flat or spiked digit distributions
    flag fabricated or clamped data (here the TPC-H price formula
    itself fails Benford — which is the point of the audit: it DETECTS
    synthetic generation). Expectations are pre-computed integer-ppm
    constants (no log10 at query time — libm transcendentals differ
    across engines); observed shares are integer ppm floors.

    Scale shape: one map-side-combined groupBy to a 9-row frame; the
    total attaches by broadcast. One fact pass, 9 output rows, at any
    scale."""
    d = load_table(spark, sf_dir, "lineitem").select(
        F.substring(
            F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    bexp = F.element_at(
        F.array(*[F.lit(v).cast("bigint") for v in _BENFORD_PPM]),
        F.col("digit").cast("int"),
    )
    share = F.expr("n * 1000000 DIV total").cast("bigint")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            share.alias("share_ppm"),
            bexp.alias("benford_ppm"),
            F.abs(share - bexp).cast("bigint").alias("dev_ppm"),
        )
    )
