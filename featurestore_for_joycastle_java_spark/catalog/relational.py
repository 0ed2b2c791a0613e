"""Relational surface queries (SURVEY.md §2.2): scans+filters+projections,
all join types (broadcast/shuffle, semi/anti/cross), aggregations (partial+
final, distinct, rollup/cube/grouping sets, stats), sorts/limits, set ops.

Oracle-parity conventions (driver hashes values with columns sorted by
name): every computed column aliased identically both sides; integer sums
CAST to BIGINT in DuckDB (SUM(int) is HUGEINT there); dates rendered via
date_format/strftime, never as raw timestamps.

Float-summation rule (learned the hard way — see git history): ROUND(SUM(x),
k) is deterministic across engines only when the data is exact k-decimal
(the true sum then sits ON a grid point, never a midpoint). Derived money
(price*(1-disc) is 4-decimal, *(1+tax) is 6-decimal) summed over large
groups accumulates enough cross-engine summation-order error to straddle
rounding midpoints. The bulletproof pattern used here: fixed-point exact
summation (``operators.relational.exact_sum`` — semantics of SUM(CAST(x AS
DECIMAL(_,6))), but on codegen'd long accumulators, ~4x faster than Spark's
128-bit decimal sum), then one cast to double that is bit-identical in both
engines. The DuckDB oracles keep the equivalent CAST-to-DECIMAL spelling.
This is also the right answer at 100 TB (no silent cents drift): the long
accumulators overflow only past ~1e13 rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.relational import (
    broadcast_join,
    exact_sum,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


# --- Aggregations -----------------------------------------------------------


@query(
    "tpch_q1_pricing",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(23,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(23,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(23,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(23,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(23,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(23,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(23,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical hash-agg with partial
    (map-side) + final aggregation — one shuffle on a 6-value key. The
    shipdate filter pushes to the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    dsum = exact_sum
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / n).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / n).alias("avg_price"),
            (dsum(F.col("l_discount")) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "agg_distinct_counts",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(FLOOR(value) AS BIGINT)) AS n_value_buckets,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg in Spark). Bucketing
    uses floor(), not cast-to-int: DuckDB's double→int CAST rounds to
    nearest while Spark truncates — floor is the portable spelling."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.floor("value")).alias("n_value_buckets"),
        F.count(F.lit(1)).alias("n_events"),
    )


# (r3) the rows-only ``agg_approx_distinct`` query was retired: it was the
# same HLL sketch as ``agg_approx_distinct_bounded`` (catalog/round2.py)
# minus the bounded-error oracle — strictly weaker, no extra coverage.


@query(
    "agg_rollup",
    oracle="""
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status+priority → grand total)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "agg_cube",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both grouping dimensions (all 2^2 grouping sets)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (spark.sql path)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM v_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_stats",
    oracle="""
SELECT c_nationkey,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(23,6))) AS DOUBLE) / COUNT(*) AS avg_bal,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal,
       ROUND(SQRT((CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(29,8))) AS DOUBLE)
             - CAST(SUM(CAST(c_acctbal AS DECIMAL(23,6))) AS DOUBLE)
               * CAST(SUM(CAST(c_acctbal AS DECIMAL(23,6))) AS DOUBLE) / COUNT(*))
            / (COUNT(*) - 1)), 4) AS std_bal,
       ROUND(QUANTILE_CONT(c_acctbal, 0.5), 4) AS median_bal
FROM customer
GROUP BY c_nationkey
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: avg and sample stddev from exact decimal
    moments (x and x² are 2/4-decimal → decimal sums are exact and order-
    independent). The final decimal→double conversion of the x² sum is not
    correctly-rounded identically in both engines (last-ulp drift), so
    std gets a 4dp snap — safe because both sides agree to ~1e-9. Median =
    interpolated percentile (same type-7 definition as quantile_cont)."""
    c = F.col("c_acctbal")
    sx = exact_sum(c)
    sx2 = exact_sum(c * c, dp=8)
    n = F.count(F.lit(1))
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            n.alias("n_cust"),
            (sx / n).alias("avg_bal"),
            F.min(c).alias("min_bal"),
            F.max(c).alias("max_bal"),
            F.round(F.sqrt((sx2 - sx * sx / n) / (n - F.lit(1))), 4).alias("std_bal"),
            F.round(F.percentile(c, 0.5), 4).alias("median_bal"),
        )
    )


# --- Joins ------------------------------------------------------------------


@query(
    "tpch_q3_shipping",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(23,6))) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
""",
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective filters on both sides of a 3-way equi-join,
    then hash agg. Filters push to the scans; join keys shuffle once each."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
    )


@query(
    "tpch_q5_revenue",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(23,6))) AS DOUBLE) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def tpch_q5_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table join. Dims (region, nation) get explicit
    broadcast hints — the fact chain never shuffles for them; the
    customer/orders/lineitem/supplier equi-joins are AQE's to plan."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nations_in_region = broadcast_join(
        nation, region, nation.n_regionkey == region.r_regionkey
    )
    return (
        broadcast_join(cust, nations_in_region, cust.c_nationkey == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@query(
    "join_left_outer",
    oracle="""
SELECT c_custkey,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spend
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (n_orders=0 rows)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having a finished order. No row
    multiplication — the build side only answers existence."""
    cust = load_table(spark, sf_dir, "customer")
    fin = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        fin, cust.c_custkey == fin.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "join_cross",
    oracle="""
SELECT r_name, seg AS segment
FROM region
CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny distinct sets (5 x 5) — the only sane cross
    join shape; anything larger must be an LSH/bucketed join instead."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    segs = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
    )
    return region.crossJoin(segs)


@query(
    "join_range_theta",
    oracle="""
SELECT p_partkey, p_retailprice, bucket_lo, bucket_hi
FROM part
JOIN (
    SELECT 0.0 AS bucket_lo, 500.0 AS bucket_hi
    UNION ALL SELECT 500.0, 1000.0
    UNION ALL SELECT 1000.0, 1500.0
    UNION ALL SELECT 1500.0, 100000.0
) buckets
  ON p_retailprice >= bucket_lo AND p_retailprice < bucket_hi
""",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range-condition) join against a tiny broadcast bucket table —
    Spark plans BroadcastNestedLoopJoin; fine because the inner side is 4
    rows. Large-large range joins must bucketize first (see asof module)."""
    part = load_table(spark, sf_dir, "part")
    buckets = spark.createDataFrame(
        [(0.0, 500.0), (500.0, 1000.0), (1000.0, 1500.0), (1500.0, 100000.0)],
        "bucket_lo double, bucket_hi double",
    )
    return part.join(
        F.broadcast(buckets),
        (part.p_retailprice >= buckets.bucket_lo)
        & (part.p_retailprice < buckets.bucket_hi),
    ).select("p_partkey", "p_retailprice", "bucket_lo", "bucket_hi")


# --- Sorts / limits / set ops ----------------------------------------------


@query(
    "sort_limit_topn",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject (per-partition heap
    + driver merge of N), never a full sort. Unique tiebreak (orderkey)
    makes the result set deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "setops_nations",
    oracle="""
SELECT 'union' AS op, k FROM (
    SELECT DISTINCT c_nationkey AS k FROM customer
    UNION
    SELECT DISTINCT s_nationkey AS k FROM supplier)
UNION ALL
SELECT 'intersect' AS op, k FROM (
    SELECT DISTINCT c_nationkey AS k FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS k FROM supplier)
UNION ALL
SELECT 'except' AS op, k FROM (
    SELECT DISTINCT c_nationkey AS k FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS k FROM supplier)
""",
)
def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (distinct semantics) tagged into one
    result: nation keys present in customers vs suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    cd, sd = c.distinct(), s.distinct()
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "k")  # noqa: E731
    return (
        tag(cd.union(sd).distinct(), "union")
        .unionAll(tag(cd.intersect(sd), "intersect"))
        .unionAll(tag(cd.subtract(sd), "except"))
    )


@query(
    "filter_project_pushdown",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_quantity > 45 AND l_returnflag = 'R'
""",
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare scan+filter+project — exists to keep the pushdown honest: the
    plan must show PushedFilters [l_quantity > 45, l_returnflag = 'R'] and
    a 5-column ReadSchema (verified in tests/test_plans.py)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "tpch_q6_forecast",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(23,6))) AS DOUBLE)
           AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecasting-revenue: pure scan+filter+agg — the
    canonical pushdown/pruning showcase (all four predicates reach the
    parquet scan; only 4 columns read). No shuffle except the single-row
    final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(
                F.col("l_extendedprice") * F.col("l_discount")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "tpch_q12_priority",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
)
def tpch_q12_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style priority counts (recast onto the fixture's columns:
    l_linestatus for l_shipmode): fact-fact equi-join with conditional
    aggregation. The lineitem date filter evaluates before the join,
    shrinking the shuffle; the orderpriority CASE runs map-side in the
    partial agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
