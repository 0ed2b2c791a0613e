"""Window-function queries (SURVEY.md §2.2): ranking, analytic (lag/lead),
running frames, range (time-interval) frames, per-group top-k."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from featurestore_for_joycastle_java_spark.operators.relational import (
    rolling_time_window,
    top_k_per_group,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "window_topk_per_group",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
    FROM orders)
WHERE rn <= 3
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number window + filter — one shuffle
    on the group key, no global sort. Orderkey tiebreak = deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
        ),
        partition_by=["c_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )


@query(
    "window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_spend
FROM orders
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer — rows frame with a unique
    total order (orderdate + orderkey tiebreak)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(RANK() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT)
           AS price_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic functions: lag/lead over event order + rank with ties
    (rank is deterministic under ties, unlike row_number)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.rank().over(wr).alias("price_rank"),
    )


@query(
    "window_rolling_7d",
    oracle="""
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (
           PARTITION BY user_id
           ORDER BY CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)
           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2)
           AS spend_7d,
       CAST(COUNT(*) OVER (
           PARTITION BY user_id
           ORDER BY CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)
           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_events_7d
FROM events
""",
)
def window_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-store staple: rolling 7-day spend + event count per
    user. Range frame over epoch seconds (see operators.relational.
    rolling_time_window for the scale notes)."""
    ev = load_table(spark, sf_dir, "events")
    out = rolling_time_window(
        ev,
        partition_by=["user_id"],
        ts_col="ts",
        window_seconds=7 * 86400,
        aggs={
            "spend_7d_raw": F.sum("value"),
            "n_events_7d": F.count(F.lit(1)),
        },
    )
    return out.select(
        "event_id",
        "user_id",
        F.round(F.col("spend_7d_raw"), 2).alias("spend_7d"),
        "n_events_7d",
    )


@query(
    "window_ntile_dense_rank",
    oracle="""
SELECT c_custkey,
       CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT)
           AS bal_quartile,
       CAST(DENSE_RANK() OVER (ORDER BY c_nationkey) AS INT) AS nation_rank
FROM customer
""",
)
def window_ntile_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + dense_rank over unpartitioned windows. Note: a global
    (unpartitioned) window funnels all rows through one task — fine for a
    150k-row dim, never for a 100 TB fact (partition first, or compute
    quantile cutoffs via approx_percentile and join them in)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.ntile(4)
        .over(Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")))
        .alias("bal_quartile"),
        F.dense_rank().over(Window.orderBy("c_nationkey")).alias("nation_rank"),
    )
