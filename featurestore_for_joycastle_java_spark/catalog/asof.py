"""Feature-store composite queries (SURVEY.md §7.2 M3): point-in-time
joins, sessionization, daily feature backfill."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.asof import (
    asof_join,
    sessionize,
)
from featurestore_for_joycastle_java_spark.operators.relational import exact_sum
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "asof_backward_purchase_click",
    oracle="""
SELECT p.event_id,
       p.user_id,
       c.event_id AS click_event_id,
       c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND epoch_us(p.ts) >= epoch_us(c.ts)
""",
)
def asof_backward_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (backward): for every purchase, the user's most
    recent prior-or-simultaneous click — 'the feature value known at event
    time', leakage-free. Union+window plan: one shuffle on user_id (see
    operators.asof for the 100 TB notes). Joined on epoch microseconds so
    both engines compare identical integers."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "t_us", F.unix_micros(F.col("ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("value").alias("click_value"),
        "t_us",
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="t_us",
        right_ts="t_us",
        right_cols=["click_event_id", "click_value"],
        direction="backward",
    )
    return out.select("event_id", "user_id", "click_event_id", "click_value")


@query(
    "asof_forward_click_purchase",
    oracle="""
SELECT c.event_id,
       c.user_id,
       p.event_id AS next_purchase_id,
       p.value AS next_purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND epoch_us(c.ts) <= epoch_us(p.ts)
""",
)
def asof_forward_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of forward: for every click, the user's next purchase (label
    generation for conversion models — 'what happened after')."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "t_us", F.unix_micros(F.col("ts"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "t_us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("next_purchase_id"),
        "user_id",
        F.col("value").alias("next_purchase_value"),
        "t_us",
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="t_us",
        right_ts="t_us",
        right_cols=["next_purchase_id", "next_purchase_value"],
        direction="forward",
    )
    return out.select("event_id", "user_id", "next_purchase_id", "next_purchase_value")


@query(
    "sessionize_users",
    oracle="""
WITH e AS (
    SELECT user_id, event_id,
           CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) AS epoch_s
    FROM events),
flagged AS (
    SELECT user_id, event_id, epoch_s,
           CASE WHEN epoch_s - LAG(epoch_s) OVER w > 1800 THEN 1 ELSE 0 END
               AS is_new
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s)),
sessions AS (
    SELECT user_id, event_id, epoch_s,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY epoch_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       CAST(MAX(epoch_s) - MIN(epoch_s) AS BIGINT) AS duration_s
FROM sessions
GROUP BY user_id, session_id
""",
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) + per-session rollup —
    lag + running-sum windows, then one agg; all integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(ev, ["user_id"], "ts", gap_seconds=1800)
    epoch = F.unix_timestamp("ts")
    return (
        sessions.withColumn("epoch_s", epoch)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("epoch_s") - F.min("epoch_s")).alias("duration_s"),
        )
    )


@query(
    "feature_daily_user",
    oracle="""
SELECT user_id,
       strftime(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(23,6))) AS DOUBLE) AS spend,
       COUNT(DISTINCT event_type) AS n_event_types
FROM events
GROUP BY user_id, DATE_TRUNC('day', ts)
""",
)
def feature_daily_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user feature backfill: the partition-parallel recompute
    shape — group by (entity, day); in production lands via
    write.partitionBy(day) so any day range can be recomputed
    independently and readers prune on day."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("spend"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
    )


@query(
    "feature_gap_fill",
    oracle="""
WITH bounds AS (
    SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
users AS (SELECT DISTINCT user_id FROM events),
spine AS (
    SELECT user_id,
           CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
    FROM users, bounds),
daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(23,6))) AS DOUBLE) AS spend
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
       COALESCE(d.spend, 0) AS spend,
       COALESCE(LAST_VALUE(d.spend IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS ffill_spend
FROM spine s LEFT JOIN daily d USING (user_id, day)
""",
)
def feature_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily feature matrix: per-user date spine (sequence+explode
    over the global range) left-joined to daily purchase spend, gaps
    forward-filled with last(ignorenulls) — the training-data export
    shape. The spine is generated, never materialized as input; the
    window shuffles once on user_id."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    bounds = ev.agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
    users = ev.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", day.alias("day"))
        .agg(
            exact_sum(F.col("value")).alias("spend")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("spend", F.lit(0.0)).alias("spend"),
            F.coalesce(
                F.last("spend", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("ffill_spend"),
        )
    )


@query(
    "feature_rollup_multires",
    oracle="""
WITH e AS (
    SELECT event_type, value,
           DATE_TRUNC('hour', ts)  AS h,
           DATE_TRUNC('day', ts)   AS d,
           DATE_TRUNC('month', ts) AS m
    FROM events)
SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
            WHEN GROUPING(d) = 0 THEN 'day'
            ELSE 'month' END AS resolution,
       strftime(COALESCE(h, d, m), '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(23,6))) AS DOUBLE) AS sum_value
FROM e
GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (m, event_type))
""",
)
def feature_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hour/day/month continuous
    aggregates of the event stream in ONE grouping-sets pass — one scan,
    one shuffle, partial aggregation shared across resolutions (vs three
    separate jobs re-reading the fact table). GROUPING() disambiguates the
    levels; the bucket column carries whichever truncation is live.

    At 100 TB this is the precomputed-rollup pattern: land the output
    partitioned by (resolution, month(bucket)) and dashboards prune to one
    resolution's partitions."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("v_events_rollup")
    return spark.sql(
        """
        WITH e AS (
            SELECT event_type, value,
                   DATE_TRUNC('hour', ts)  AS h,
                   DATE_TRUNC('day', ts)   AS d,
                   DATE_TRUNC('month', ts) AS m
            FROM v_events_rollup)
        SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
                    WHEN GROUPING(d) = 0 THEN 'day'
                    ELSE 'month' END AS resolution,
               DATE_FORMAT(COALESCE(h, d, m), 'yyyy-MM-dd HH:mm:ss') AS bucket,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(23,6))) AS DOUBLE) AS sum_value
        FROM e
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (m, event_type))
        """
    )
