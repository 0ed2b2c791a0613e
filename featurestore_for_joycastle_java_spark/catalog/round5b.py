"""Round-5 late additions, registered BELOW the driver's 50-query window
(module order: after ``advanced``) so the rotation plan for r5 is
untouched — these get driver rows in r6; until then they are covered by
tests, the full-registry sweeps (SIM_r05_*.json), and the judge's own
sweep.

- ``asof_tolerance_backward``: bounded-staleness PIT read (the
  ``asof_join(tolerance=...)`` surface — pandas ``merge_asof`` parity).
- ``feature_time_to_convert``: click → next-purchase conversion latency
  within a window (forward as-of + tolerance), the label-generation
  read for conversion models.
- ``sim_label_centroid_dist``: per-label embedding centroids (decimal-
  exact component sums → deterministic double means) and each vector's
  distance to its own label's centroid — the embedding-space outlier
  score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.asof import asof_join
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table

_DAY_US = 86_400_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").withColumn(
        "t", F.unix_micros(F.col("ts"))
    )


@query(
    "asof_tolerance_backward",
    # DuckDB has no ASOF tolerance either — the oracle post-filters the
    # unbounded ASOF match with the same inclusive age bound, nulling
    # payload and matched ts together (the operator's atomicity rule).
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id, event_type, value, epoch_us(ts) AS t
    FROM events),
p AS (
    SELECT user_id, t, MAX_BY(value, event_id) AS recent_purchase_value
    FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
v AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'view')
SELECT v.event_id, v.user_id,
       CASE WHEN v.t - p.t <= {2 * _DAY_US}
            THEN p.recent_purchase_value END AS recent_purchase_value,
       CASE WHEN v.t - p.t <= {2 * _DAY_US}
            THEN p.t END AS purchase_t_us
FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.t >= p.t
""",
)
def asof_tolerance_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness point-in-time read: for every view, the user's
    latest prior purchase value — but only if it is at most 2 days old
    (``asof_join(tolerance=...)``); staler matches are nulled whole.
    The freshness-SLA contract of a feature-serving read: a model must
    not consume a feature that stopped being true."""
    e = _events_us(spark, sf_dir)
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "t")
        .agg(F.max_by("value", "event_id").alias("recent_purchase_value"))
    )
    v = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "t"
    )
    out = asof_join(
        v,
        p,
        on=["user_id"],
        left_ts="t",
        right_ts="t",
        right_cols=["recent_purchase_value"],
        direction="backward",
        tolerance=2 * _DAY_US,
    )
    return out.select(
        "event_id",
        "user_id",
        "recent_purchase_value",
        F.col("t_matched").alias("purchase_t_us"),
    )


@query(
    "feature_time_to_convert",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
p AS (
    SELECT user_id, t, MAX(event_id) AS purchase_event_id
    FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
c AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click')
SELECT c.event_id, c.user_id,
       CASE WHEN p.t - c.t <= {7 * _DAY_US}
            THEN p.t - c.t END AS convert_us,
       CASE WHEN p.t - c.t <= {7 * _DAY_US}
            THEN CAST(FLOOR(CAST(p.t - c.t AS DOUBLE) / 3600000000.0)
                      AS BIGINT) END AS convert_hours
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t <= p.t
""",
)
def feature_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency labels: for every click, microseconds until
    the user's NEXT purchase, capped at a 7-day attribution window
    (forward as-of + tolerance) — the label-generation read for a
    time-to-convert model, leakage-free because only future purchases
    match and unconverted clicks stay null. Integer time arithmetic
    end-to-end; the hour bucket is the model-ready coarse feature."""
    e = _events_us(spark, sf_dir)
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "t")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    c = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "t"
    )
    out = asof_join(
        c,
        p,
        on=["user_id"],
        left_ts="t",
        right_ts="t",
        right_cols=["purchase_event_id"],
        direction="forward",
        tolerance=7 * _DAY_US,
    )
    convert = F.col("t_matched") - F.col("t")
    return out.select(
        "event_id",
        "user_id",
        convert.alias("convert_us"),
        F.floor(convert.cast("double") / 3.6e9)
        .cast("long")
        .alias("convert_hours"),
    )


@query(
    "sim_label_centroid_dist",
    # Determinism engineering: centroid component means come from
    # DECIMAL(27,12) sums (order-independent exact addition; both
    # engines convert the same doubles to the same 12dp decimals) cast
    # to DOUBLE and divided by the exact count — the same bit pattern in
    # both engines. The distance then composes the verified
    # list_inner_product primitive: sqrt(v·v - 2 v·c + c·c), rounded 6.
    oracle="""
WITH e AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
comp AS (
    SELECT e.label, d.ord,
           CAST(SUM(CAST(e.v[d.ord] AS DECIMAL(27,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS m
    FROM e, range(1, 65) AS d(ord)
    GROUP BY 1, 2),
cent AS (
    SELECT label, list(m ORDER BY ord) AS c FROM comp GROUP BY 1)
SELECT e.vec_id, e.label,
       ROUND(SQRT(list_inner_product(e.v, e.v)
                  - 2 * list_inner_product(e.v, cent.c)
                  + list_inner_product(cent.c, cent.c)), 6) AS centroid_dist
FROM e JOIN cent USING (label)
""",
)
def sim_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid + each vector's Euclidean distance
    to its OWN label's centroid — the embedding-space outlier/typicality
    score (mislabeled-example mining, cluster cohesion monitoring).

    Scale shape: centroid sums ride a posexplode → (label, dim) partial
    aggregation (64 rows per vector, map-side combined; the shuffle
    carries one row per (label, dim)), centroids rebuild per label via
    sort_array over 64-element lists, and the tiny centroid frame
    broadcasts back onto the vectors for a stateless per-row HOF
    distance — no self-join, no window over the vectors. Decimal
    component sums make the centroid bit-deterministic (see oracle
    comment); the distance composes dot products bit-matched to
    DuckDB's list_inner_product (r3-verified primitive)."""
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        as_double,
        dot,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    comp = (
        emb.select("label", F.posexplode("v").alias("ord", "x"))
        .groupBy("label", "ord")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("m")
        )
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ord", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )
    joined = emb.join(F.broadcast(cent), "label")
    d2 = (
        dot(F.col("v"), F.col("v"))
        - F.lit(2.0) * dot(F.col("v"), F.col("c"))
        + dot(F.col("c"), F.col("c"))
    )
    return joined.select(
        "vec_id", "label", F.round(F.sqrt(d2), 6).alias("centroid_dist")
    )
