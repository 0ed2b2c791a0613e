"""Round-5e operator tests: numpy cross-checks of the closed-form
statistics (autocorrelation, Gini, chi², CUSUM argmax), the triangle
count vs a brute-force key-ordered triple join, the margin-model
zero-sum identity behind the seasonal residuals, weighted-median
invariants, and Benford output-shape gates.

(Cross-engine value parity for every round5e query is covered by
tests/test_oracle_parity.py via registry parametrization.)
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES
from featurestore_for_joycastle_java_spark.sources import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ----------------------------------------------------------- time series


def _hourly_series(spark, sf_dir) -> np.ndarray:
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            (
                F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
                * 24
                + F.hour("ts")
            ).alias("h")
        )
        .groupBy("h")
        .count()
        .collect()
    )
    counts = {r["h"]: r["count"] for r in rows}
    lo, hi = min(counts), max(counts)
    return np.array([counts.get(h, 0) for h in range(lo, hi + 1)], dtype=np.int64)


def test_autocorr_matches_numpy(spark, sf_dir):
    row = QUERIES["ts_autocorr_hourly"](spark, sf_dir).collect()[0]
    series = _hourly_series(spark, sf_dir)
    x, y = series[:-1].astype(float), series[1:].astype(float)
    expected = np.corrcoef(x, y)[0, 1]
    assert row["n_pairs"] == len(series) - 1
    assert abs(row["autocorr_lag1"] - expected) < 1e-9
    assert -1.0 <= row["autocorr_lag1"] <= 1.0


def test_cusum_matches_numpy(spark, sf_dir):
    row = QUERIES["ts_cusum_changepoint"](spark, sf_dir).collect()[0]
    days = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .count()
        .orderBy("day")
        .collect()
    )
    x = np.array([r["count"] for r in days], dtype=np.int64)
    n, s = len(x), x.sum()
    cusum = n * np.cumsum(x) - (np.arange(1, n + 1)) * s
    k = int(np.argmax(np.abs(cusum)))  # numpy argmax = first max = earliest
    assert row["n_days"] == n and row["total_events"] == s
    assert row["cusum_scaled"] == cusum[k]
    assert row["change_day"] == days[k]["day"].strftime("%Y-%m-%d")


def test_seasonal_residuals_margin_identity(spark, sf_dir):
    """Over the FULL zero-filled day×hour grid, Σ(cnt·grand −
    daytot·hourtot) = 0 — the rank-1 margin model reproduces both
    margins exactly. Recomputed here without the top-20 limit."""
    o = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), F.hour("ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dt = o.groupBy("day").agg(F.sum("cnt").alias("daytot"))
    ht = o.groupBy("hour").agg(F.sum("cnt").alias("hourtot"))
    grand = o.agg(F.sum("cnt").alias("g"))
    total = (
        dt.crossJoin(ht)
        .join(o, ["day", "hour"], "left")
        .select(
            F.coalesce("cnt", F.lit(0)).alias("cnt"), "daytot", "hourtot"
        )
        .crossJoin(grand)
        .agg(
            F.sum(
                F.col("cnt") * F.col("g") - F.col("daytot") * F.col("hourtot")
            )
        )
        .collect()[0][0]
    )
    assert total == 0


def test_seasonal_residuals_sorted_and_bounded(spark, sf_dir):
    rows = QUERIES["ts_seasonal_residuals"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    mags = [abs(r["residual_scaled"]) for r in rows]
    assert mags == sorted(mags, reverse=True)


# ------------------------------------------------------------------ eval


def test_chi2_matches_numpy(spark, sf_dir):
    row = QUERIES["eval_chi2_independence"](spark, sf_dir).collect()[0]
    obs_rows = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").alias("hour"))
        .count()
        .collect()
    )
    types = sorted({r["event_type"] for r in obs_rows})
    hours = sorted({r["hour"] for r in obs_rows})
    o = np.zeros((len(types), len(hours)))
    for r in obs_rows:
        o[types.index(r["event_type"]), hours.index(r["hour"])] = r["count"]
    e = o.sum(1, keepdims=True) * o.sum(0, keepdims=True) / o.sum()
    chi2 = ((o - e) ** 2 / e).sum()
    assert row["dof"] == (len(types) - 1) * (len(hours) - 1)
    # per-cell ppm floors undercount by < 1e-6 each
    assert chi2 - o.size * 1e-6 <= row["chi2"] <= chi2 + 1e-9
    assert row["chi2_ppm"] >= 0


# -------------------------------------------------------------- features


def test_gini_matches_numpy(spark, sf_dir):
    row = QUERIES["feature_gini_concentration"](spark, sf_dir).collect()[0]
    cents = np.sort(
        np.array(
            [
                r["cents"]
                for r in load_table(spark, sf_dir, "orders")
                .groupBy("o_custkey")
                .agg(
                    F.sum(
                        F.floor(F.col("o_totalprice") * F.lit(100.0)).cast(
                            "bigint"
                        )
                    ).alias("cents")
                )
                .collect()
            ],
            dtype=np.int64,
        )
    )
    n = len(cents)
    expected = (
        2 * (np.arange(1, n + 1) * cents).sum() - (n + 1) * cents.sum()
    ) / (n * cents.sum())
    assert row["n_customers"] == n
    assert abs(row["gini"] - expected) < 1e-12
    assert 0.0 <= row["gini"] < 1.0


def test_gini_has_no_single_partition_fact_window(spark, sf_dir):
    """The global rank must come from the two-pass bucketed helper: the
    only `Window` with an empty partition spec in the plan runs after
    an aggregation to the bucket frame, never over the customer rows.
    Cheap proxy: the plan contains a partial_count (bucket counts
    branch) and no `Sort [cents ... ], true` global sort feeding a
    window over the full frame — assert via the helper's signature
    column `_n_total` being dropped and the bucket exchange present."""
    plan = _plan(QUERIES["feature_gini_concentration"](spark, sf_dir))
    assert "hashpartitioning(_bucket" in plan


# ----------------------------------------------------------------- graph


def test_triangles_match_bruteforce(spark, sf_dir):
    """Degree-ordered enumeration must equal the declarative key-ordered
    triple join, computed independently in Spark."""
    bip = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49.0)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = bip.alias("a"), bip.alias("b")
    e = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
        .cache()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    brute = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    expected_total = brute.count() * 3
    got = QUERIES["graph_triangles_cosupply"](spark, sf_dir)
    got_total = got.agg(F.sum("n_triangles")).collect()[0][0] or 0
    assert got_total == expected_total
    e.unpersist()


def test_triangle_orientation_is_acyclic_total_order(spark, sf_dir):
    """Each triangle row (a, b, c) must satisfy the orientation
    invariant: directed edges a→b, a→c, b→c all existed, so every
    output supplier count is a multiple-free exact participation
    count (n_triangles ≥ 1 and total divisible by 3)."""
    rows = QUERIES["graph_triangles_cosupply"](spark, sf_dir).collect()
    assert all(r["n_triangles"] >= 1 for r in rows)
    assert sum(r["n_triangles"] for r in rows) % 3 == 0


# ------------------------------------------------------------------- agg


def test_weighted_median_invariants(spark, sf_dir):
    """At least half the total weight sits at or below the reported
    median, and strictly less than half sits strictly below it."""
    rows = QUERIES["agg_weighted_median"](spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * F.lit(100.0))
        .cast("bigint")
        .alias("cents"),
        F.floor("l_quantity").cast("bigint").alias("w"),
    )
    for r in rows:
        grp = e.filter(F.col("l_returnflag") == r["l_returnflag"])
        below_eq = (
            grp.filter(F.col("cents") <= r["wmedian_cents"])
            .agg(F.sum("w"))
            .collect()[0][0]
        )
        strictly_below = (
            grp.filter(F.col("cents") < r["wmedian_cents"])
            .agg(F.sum("w"))
            .collect()[0][0]
            or 0
        )
        k = (r["total_weight"] + 1) // 2
        assert below_eq >= k
        assert strictly_below < k


# --------------------------------------------------------------- quality


def test_benford_shape_and_shares(spark, sf_dir):
    rows = QUERIES["quality_benford_digits"](spark, sf_dir).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    total_share = sum(r["share_ppm"] for r in rows)
    # ppm floors: within 9 ulp-of-ppm below 1e6
    assert 1_000_000 - 9 <= total_share <= 1_000_000
    # constants match log10(1+1/d) to the floor-ppm
    import math

    for r in rows:
        exact = math.log10(1 + 1 / r["digit"]) * 1e6
        assert abs(r["benford_ppm"] - exact) < 1.0


def test_benford_single_shuffle_plan(spark, sf_dir):
    """One fact pass: the plan has no join on the fact side other than
    the broadcast of the 1-row total (no SortMergeJoin anywhere)."""
    plan = _plan(QUERIES["quality_benford_digits"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
