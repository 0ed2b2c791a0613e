"""Round-10 additions: six LLM-pipeline / feature-engineering queries.
Oracle parity is covered by the registry-wide parametrization in
test_oracle_parity.py; these tests pin the semantic invariants the
value-hash compare can't articulate (identities, bounds, monotone
relations) so a future refactor that stays self-consistent on both
engines but drifts from the statistic's definition still fails."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES


def test_substring_ngrams_bounds(spark, sf_dir):
    rows = QUERIES["dedup_substring_ngrams"](spark, sf_dir).collect()
    assert rows, "documents fixture is non-empty"
    assert any(r["n_dup_grams"] > 0 for r in rows), (
        "fixture contains near-duplicate docs; some 8-gram must repeat"
    )
    for r in rows:
        assert 0 <= r["n_dup_grams"] <= r["n_grams"]
        assert 0 <= r["dup_ppm"] <= 1_000_000
        if r["n_grams"] > 0:
            assert r["dup_ppm"] == r["n_dup_grams"] * 1_000_000 // r["n_grams"]


def test_gopher_keep_is_the_conjunction(spark, sf_dir):
    rows = QUERIES["text_gopher_rules"](spark, sf_dir).collect()
    kept = 0
    for r in rows:
        expect = (
            50 <= r["n_words"] <= 100_000
            and 300 <= r["mean_word_len_x100"] <= 1000
            and r["alpha_ppm"] >= 800_000
            and r["n_stop_distinct"] >= 2
        )
        assert r["keep"] == expect
        kept += r["keep"]
    # the fixture discriminates: both outcomes occur
    assert 0 < kept < len(rows)


def test_woe_iv_identity(spark, sf_dir):
    """Recompute WOE/IV from the emitted counts — the micro values must
    match the definition to <= 1 micro unit (rounding), and IV must be
    the sum of contributions and non-negative (it's an f-divergence)."""
    rows = QUERIES["feature_woe_iv"](spark, sf_dir).collect()
    pos_t = sum(r["n_pos"] for r in rows)
    neg_t = sum(r["n_neg"] for r in rows)
    iv = 0
    for r in rows:
        pp = (r["n_pos"] + 0.5) / (pos_t + 2.5)
        pn = (r["n_neg"] + 0.5) / (neg_t + 2.5)
        woe = math.log(pp / pn)
        assert abs(r["woe_micro"] - woe * 1e6) <= 1.0
        iv += round((pp - pn) * woe * 1e6)
    assert all(r["iv_micro"] == rows[0]["iv_micro"] for r in rows)
    assert abs(rows[0]["iv_micro"] - iv) <= len(rows)
    assert rows[0]["iv_micro"] >= 0


def test_mutual_information_bounds(spark, sf_dir):
    """0 <= I(X;Y) <= min(H(X), H(Y)) <= ln(min(|X|,|Y|)); micro-rounding
    can push the sum a hair below zero, no further."""
    row = QUERIES["eval_mutual_information"](spark, sf_dir).collect()[0]
    assert row["n_cells"] <= 5 * 10
    assert row["mi_micronats"] >= -row["n_cells"]  # rounding slack only
    assert row["mi_micronats"] <= math.log(5) * 1e6


def test_brier_murphy_identity(spark, sf_dir):
    """BS = REL - RES + UNC is exact only when forecasts are constant
    within a bin (Murphy 1973 bins by unique forecast value); with 10
    equal-width bins the residual is the within-bin score variance,
    bounded by (bin_width/2)^2 = 2500 micro (observed ~537 on the
    fixture), plus the independent integer floors."""
    row = QUERIES["eval_brier_decomposition"](spark, sf_dir).collect()[0]
    assert 0 <= row["brier_micro"] <= 1_000_000
    assert row["reliability_micro"] >= 0
    assert row["resolution_micro"] >= 0
    assert 0 <= row["uncertainty_micro"] <= 250_000  # p(1-p) <= 1/4
    lhs = row["brier_micro"]
    rhs = (
        row["reliability_micro"]
        - row["resolution_micro"]
        + row["uncertainty_micro"]
    )
    assert abs(lhs - rhs) <= 2600


def test_mann_kendall_invariants(spark, sf_dir):
    rows = QUERIES["ts_mann_kendall"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r["n_days"]
        max_s = n * (n - 1) // 2
        assert -max_s <= r["s_stat"] <= max_s
        assert 0 <= r["var18"] <= n * (n - 1) * (2 * n + 5)
        assert r["trend"] == (
            "increasing"
            if r["s_stat"] > 0
            else "decreasing" if r["s_stat"] < 0 else "flat"
        )
        # |z| <= |S| / sqrt(Var): continuity correction only shrinks
        if r["var18"] > 0:
            zmax = abs(r["s_stat"]) / math.sqrt(r["var18"] / 18.0)
            assert abs(r["z_micro"]) <= zmax * 1e6 + 1


def test_mann_kendall_detects_planted_trend(spark, sf_dir):
    """A strictly increasing daily series must come out S = max pairs,
    z > 0, 'increasing' — pinned on a planted frame, independent of the
    fixture's actual drift."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    data = [
        (base + datetime.timedelta(days=i), "planted", float(i), i)
        for i in range(12)
        for _ in range(i + 1)  # day i has i+1 events: strictly rising
    ]
    df = spark.createDataFrame(
        [(d, t, v, i * 100 + j) for j, (d, t, v, i) in enumerate(data)],
        "ts timestamp, event_type string, value double, event_id long",
    ).withColumn("user_id", F.lit(1)).withColumn("props", F.lit("{}"))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        rows = QUERIES["ts_mann_kendall"](spark, td).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_days"] == 12
    assert r["s_stat"] == 12 * 11 // 2  # every later day strictly higher
    assert r["var18"] == 12 * 11 * 29  # no ties
    assert r["trend"] == "increasing"
    assert r["z_micro"] > 3_000_000  # z >> 3: unambiguous trend
