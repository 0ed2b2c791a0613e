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


def test_mann_whitney_matches_python_reference(spark, sf_dir):
    """Independent recompute of U and z from the raw rows (average
    ranks, tie-corrected variance, continuity correction)."""
    import collections

    from featurestore_for_joycastle_java_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("value", "event_type")
        .collect()
    )
    n1 = sum(1 for r in rows if r["event_type"] == "purchase")
    n2 = len(rows) - n1
    by_v = collections.Counter(r["value"] for r in rows)
    cum, avg_rank = 0, {}
    for v in sorted(by_v):
        t = by_v[v]
        avg_rank[v] = cum + (t + 1) / 2
        cum += t
    r1 = sum(avg_rank[r["value"]] for r in rows if r["event_type"] == "purchase")
    u1 = n1 * n2 + n1 * (n1 + 1) / 2 - r1
    tie_cubes = sum(t**3 - t for t in by_v.values())
    var = (n1 * n2 / 12) * (
        (n1 + n2 + 1) - tie_cubes / ((n1 + n2) * (n1 + n2 - 1))
    )
    mu = n1 * n2 / 2
    z = (
        (u1 - mu - 0.5) / math.sqrt(var)
        if u1 > mu
        else ((u1 - mu + 0.5) / math.sqrt(var) if u1 < mu else 0.0)
    )
    got = QUERIES["eval_mann_whitney"](spark, sf_dir).collect()[0]
    assert got["n_a"] == n1 and got["n_b"] == n2
    assert got["u1_x2"] == round(2 * u1)
    assert got["tie_cubes"] == tie_cubes
    assert abs(got["z_micro"] - z * 1e6) <= 1.0


def test_welch_matches_python_reference(spark, sf_dir):
    from featurestore_for_joycastle_java_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("value", "event_type")
        .collect()
    )
    a = [math.floor(r["value"] * 1e6) for r in rows if r["event_type"] == "purchase"]
    b = [math.floor(r["value"] * 1e6) for r in rows if r["event_type"] == "click"]

    def stats(x):
        n = len(x)
        m = sum(x) / n
        return n, m, sum((xi - m) ** 2 for xi in x) / (n - 1)

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    df = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    got = QUERIES["eval_welch_ttest"](spark, sf_dir).collect()[0]
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["mean_a_micro"] == sum(a) // na
    assert got["mean_b_micro"] == sum(b) // nb
    # the engine's variance uses the (sum_sq - sum^2/n) form; allow the
    # float-rearrangement slack on the final micro-rounded stats
    assert abs(got["t_micro"] - t * 1e6) <= 2.0
    assert abs(got["df_milli"] - df * 1e3) <= 2.0


def test_kappa_bounds_and_identity(spark, sf_dir):
    got = QUERIES["eval_cohens_kappa"](spark, sf_dir).collect()[0]
    assert got["n_agree"] <= got["n_rows"]
    assert got["po_ppm"] == got["n_agree"] * 1_000_000 // got["n_rows"]
    assert -1_000_000 <= got["kappa_micro"] <= 1_000_000
    # kappa sign must agree with po vs pe
    if got["po_ppm"] > got["pe_ppm"]:
        assert got["kappa_micro"] > 0
    elif got["po_ppm"] < got["pe_ppm"]:
        assert got["kappa_micro"] < 0


def test_funnel_monotone_and_windowed(spark, sf_dir):
    """Stage counts are monotone non-increasing, and the 24 h window
    genuinely discriminates (conversion strictly below 100% past the
    first stage on the fixture)."""
    got = QUERIES["feature_funnel_stages"](spark, sf_dir).collect()[0]
    assert got["n_users"] >= got["n_view"] >= got["n_click"] >= got["n_purchase"]
    assert got["n_click"] < got["n_view"]  # window bites
    assert got["view_ppm"] == got["n_view"] * 1_000_000 // got["n_users"]


def test_cohort_week0_is_full_retention(spark, sf_dir):
    """By construction every user's first-purchase week is active, so
    offset 0 retention is exactly 100%; later offsets never exceed the
    cohort size."""
    rows = QUERIES["feature_cohort_retention"](spark, sf_dir).collect()
    assert rows
    week0 = [r for r in rows if r["offset_weeks"] == 0]
    assert week0 and all(
        r["n_active"] == r["cohort_size"] and r["retention_ppm"] == 1_000_000
        for r in week0
    )
    assert all(0 < r["n_active"] <= r["cohort_size"] for r in rows)
    assert all(r["offset_weeks"] >= 0 for r in rows)


def test_theil_sen_matches_python_reference(spark, sf_dir):
    import collections

    from featurestore_for_joycastle_java_spark.sources import load_table

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("d"))
        .count()
        .collect()
    )
    by = collections.defaultdict(list)
    for r in daily:
        by[r["event_type"]].append((r["d"], r["count"]))
    expect = {}
    for t, pts in by.items():
        pts.sort()
        slopes = sorted(
            round((cb - ca) / (db - da).days * 1e6)
            for i, (da, ca) in enumerate(pts)
            for db, cb in pts[i + 1 :]
        )
        n = len(slopes)
        med2 = (
            2 * slopes[(n - 1) // 2]
            if n % 2
            else slopes[n // 2 - 1] + slopes[n // 2]
        )
        expect[t] = (n, med2)
    got = QUERIES["ts_theil_sen"](spark, sf_dir).collect()
    assert {r["event_type"]: (r["n_pairs"], r["sen_slope_x2_micro"]) for r in got} == expect


def test_hits_int_planted_star(spark):
    """Independent integer replay on a planted star-ish graph: supplier
    node 2 receives from every customer, so it must pin at the max
    authority score of exactly SCALE; the replay recomputes every score
    bit-for-bit."""
    from featurestore_for_joycastle_java_spark.operators.graph import (
        SCALE,
        hits_int,
    )

    edges = [(1, 2), (3, 2), (5, 2), (1, 4), (3, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["node"], r["side"]): r["score_micro"]
        for r in hits_int(df, iterations=3).collect()
    }

    h = {u: SCALE for u, _ in edges}
    a = {}
    for _ in range(3):
        raw_a = {}
        for u, v in edges:
            raw_a[v] = raw_a.get(v, 0) + h[u]
        m = max(raw_a.values())
        a = {v: (r * SCALE) // m for v, r in raw_a.items()}
        raw_h = {}
        for u, v in edges:
            raw_h[u] = raw_h.get(u, 0) + a[v]
        m = max(raw_h.values())
        h = {u: (r * SCALE) // m for u, r in raw_h.items()}
    expect = {(u, "hub"): s for u, s in h.items()} | {
        (v, "authority"): s for v, s in a.items()
    }
    assert got == expect
    assert got[(2, "authority")] == SCALE


def test_hits_int_fixture_invariants(spark, sf_dir):
    rows = QUERIES["graph_hits_int"](spark, sf_dir).collect()
    hubs = [r for r in rows if r["side"] == "hub"]
    auths = [r for r in rows if r["side"] == "authority"]
    # bipartite: customers are exactly the hubs, suppliers the authorities
    assert all(r["kind"] == "customer" for r in hubs)
    assert all(r["kind"] == "supplier" for r in auths)
    assert max(r["score_micro"] for r in hubs) == 1_000_000
    assert max(r["score_micro"] for r in auths) == 1_000_000
    assert all(0 <= r["score_micro"] <= 1_000_000 for r in rows)


def test_gram_matrix_vs_numpy(spark, sf_dir):
    import numpy as np

    from featurestore_for_joycastle_java_spark.sources import load_table

    vecs = [
        np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6).astype(
            np.int64
        )
        for r in load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .collect()
    ]
    x = np.stack(vecs)
    full = x.T @ x  # exact: int64 products/sums within range at fixture scale
    rows = QUERIES["sim_gram_matrix"](spark, sf_dir).collect()
    d = x.shape[1]
    assert len(rows) == d * (d + 1) // 2
    assert all(r["n_vectors"] == len(vecs) for r in rows)
    for r in rows[:200]:
        assert r["gram_micro2"] == full[r["i"] - 1, r["j"] - 1]
    # Cauchy-Schwarz on the exact integer Gram
    g = {(r["i"], r["j"]): r["gram_micro2"] for r in rows}
    for (i, j), v in list(g.items())[:200]:
        assert v * v <= g[(i, i)] * g[(j, j)]
