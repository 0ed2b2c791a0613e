"""Round-10e additions: ER blocking metrics, log2 histogram, rolling
median, binary segmentation. Oracle parity is covered by
test_oracle_parity.py; these pin semantics with independent pure-Python
replays and structural identities."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES


def test_er_blocking_keeps_and_matches_all_truth(spark, sf_dir):
    """The fixture's corruption touches only the 18th name character,
    while the block key is name chars 10-13 and nationkey — so blocking
    must keep EVERY true pair (pair completeness exactly 1.0) and the
    lev<=1 + exact-acctbal matcher must accept every one (recall
    exactly 1.0); precision is below 1.0 exactly when key-neighbor
    collisions share a block — replayed exactly."""
    row = QUERIES["er_blocking_metrics"](spark, sf_dir).collect()[0]
    n_cust, n_true = duckdb.sql(
        "SELECT COUNT(*), COUNT(*) FILTER (WHERE c_custkey % 50 = 0)"
        f" FROM '{sf_dir}/customer.parquet'"
    ).fetchone()
    assert row["n_records"] == n_cust + n_true
    assert row["n_true_pairs"] == n_true
    assert row["pair_completeness_ppm"] == 1_000_000
    assert row["recall_ppm"] == 1_000_000
    assert 0 < row["precision_ppm"] <= 1_000_000
    assert row["n_matched_pairs"] >= n_true
    # candidate space is a tiny fraction of n(n-1)/2
    assert row["reduction_ratio_ppm"] > 900_000


def test_log2_histogram_buckets_are_exact(spark, sf_dir):
    rows = QUERIES["agg_log2_histogram"](spark, sf_dir).collect()
    vals = duckdb.sql(
        "SELECT event_type, CAST(FLOOR(value * 100.0) AS BIGINT) + 1"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    ref = defaultdict(lambda: [0, None, None])
    for et, vc in vals:
        b = vc.bit_length() - 1
        cell = ref[(et, b)]
        cell[0] += 1
        cell[1] = vc if cell[1] is None else min(cell[1], vc)
        cell[2] = vc if cell[2] is None else max(cell[2], vc)
    got = {(r["event_type"], r["bucket"]): r for r in rows}
    assert set(got) == set(ref)
    for key, (n, lo, hi) in ref.items():
        r = got[key]
        assert (r["n"], r["lo_cents"], r["hi_cents"]) == (n, lo, hi)
        b = key[1]
        assert 2**b <= lo <= hi < 2 ** (b + 1)
    assert sum(r["n"] for r in rows) == len(vals)


def _day_series(sf_dir):
    days = duckdb.sql(
        "SELECT event_type, DATE_TRUNC('day', ts) AS day, COUNT(*)"
        f" FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = defaultdict(list)
    for et, day, cnt in days:
        series[et].append((day, cnt))
    return series


def test_rolling_median_matches_sorted_window(spark, sf_dir):
    rows = QUERIES["ts_rolling_median_7d"](spark, sf_dir).collect()
    series = _day_series(sf_dir)
    got = {(r["event_type"], r["day"].date()): r for r in rows}
    assert len(got) == len(rows)
    for et, pts in series.items():
        cnts = [c for _, c in pts]
        for i, (day, cnt) in enumerate(pts):
            win = sorted(cnts[max(0, i - 6) : i + 1])
            k = len(win)
            med2 = win[(k + 1) // 2 - 1] + win[k // 2]
            r = got[(et, day.date() if hasattr(day, "date") else day)]
            assert (r["cnt"], r["n_window"], r["med7_x2"]) == (cnt, k, med2)


def test_binary_segmentation_matches_pure_python_replay(spark, sf_dir):
    rows = QUERIES["ts_binary_segmentation"](spark, sf_dir).collect()
    series = _day_series(sf_dir)
    got = {r["event_type"]: r for r in rows}
    assert set(got) == set(series)
    for et, pts in series.items():
        xs = [c for _, c in pts]
        n = len(xs)
        s = sum(xs)
        best = None
        run = 0
        psum = 0
        for t in range(1, n):  # split after position t (1-based), t < n
            run += xs[t - 1] * n - s
            psum += xs[t - 1]
            key = (abs(run), -t)
            if best is None or key > best[0]:
                best = (key, t, psum)
        (_, t, psum) = best
        r = got[et]
        assert (r["n_left"], r["n_right"]) == (t, n - t)
        day = pts[t - 1][0]
        gd = r["split_day"].date() if hasattr(r["split_day"], "date") else r["split_day"]
        assert gd == (day.date() if hasattr(day, "date") else day)
        assert r["cusum_peak"] == best[0][0]
        assert r["mean_left"] == psum // t
        assert r["mean_right"] == (s - psum) // (n - t)
