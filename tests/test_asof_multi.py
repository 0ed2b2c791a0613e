"""r5 as-of surface: multi-right single-shuffle join and the bucketed
skew-mitigation path — both pinned result-identical to the plain
asof_join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.operators.asof import (
    asof_join,
    asof_join_bucketed,
    multi_asof_join,
)


def _sorted(df, cols):
    return sorted(
        (tuple(r) for r in df.select(*cols).collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_multi_asof_equals_chained_single_asofs(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (2, 5), (3, 40)], "k long, t long"
    )
    r1 = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 7, 700.0)],
        "k long, t long, f1 double",
    )
    r2 = spark.createDataFrame(
        [(1, 24, 11.0), (3, 40, 33.0)], "k long, t long, f2 double"
    )
    multi = multi_asof_join(
        left, [(r1, "t", ["f1"], "a"), (r2, "t", ["f2"], "b")], ["k"], "t"
    )
    chained = asof_join(
        asof_join(left, r1, ["k"], "t", "t", ["f1"], "backward").drop(
            "t_matched"
        ),
        r2,
        ["k"],
        "t",
        "t",
        ["f2"],
        "backward",
    )
    cols = ["k", "t", "f1", "f2"]
    got = _sorted(multi, cols)
    assert got == _sorted(chained, cols)
    # spot values: backward-inclusive ties (k=1,t=10 matches r1@10;
    # k=3,t=40 matches r2@40), misses stay null
    assert got == [
        (1, 10, 100.0, None),
        (1, 25, 200.0, 11.0),
        (2, 5, None, None),
        (3, 40, None, 33.0),
    ]


def test_multi_asof_rejects_duplicate_payload_names(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    r = spark.createDataFrame([(1, 5, 1.0)], "k long, t long, f double")
    with pytest.raises(ValueError, match="duplicate payload column"):
        multi_asof_join(
            left, [(r, "t", ["f"], "a"), (r, "t", ["f"], "b")], ["k"], "t"
        )


def test_multi_asof_payload_struct_is_atomic(spark):
    """A matched row with a NULL payload value must yield (null value,
    that row's ts) — never a stale value from an earlier right row."""
    left = spark.createDataFrame([(1, 30)], "k long, t long")
    r = spark.createDataFrame(
        [(1, 10, 5.0), (1, 20, None)], "k long, t long, f double"
    )
    row = multi_asof_join(left, [(r, "t", ["f"], "a")], ["k"], "t").collect()[0]
    assert row["f"] is None and row["a_ts_matched"] == 20


def _bucketed_equiv_check(spark, left, right, width):
    plain = asof_join(
        left, right, ["k"], "t", "t", ["v"], direction="backward"
    )
    buck = asof_join_bucketed(left, right, ["k"], "t", "t", ["v"], width)
    cols = ["k", "t", "v", "t_matched"]
    assert _sorted(buck, cols) == _sorted(plain, cols)


def test_bucketed_asof_matches_plain_small(spark):
    left = spark.createDataFrame(
        [(1, t) for t in (0, 5, 10, 99, 100, 250)] + [(2, 50)],
        "k long, t long",
    )
    right = spark.createDataFrame(
        [(1, 3, 1.0), (1, 10, 2.0), (1, 90, 3.0), (1, 200, 4.0)],
        "k long, t long, v double",
    )
    # widths spanning within-bucket, adjacent-bucket and far-carry matches
    for width in (7, 100, 1000):
        _bucketed_equiv_check(spark, left, right, width)


def test_bucketed_asof_matches_plain_on_hot_key(spark):
    """Skewed fixture: one entity owns ~95% of rows. The bucketed path
    must (a) return the identical result and (b) partition its heavy
    window by (key, bucket) so the hot key splits across its time range
    instead of serializing into one task."""
    import contextlib
    import io

    n = 20_000
    left = spark.range(n).select(
        F.when(F.col("id") % 20 == 0, F.col("id") % 7).otherwise(0).alias("k"),
        (F.col("id") * 13 % 100_000).alias("t"),
    )
    right = spark.range(n // 4).select(
        F.when(F.col("id") % 20 == 0, F.col("id") % 7).otherwise(0).alias("k"),
        (F.col("id") * 29 % 100_000).alias("t"),
        (F.col("id") * 1.0).alias("v"),
    ).groupBy("k", "t").agg(F.max("v").alias("v"))  # unique (k, t)
    _bucketed_equiv_check(spark, left, right, 1000)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join_bucketed(
            left, right, ["k"], "t", "t", ["v"], 1000
        ).explain("formatted")
    plan = buf.getvalue()
    import re

    assert re.search(r"hashpartitioning\(k#\d+L?, __asof_bkt", plan), (
        "heavy window must partition by (key, bucket)"
    )


def test_bucketed_asof_matches_plain_on_null_keys(spark):
    """r5 review fix: NULL join keys group into one window partition in
    the plain as-of, so the bucketed path's carry stitch must join
    null-safely — including cross-bucket carries for NULL-key rows."""
    left = spark.createDataFrame(
        [(None, 100), (None, 5), (1, 100)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(None, 3, 7.0), (1, 4, 9.0)], "k long, t long, v double"
    )
    _bucketed_equiv_check(spark, left, right, 50)
    got = {
        (r["k"], r["t"]): r["v"]
        for r in asof_join_bucketed(
            left, right, ["k"], "t", "t", ["v"], 50
        ).collect()
    }
    # cross-bucket carry for the NULL key (t=100 matches right @3)
    assert got == {(None, 100): 7.0, (None, 5): 7.0, (1, 100): 9.0}


def test_multi_asof_rejects_duplicate_tags(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    r1 = spark.createDataFrame([(1, 5, 1.0)], "k long, t long, f1 double")
    r2 = spark.createDataFrame([(1, 5, 2.0)], "k long, t long, f2 double")
    with pytest.raises(ValueError, match="duplicate payload column"):
        multi_asof_join(
            left, [(r1, "t", ["f1"], "a"), (r2, "t", ["f2"], "a")], ["k"], "t"
        )


def test_asof_tolerance_bounds_staleness(spark):
    """r5: tolerance nulls matches older than the bound — payload and
    matched ts together (atomic), fresh matches untouched, and
    tolerance=None keeps full backward semantics."""
    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 95, 9.5), (1, 120, 1.2), (2, 10, 0.1)], "k long, t long, v double"
    )

    def got(tol):
        return {
            (r["k"], r["t"]): (r["v"], r["t_matched"])
            for r in asof_join(
                left, right, ["k"], "t", "t", ["v"], "backward",
                tolerance=tol,
            ).collect()
        }

    assert got(None) == {
        (1, 100): (9.5, 95),
        (1, 200): (1.2, 120),
        (2, 50): (0.1, 10),
    }
    # tol=40: (2,50) matched @10 is 40 old -> inclusive boundary survives;
    # tol=39 expires it; (1,200) matched @120 is 80 old -> needs tol>=80
    assert got(40) == {
        (1, 100): (9.5, 95),
        (1, 200): (None, None),
        (2, 50): (0.1, 10),
    }
    assert got(39)[(2, 50)] == (None, None)
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, ["k"], "t", "t", ["v"], tolerance=-1)


def test_asof_null_right_ts_never_matches(spark):
    """r5 review fix: a right row with NULL timestamp can never satisfy
    l.ts >= r.ts (DuckDB ASOF matches nothing) — it must not fill a
    half-row (payload with null matched ts), with or without tolerance,
    in any as-of variant."""
    left = spark.createDataFrame([(1, 100)], "k long, t long")
    right = spark.createDataFrame(
        [(1, None, 5.0), (1, 10, 7.0)], "k long, t long, v double"
    )
    for kwargs in ({}, {"tolerance": 1000}):
        row = asof_join(
            left, right, ["k"], "t", "t", ["v"], "backward", **kwargs
        ).collect()[0]
        assert (row["v"], row["t_matched"]) == (7.0, 10), kwargs
    # with ONLY a null-ts right row: no match at all
    right_null = spark.createDataFrame([(1, None, 5.0)], "k long, t long, v double")
    row = asof_join(
        left, right_null, ["k"], "t", "t", ["v"], "backward"
    ).collect()[0]
    assert (row["v"], row["t_matched"]) == (None, None)
    # multi-right and bucketed variants follow the same rule
    row = multi_asof_join(
        left, [(right_null, "t", ["v"], "a")], ["k"], "t"
    ).collect()[0]
    assert (row["v"], row["a_ts_matched"]) == (None, None)
    row = asof_join_bucketed(
        left, right_null, ["k"], "t", "t", ["v"], 50
    ).collect()[0]
    assert (row["v"], row["t_matched"]) == (None, None)
