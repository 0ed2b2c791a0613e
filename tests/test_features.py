"""Feature operators: EWMA decay — fold semantics, null handling, and
the bounded time-slice envelope."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.operators.features import ewma_decay


def _ewma_py(vals, alpha=0.3):
    acc = vals[0]
    for v in vals[1:]:
        acc = alpha * v + (1 - alpha) * acc
    return round(acc, 6)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id bigint, value double"
    )


def test_ewma_matches_reference_fold(spark):
    rows = [
        ("u1", datetime(2024, 1, 1, 0, 0, i), i, float(v))
        for i, v in enumerate([10, 20, 5, 40])
    ] + [("u2", datetime(2024, 1, 1), 0, 7.0)]
    out = {
        r["user_id"]: r
        for r in ewma_decay(
            _mk(spark, rows), "user_id", "ts", "event_id", "value"
        ).collect()
    }
    assert out["u1"]["ewma_value"] == pytest.approx(
        _ewma_py([10.0, 20.0, 5.0, 40.0]), abs=1e-9
    )
    assert out["u1"]["n_events"] == 4
    # single event: EWMA is the seed value itself
    assert out["u2"]["ewma_value"] == 7.0


def test_ewma_drops_null_values_explicitly(spark):
    rows = [
        ("u1", datetime(2024, 1, 1, 0, 0, 0), 0, 10.0),
        ("u1", datetime(2024, 1, 1, 0, 0, 1), 1, None),
        ("u1", datetime(2024, 1, 1, 0, 0, 2), 2, 20.0),
    ]
    row = ewma_decay(
        _mk(spark, rows), "user_id", "ts", "event_id", "value"
    ).collect()[0]
    # n_events counts only the values that entered the fold
    assert row["n_events"] == 2
    assert row["ewma_value"] == pytest.approx(_ewma_py([10.0, 20.0]), abs=1e-9)


def test_ewma_since_bounds_the_time_slice(spark):
    rows = [
        ("u1", datetime(2024, 1, d, 0, 0, 0), d, float(d)) for d in range(1, 11)
    ]
    df = _mk(spark, rows)
    cut = datetime(2024, 1, 6)
    bounded = ewma_decay(
        df, "user_id", "ts", "event_id", "value", since=F.lit(cut)
    ).collect()[0]
    # the bounded run IS the unbounded run over the pre-filtered slice —
    # a hot entity's aggregation buffer holds only the slice's events
    unbounded_on_slice = ewma_decay(
        df.filter(F.col("ts") >= F.lit(cut)),
        "user_id",
        "ts",
        "event_id",
        "value",
    ).collect()[0]
    assert bounded["n_events"] == 5
    assert bounded["ewma_value"] == unbounded_on_slice["ewma_value"]
    assert bounded["ewma_value"] == pytest.approx(
        _ewma_py([6.0, 7.0, 8.0, 9.0, 10.0]), abs=1e-9
    )


def test_ewma_since_predicate_reaches_the_scan(spark, tmp_path):
    # the time-slice bound must push down to the parquet scan (at 100 TB
    # the filter shrinks the read, not just the state)
    rows = [
        ("u1", datetime(2024, 1, d, 0, 0, 0), d, float(d)) for d in range(1, 11)
    ]
    p = str(tmp_path / "ev.parquet")
    _mk(spark, rows).write.parquet(p)
    plan = ewma_decay(
        spark.read.parquet(p),
        "user_id",
        "ts",
        "event_id",
        "value",
        since=F.lit(datetime(2024, 1, 6)),
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual" in plan
