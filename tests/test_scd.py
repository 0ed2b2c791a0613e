"""SCD maintenance operators (operators/scd.py): history build,
apply-changes (MERGE), latest-wins upsert — including the composition law
the r5 oracle relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.operators.scd import (
    scd1_upsert,
    scd2_apply,
    scd2_build,
)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, t long, value double, event_id long"
    )


def _rows(df):
    return sorted(
        (
            tuple(r)
            for r in df.select(
                "user_id", "value", "valid_from", "valid_to", "is_current"
            ).collect()
        ),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_scd2_build_collapses_runs(spark):
    log = _log(
        spark,
        [
            (1, 10, 1.0, 1),
            (1, 20, 1.0, 2),   # run-continuation: no new version
            (1, 30, 2.0, 3),
            (1, 40, 1.0, 4),   # back to 1.0 IS a change
            (2, 10, 5.0, 5),
        ],
    )
    hist = _rows(scd2_build(log, "user_id", "t", "value", "event_id"))
    assert hist == [
        (1, 1.0, 10, 30, False),
        (1, 1.0, 40, None, True),
        (1, 2.0, 30, 40, False),
        (2, 5.0, 10, None, True),
    ]


def test_scd2_apply_equals_full_rebuild_any_split(spark):
    """Composition law: apply(build(prefix), suffix) == build(full) for
    EVERY time split — the property the feature_scd2_apply oracle rests
    on."""
    rows = [
        (u, t, float((u * 7 + t * 3) % 4 // 2), u * 100 + t)
        for u in range(1, 6)
        for t in range(10, 100, 10)
    ]
    log = _log(spark, rows)
    full = _rows(scd2_build(log, "user_id", "t", "value", "event_id"))
    for cut in (5, 35, 55, 95, 150):
        dim = scd2_build(
            log.filter(F.col("t") < cut), "user_id", "t", "value", "event_id"
        )
        applied = scd2_apply(
            dim,
            log.filter(F.col("t") >= cut),
            "user_id",
            "t",
            "value",
            "event_id",
        )
        assert _rows(applied) == full, f"split at {cut} diverged"


def test_scd2_apply_noop_change_creates_no_version(spark):
    dim = scd2_build(
        _log(spark, [(1, 10, 1.0, 1)]), "user_id", "t", "value", "event_id"
    )
    batch = _log(spark, [(1, 20, 1.0, 2)])  # same value: no-op
    out = _rows(scd2_apply(dim, batch, "user_id", "t", "value", "event_id"))
    assert out == [(1, 1.0, 10, None, True)]


def test_scd2_apply_drops_late_rows(spark):
    dim = scd2_build(
        _log(spark, [(1, 50, 1.0, 1)]), "user_id", "t", "value", "event_id"
    )
    late = _log(spark, [(1, 40, 9.0, 2), (1, 50, 9.0, 3)])  # ts <= valid_from
    out = _rows(scd2_apply(dim, late, "user_id", "t", "value", "event_id"))
    assert out == [(1, 1.0, 50, None, True)]


def test_scd2_apply_inserts_new_key_history(spark):
    dim = scd2_build(
        _log(spark, [(1, 10, 1.0, 1)]), "user_id", "t", "value", "event_id"
    )
    batch = _log(spark, [(7, 20, 3.0, 2), (7, 30, 4.0, 3)])
    out = _rows(scd2_apply(dim, batch, "user_id", "t", "value", "event_id"))
    assert out == [
        (1, 1.0, 10, None, True),
        (7, 3.0, 20, 30, False),
        (7, 4.0, 30, None, True),
    ]


def test_scd1_upsert_latest_wins_and_passthrough(spark):
    dim = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "user_id long, latest_value double"
    )
    batch = spark.createDataFrame(
        [(2, 9.0), (3, 3.0)], "user_id long, latest_value double"
    )
    out = sorted(
        tuple(r) for r in scd1_upsert(dim, batch, "user_id").collect()
    )
    assert out == [(1, 1.0), (2, 9.0), (3, 3.0)]


def test_scd2_apply_preserves_null_valued_open_row(spark):
    """r5 review fix: an open row whose current value is NULL must
    survive an apply (the seed row used to collapse against its own
    null lag), and the composition law must hold through NULL runs."""
    log = spark.createDataFrame(
        [(1, 10, 1.0, 1), (1, 20, None, 2), (1, 30, 2.0, 3)],
        "user_id long, t long, value double, event_id long",
    )
    full = _rows(scd2_build(log, "user_id", "t", "value", "event_id"))
    assert full == [
        (1, 1.0, 10, 20, False),
        (1, 2.0, 30, None, True),
        (1, None, 20, 30, False),
    ]
    for cut in (15, 25, 35):
        dim = scd2_build(
            log.filter(F.col("t") < cut), "user_id", "t", "value", "event_id"
        )
        applied = scd2_apply(
            dim,
            log.filter(F.col("t") >= cut),
            "user_id",
            "t",
            "value",
            "event_id",
        )
        assert _rows(applied) == full, f"split at {cut} diverged"
    # identity: applying an EMPTY batch must return the dimension as-is
    dim = scd2_build(log, "user_id", "t", "value", "event_id")
    empty = log.filter(F.lit(False))
    assert _rows(scd2_apply(dim, empty, "user_id", "t", "value", "event_id")) == full


def test_scd2_build_keeps_null_first_value(spark):
    """A key whose FIRST change-log value is NULL still opens a version."""
    log = _log(spark, [(9, 5, None, 1), (9, 6, None, 2), (9, 7, 3.0, 3)])
    assert _rows(scd2_build(log, "user_id", "t", "value", "event_id")) == [
        (9, 3.0, 7, None, True),
        (9, None, 5, 7, False),
    ]
