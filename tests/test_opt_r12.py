"""Round-12 optimization internals: the NumPy Gram kernel and the
vectorized quota update must be EXACTLY equivalent to the declarative /
per-row forms they replaced."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.operators.gram import gram_cells


def _declarative_gram(df, upper_only: bool):
    """The pre-r12 posexplode + self-equi-join Gram — kept here as the
    reference implementation the kernel must reproduce bit-for-bit."""
    x = df.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.floor(F.col("val").cast("double") * F.lit(1000000.0)).alias("v6"),
    )
    a = x.select("vec_id", "i", F.col("v6").alias("__va"))
    b = x.select(
        F.col("vec_id").alias("__vid"),
        F.col("i").alias("j"),
        F.col("v6").alias("__vb"),
    )
    cond = F.col("vec_id") == F.col("__vid")
    if upper_only:
        cond = cond & (F.col("i") <= F.col("j"))
    return (
        a.join(b, cond)
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("__va") * F.col("__vb")).cast("decimal(38,0)"))
            .alias("g")
        )
    )


@pytest.mark.parametrize("upper_only", [True, False])
def test_gram_cells_matches_declarative_join(spark, upper_only):
    import random

    rng = random.Random(7)
    # negative values, magnitudes past 1.0, several partitions, and a
    # row count that does not divide the partition count
    rows = [
        (i, [rng.uniform(-3.0, 3.0) for _ in range(5)]) for i in range(403)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(7)
    got = {
        (r["i"], r["j"]): int(r["g"])
        for r in gram_cells(df, upper_only=upper_only)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
        .collect()
    }
    want = {
        (r["i"], r["j"]): int(r["g"])
        for r in _declarative_gram(df, upper_only).collect()
    }
    assert got == want
    assert len(got) == (15 if upper_only else 25)


def test_gram_cells_null_and_empty_rows(spark):
    rows = [
        (1, [1.0, 2.0]),
        (2, None),  # null vector: contributes nothing (posexplode parity)
        (3, []),  # empty vector: contributes nothing
        (4, [0.5, -0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["i"], r["j"]): int(r["g"])
        for r in gram_cells(df, upper_only=True)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
        .collect()
    }
    want = {
        (r["i"], r["j"]): int(r["g"])
        for r in _declarative_gram(df, True).collect()
    }
    assert got == want


def test_gram_cells_ragged_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    ).coalesce(1)
    with pytest.raises(Exception, match="uniform vector length"):
        gram_cells(df).groupBy("i", "j").agg(F.sum("g")).collect()


def test_quota_vectorized_update_crossing_cases(spark, tmp_path):
    """The r12 closed-form batch update must reproduce the per-row loop
    on every crossing shape: quota reached mid-batch, exactly at batch
    end, already exhausted before the batch, and never reached."""
    from featurestore_for_joycastle_java_spark import streaming as ST
    from featurestore_for_joycastle_java_spark.catalog.streaming import _run

    t0 = dt.datetime(2024, 1, 1)

    def ts(k):
        return t0 + dt.timedelta(seconds=k)

    rows = (
        # mid-batch crossing: 5 events, quota 3 -> reached at 3rd
        [("mid", ts(k), k) for k in range(5)]
        # exact-at-end: 3 events, quota 3 -> reached at last row
        + [("exact", ts(k), 10 + k) for k in range(3)]
        # under quota: 2 events -> never reached
        + [("under", ts(k), 20 + k) for k in range(2)]
    )
    src = str(tmp_path / "quota_vec")
    spark.createDataFrame(
        rows, "user string, ts timestamp, event_id long"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user string, ts timestamp, event_id long"
    ).parquet(src)
    out = _run(
        spark,
        ST.quota_rate_limiter(stream, key_col="user", quota=3),
        "append",
    )
    got = {r["user"]: r.asDict() for r in out.collect()}
    assert got["mid"] == {
        "user": "mid",
        "n_allowed": 3,
        "n_denied": 2,
        "quota_reached_ts": ts(2),
    }
    assert got["exact"] == {
        "user": "exact",
        "n_allowed": 3,
        "n_denied": 0,
        "quota_reached_ts": ts(2),
    }
    assert got["under"]["n_allowed"] == 2
    assert got["under"]["quota_reached_ts"] is None


def test_spearman_closed_form_avg_rank_identity(spark):
    """The r12 eval_spearman_corr rewrite replaces AVG(row_number) per
    tie group with the closed form S + (c+1)/2 (S = rows strictly
    smaller, c = group size). Pin the identity bit-for-bit on a
    tie-heavy frame, through BOTH engine shapes (the tiny-window
    low-cardinality path and the bucketed grouped_prefix_sum path)."""
    from pyspark.sql import Window

    from featurestore_for_joycastle_java_spark.operators.ranks import (
        global_row_number,
        grouped_prefix_sum,
    )

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate([5.0, 1.0, 3.0, 3.0, 1.0, 5.0, 5.0, 2.0])],
        "val double, k int",
    )
    ranked = global_row_number(df, "val", ["k"], out_col="rn")
    want = {
        r["val"]: r["avg_rn"]
        for r in ranked.groupBy("val").agg(F.avg("rn").alias("avg_rn")).collect()
    }

    counts = df.groupBy("val").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    low_card = {
        r["val"]: r["ar"]
        for r in counts.select(
            "val",
            (
                F.coalesce(F.sum("_c").over(w), F.lit(0))
                + (F.col("_c") + 1) / 2.0
            ).alias("ar"),
        ).collect()
    }
    bucketed = {
        r["val"]: r["ar"]
        for r in grouped_prefix_sum(
            counts.withColumn("_g", F.lit(1)), ["_g"], "val", "_c", out_col="_run"
        )
        .select("val", (F.col("_run") - (F.col("_c") - 1) / 2.0).alias("ar"))
        .collect()
    }
    assert low_card == want
    assert bucketed == want
