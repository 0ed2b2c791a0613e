"""Unit semantics for the scale-safe rank operators (operators/ranks.py).

The oracle-parity suite pins window_rank_scalable against DuckDB at
sf0.001/0.01, but both fixtures have row counts divisible by 4 — these
micro-tests cover the uneven-tile branch, constant-value bucketing, and
agreement with Spark's own one-task window functions.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from featurestore_for_joycastle_java_spark.operators.ranks import (
    dense_rank_low_card,
    global_row_number,
    grouped_row_number,
    ntile_from_rank,
)


def _ranked(spark, rows, n_buckets=4):
    df = spark.createDataFrame(rows, "id int, v double")
    return global_row_number(
        df, "v", ["id"], out_col="rn", n_buckets=n_buckets
    )


def test_global_row_number_matches_window(spark):
    rows = [(i, float((i * 7919) % 97)) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, v double")
    got = {
        r["id"]: r["rn"]
        for r in _ranked(spark, rows, n_buckets=8).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_global_row_number_all_equal_values(spark):
    # span == 0: every row lands in bucket 0 and tiebreak orders them
    rows = [(i, 5.0) for i in range(10)]
    got = sorted(
        (r["id"], r["rn"]) for r in _ranked(spark, rows).collect()
    )
    assert got == [(i, i + 1) for i in range(10)]


def test_grouped_row_number_matches_window(spark):
    """grouped_row_number (r10, feature_rfm's melted-rank backbone) must
    agree with Spark's own partitioned row_number, including the group
    row count it exposes; ties covered by the modulo value stream."""
    rows = [
        (i, ["a", "b", "c"][i % 3], float((i * 7919) % 31))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = grouped_row_number(
        df, ["g"], "v", ["id"], out_col="rn", total_col="n", n_buckets=8
    )
    got = {(r["g"], r["id"]): (r["rn"], r["n"]) for r in out.collect()}
    w = Window.partitionBy("g").orderBy("v", "id")
    want_df = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    want = {
        (r["g"], r["id"]): (r["rn"], r["n"]) for r in want_df.collect()
    }
    assert got == want


def test_grouped_row_number_constant_group(spark):
    # span == 0 within a group: bucket 0, tiebreak orders the group
    rows = [(i, "g0" if i < 5 else "g1", 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = grouped_row_number(df, ["g"], "v", ["id"], out_col="rn")
    got = sorted((r["g"], r["id"], r["rn"]) for r in out.collect())
    assert got == [
        ("g0", 0, 1), ("g0", 1, 2), ("g0", 2, 3), ("g0", 3, 4),
        ("g0", 4, 5),
        ("g1", 5, 1), ("g1", 6, 2), ("g1", 7, 3), ("g1", 8, 4),
        ("g1", 9, 5),
    ]


def test_ntile_uneven(spark):
    # n=10, t=4 -> NTILE sizes 3,3,2,2 (first n%t tiles get the extra row)
    rows = [(i, float(i)) for i in range(10)]
    out = _ranked(spark, rows).select(
        "id", ntile_from_rank(F.col("rn"), F.col("_n_total"), 4).alias("t")
    )
    got = {r["id"]: r["t"] for r in out.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 3, 7: 3, 8: 4, 9: 4}


def test_ntile_matches_spark_many_shapes(spark):
    for n, t in [(7, 4), (13, 5), (4, 4), (3, 4), (97, 8)]:
        rows = [(i, float((i * 31) % 41)) for i in range(n)]
        df = spark.createDataFrame(rows, "id int, v double")
        want = {
            r["id"]: r["t"]
            for r in df.select(
                "id", F.ntile(t).over(Window.orderBy("v", "id")).alias("t")
            ).collect()
        }
        out = _ranked(spark, rows).select(
            "id",
            ntile_from_rank(F.col("rn"), F.col("_n_total"), t).alias("t"),
        )
        got = {r["id"]: r["t"] for r in out.collect()}
        assert got == want, f"ntile mismatch at n={n} t={t}"


def test_dense_rank_low_card(spark):
    rows = [(i, float(i % 3) * 10) for i in range(9)]
    df = spark.createDataFrame(rows, "id int, k double")
    want = {
        r["id"]: r["dr"]
        for r in df.withColumn(
            "dr", F.dense_rank().over(Window.orderBy("k"))
        ).collect()
    }
    got = {
        r["id"]: r["dr"]
        for r in dense_rank_low_card(df, "k", "dr").collect()
    }
    assert got == want


def test_global_row_number_negative_values_single_bucket(spark):
    rows = [(i, float(-v)) for i, v in enumerate([5, 3, 9, 1, 7])]
    got = sorted(
        (r["id"], r["rn"])
        for r in _ranked(spark, rows, n_buckets=1).collect()
    )
    # ascending over negatives: -9 (id 2) first
    want_order = [2, 4, 0, 1, 3]
    want = sorted((id_, rank + 1) for rank, id_ in enumerate(want_order))
    assert got == want
