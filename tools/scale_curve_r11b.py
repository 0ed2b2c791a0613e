"""Supplementary round-11 probes, merged into SCALETEST_r11.json.

1. SemDeDup PAIR-STAGE isolation (the precise VERDICT r10 ask #3
   claim): the full-query cellsize curve in the first r11 run measured
   TOTAL time, which k = n/m-bar deliberately shifts into the k-means
   fit + n*k assignment (zero-shuffle compute) — so the total bent
   HARDER than the sqrt curve (2^1.95 vs 2^1.56 on the 8x->16x octave)
   and says nothing about the pair stage. Here the assignment is
   precomputed and localCheckpointed, Sigma m^2 (the pair join's
   work driver) is recorded per factor, and ONLY
   ``semdedup_survivors_from_assigned`` is timed.
   Expected: cellsize Sigma m^2 and pair time ~linear through 16x;
   sqrt Sigma m^2 growing ~n^1.5.

2. As-of hot-key at NINETY-percent skew, 16x/32x (ask #7 continued):
   at 30% skew the plain path still won at ~10^6 hot rows (1.13 s vs
   3.24 s bucketed at 32x) — the one straggler sort stays cheaper than
   the bucketed path's 3-shuffle + stitch overhead at local[32]. 90%
   skew puts ~2.9M rows on the hot key at 32x, past the old local[8]
   crossover measurement (2.8M hot rows: plain 2.56 s vs bucketed
   1.51 s).

Usage: python tools/scale_curve_r11b.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import tools.scale_curve as sc  # noqa: E402


def main() -> int:
    out = os.path.join(_REPO, "SCALETEST_r11.json")

    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark import get_spark, registry

    registry.load_catalog()
    from featurestore_for_joycastle_java_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        as_double,
        assign_nearest_cell,
        kmeans_centroids,
        semdedup_survivors_from_assigned,
    )
    from featurestore_for_joycastle_java_spark.sources import load_table

    spark = get_spark(
        app_name="scale-curve-r11b",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def run(thunk) -> float:
        t0 = time.monotonic()
        thunk().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        return dt

    def _dir(f: int) -> str:
        # reuse the factor dirs the first r11 run left in .scratch/scale
        d = os.path.join(sc._SCRATCH, f"x{f}")
        return d if os.path.isdir(d) else sc._build_factor_dir(f)

    results: dict[str, dict] = {}

    # --- 1. pair-stage isolation -------------------------------------
    pair_fs = [1, 2, 4, 8, 16]

    def pair_stage(tag: str, k_for) -> None:
        times, sum_m2, cells = [], [], []
        for f in pair_fs:
            e = load_table(spark, _dir(f), "embeddings")
            n = 2000 * f
            k = k_for(n)
            c = e.select(
                F.col("vec_id"), as_double(F.col("embedding")).alias("__cv")
            )
            cents = kmeans_centroids(
                e, n_centroids=k, fit_sample=64 * k, corpus_rows=n
            )
            assigned = assign_nearest_cell(c, cents, "vec_id").localCheckpoint(
                eager=True
            )
            m2 = (
                assigned.groupBy("cent_id")
                .count()
                .agg(F.sum(F.col("count") * F.col("count")))
                .collect()[0][0]
            )
            thunk = lambda a=assigned: semdedup_survivors_from_assigned(a)
            run(thunk)  # warm — discarded
            times.append(round(min(run(thunk), run(thunk)), 2))
            sum_m2.append(int(m2))
            cells.append(k)
            assigned.unpersist()
        results[f"semdedup_pair_stage_{tag}"] = {
            "sec": dict(zip(map(str, pair_fs), times)),
            "sum_m2": dict(zip(map(str, pair_fs), sum_m2)),
            "n_cells": dict(zip(map(str, pair_fs), cells)),
            "alpha": sc._fit_alpha(pair_fs, times),
            "alpha_sum_m2": sc._fit_alpha(
                pair_fs, [max(m, 1) for m in sum_m2]
            ),
        }
        print(
            f"pair_stage_{tag}: {times} m2={sum_m2} "
            f"alpha={results[f'semdedup_pair_stage_{tag}']['alpha']}",
            flush=True,
        )

    pair_stage("cellsize", lambda n: max(4, -(-n // 125)))
    pair_stage("sqrt", lambda n: int(16 * (n / 2000) ** 0.5))

    # --- 2. 90%-skew as-of crossover hunt ----------------------------
    def _hotkey_frames(sf_dir: str):
        e = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros(F.col("ts")).alias("t"),
        )
        hot = e.withColumn(
            "user_id",
            F.when(F.col("user_id") % 10 < 9, F.lit(0)).otherwise(
                F.col("user_id")
            ),
        )
        p = (
            hot.filter(F.col("event_type") == "purchase")
            .groupBy("user_id", "t")
            .agg(F.max_by("value", "event_id").alias("purchase_value"))
        )
        v = hot.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "t"
        )
        return v, p

    hot_fs = [16, 32]
    note = (
        "90% of events remapped onto one user_id -> hot key ~1.44M/2.9M"
        " rows at 16x/32x; continues the ask-#7 hunt past the 30%-skew"
        " points (where plain still won at 10^6 hot rows)"
    )
    for tag, op in (
        ("plain", lambda v, p: asof_join(
            v, p, on=["user_id"], left_ts="t", right_ts="t",
            right_cols=["purchase_value"])),
        ("bucketed", lambda v, p: asof_join_bucketed(
            v, p, on=["user_id"], left_ts="t", right_ts="t",
            right_cols=["purchase_value"], bucket_width=86_400_000_000)),
    ):
        times = []
        for f in hot_fs:
            wr = lambda ff=f, o=op: o(*_hotkey_frames(_dir(ff)))
            run(wr)  # warm — discarded
            times.append(round(min(run(wr), run(wr)), 2))
        results[f"asof_{tag}_hotkey90"] = {
            "sec": dict(zip(map(str, hot_fs), times)),
            "alpha": sc._fit_alpha(hot_fs, times),
            "note": note,
        }
        print(f"asof_{tag}_hotkey90: {times}", flush=True)

    with open(out) as fh:
        doc = json.load(fh)
    doc["queries"].update(results)
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("merged into SCALETEST_r11.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
