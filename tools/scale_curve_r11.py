"""Targeted round-11 curve run (VERDICT r10 asks #3/#6/#7) — reuses
``tools/scale_curve.py``'s inflation fixtures (now with key-derived
c_name rotation), timing method (discarded warm run, MIN of two
measured runs, noop write sink) and alpha fit, but times ONLY:

1. er_blocking_metrics at 1x..8x — first meaningful curve (ask #6):
   the old inflation kept c_name identical across replicas, so every
   replica of a record shared one block and the r10 point read a
   spurious alpha 2.03; replicas now block independently.
2. semdedup at k ~ sqrt(n) AND at constant cell size (k = n/m-bar)
   through 16x, same session — the ask-#3 evidence: the sqrt curve
   bent to 2^1.57/octave at 16x in SCALETEST_r10; the cellsize curve
   should hold the pair stage ~linear through the same octave.
3. the as-of hot-key pair at 8x/16x/32x (hot key ~240k/480k/960k
   rows) — the ask-#7 crossover hunt: SCALETEST_r10's 8x point had
   the hot key too small to serialize a task (plain 0.49 s vs
   bucketed 0.95 s); this extends the curve to ~10^6 rows on one key.

Usage: python tools/scale_curve_r11.py [out.json]
Writes SCALETEST_r11.json by default (merged row shape).
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
    out = sys.argv[1] if len(sys.argv) > 1 else "SCALETEST_r11.json"

    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark import get_spark, registry

    registry.load_catalog()
    from featurestore_for_joycastle_java_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        semdedup_survivors,
    )
    from featurestore_for_joycastle_java_spark.registry import QUERIES
    from featurestore_for_joycastle_java_spark.sources import load_table

    spark = get_spark(
        app_name="scale-curve-r11",
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

    dirs: dict[int, str] = {}

    def _dir(f: int) -> str:
        if f not in dirs:
            dirs[f] = sc._build_factor_dir(f)
        return dirs[f]

    results: dict[str, dict] = {}

    def curve(name: str, thunk_for, fs, note: str | None = None) -> None:
        times = []
        for f in fs:
            run(thunk_for(f))  # warm — discarded
            times.append(round(min(run(thunk_for(f)), run(thunk_for(f))), 2))
        rows = thunk_for(fs[0])().count()
        results[name] = {
            "sec": dict(zip(map(str, fs), times)),
            "out_rows_base": rows,
            "alpha": sc._fit_alpha(fs, times),
        }
        if note:
            results[name]["note"] = note
        print(f"{name}: {times} alpha={results[name]['alpha']}", flush=True)

    # 1. er_blocking_metrics on the name-rotating inflation (ask #6)
    curve(
        "er_blocking_metrics",
        lambda f: (lambda: QUERIES["er_blocking_metrics"](spark, _dir(f))),
        fs=[1, 2, 4, 8],
        note="first meaningful curve: customer replicas now regenerate"
        " c_name from the offset key, so replicas block independently"
        " (r10's alpha 2.03 was the shared-name inflation artifact);"
        " expected ~Sigma block^2 within replicas, alpha ~ 1",
    )

    # 2. the two semdedup parametrizations through 16x (ask #3)
    semdedup_fs = [1, 2, 4, 8, 16]
    curve(
        "semdedup_kmeans_sqrt_cells",
        lambda f: (
            lambda: semdedup_survivors(
                load_table(spark, _dir(f), "embeddings"),
                n_centroids=int(16 * f**0.5),
                centroids="kmeans",
                fit_sample=64 * int(16 * f**0.5),
            )
        ),
        fs=semdedup_fs,
        note="same-session contrast for the cellsize curve below;"
        " SCALETEST_r10 measured this geometry at 2^1.57/octave on the"
        " 8x->16x octave",
    )
    curve(
        "semdedup_kmeans_cellsize",
        lambda f: (
            lambda: semdedup_survivors(
                load_table(spark, _dir(f), "embeddings"),
                centroids="kmeans",
                fit_sample=64 * 16 * f,
                corpus_rows=2000 * f,
                target_cell_size=125,
            )
        ),
        fs=semdedup_fs,
        note="constant cell size m-bar = 125 (matches the sqrt curve's"
        " x1 geometry: 2000 vectors / 16 cells) — k = n/m-bar keeps"
        " Sigma m^2 ~ n*m-bar so the pair stage stays linear; the"
        " growth moves into the zero-shuffle n*k assignment fold",
    )

    # 3. as-of hot-key crossover hunt at 8x/16x/32x (ask #7)
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
            F.when(F.col("user_id") % 10 < 3, F.lit(0)).otherwise(
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

    def _hot_plain(f: int):
        def thunk():
            v, p = _hotkey_frames(_dir(f))
            return asof_join(
                v, p, on=["user_id"], left_ts="t", right_ts="t",
                right_cols=["purchase_value"],
            )

        return thunk

    def _hot_bucketed(f: int):
        def thunk():
            v, p = _hotkey_frames(_dir(f))
            return asof_join_bucketed(
                v, p, on=["user_id"], left_ts="t", right_ts="t",
                right_cols=["purchase_value"],
                bucket_width=86_400_000_000,
            )

        return thunk

    hot_fs = [8, 16, 32]
    hk_note = (
        "30% of events remapped onto one user_id -> hot key ~240k/480k/"
        "960k rows at 8x/16x/32x; the ask-#7 crossover hunt (r10's 8x"
        " point: plain 0.49s vs bucketed 0.95s — hot key too small to"
        " serialize a task at local[32])"
    )
    curve("asof_plain_hotkey", _hot_plain, fs=hot_fs, note=hk_note)
    curve("asof_bucketed_hotkey", _hot_bucketed, fs=hot_fs, note=hk_note)

    doc = {
        "sf_base": sc._SF,
        "factors": "per-curve (see each entry's sec keys)",
        "method": "noop-format write; per factor: one discarded warm run"
        " (plan/codegen), then MIN of two measured runs (noise-floor"
        " estimator — contention only adds time); cache cleared between"
        " runs, local[32]/32 shuffle partitions",
        "alpha": "least-squares slope of log(sec) vs log(factor)",
        "queries": results,
    }
    with open(os.path.join(_REPO, out), "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
