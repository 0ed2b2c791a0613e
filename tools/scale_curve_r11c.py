"""Third round-11 probe: flat vs two-level fit+assign cost at constant
cell size, merged into SCALETEST_r11.json.

SCALETEST_r11's stage-isolated curves proved the cellsize pair stage
near-linear; what bends the cellsize TOTAL is the flat k-means fit
(O(sample·k), sample ∝ k) and the O(n·k) broadcast assignment fold.
This probe times exactly that stage — centroid fit + assignment of the
whole corpus (counted through a noop write) — for the flat path vs the
two-level hierarchy (``kmeans_centroids_two_level`` +
``assign_nearest_cell_two_level``: O(n·2√k) fold work), at
k = n/125 over 4x/8x/16x (k = 64/128/256).

Usage: python tools/scale_curve_r11c.py
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
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        as_double,
        assign_nearest_cell,
        assign_nearest_cell_two_level,
        kmeans_centroids,
        kmeans_centroids_two_level,
    )
    from featurestore_for_joycastle_java_spark.sources import load_table

    spark = get_spark(
        app_name="scale-curve-r11c",
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
        d = os.path.join(sc._SCRATCH, f"x{f}")
        return d if os.path.isdir(d) else sc._build_factor_dir(f)

    fs = [4, 8, 16]
    results: dict[str, dict] = {}

    def flat(f: int):
        def thunk():
            e = load_table(spark, _dir(f), "embeddings")
            n = 2000 * f
            k = max(4, -(-n // 125))
            c = e.select(
                F.col("vec_id"), as_double(F.col("embedding")).alias("__cv")
            )
            cents = kmeans_centroids(
                e, n_centroids=k, fit_sample=64 * k, corpus_rows=n
            )
            return assign_nearest_cell(c, cents, "vec_id")

        return thunk

    def two_level(f: int):
        def thunk():
            e = load_table(spark, _dir(f), "embeddings")
            n = 2000 * f
            k = max(4, -(-n // 125))
            c = e.select(
                F.col("vec_id"), as_double(F.col("embedding")).alias("__cv")
            )
            coarse, fine = kmeans_centroids_two_level(
                e, n_centroids=k, corpus_rows=n
            )
            return assign_nearest_cell_two_level(c, coarse, fine, "vec_id")

        return thunk

    for tag, mk in (("flat", flat), ("two_level", two_level)):
        times = []
        for f in fs:
            run(mk(f))  # warm — discarded
            times.append(round(min(run(mk(f)), run(mk(f))), 2))
        results[f"semdedup_fit_assign_{tag}"] = {
            "sec": dict(zip(map(str, fs), times)),
            "alpha": sc._fit_alpha(fs, times),
            "note": "fit + whole-corpus assignment only (no pair stage),"
            " k = n/125 (constant cell size): the stage that bends the"
            " cellsize TOTAL — flat is O(sample*k)+O(n*k), two-level"
            " is O(n*2*sqrt(k)) fold work",
        }
        print(
            f"fit_assign_{tag}: {times} "
            f"alpha={results[f'semdedup_fit_assign_{tag}']['alpha']}",
            flush=True,
        )

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
