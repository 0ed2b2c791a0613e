"""Second round-12 probe: two-level FIT + SRP-routed ASSIGNMENT at
constant cell size, merged into SCALETEST_r12.json.

SCALETEST_r12's main run located the two-level fit+assign bend
(per-octave 2^1.11 at 32x, 2^1.29 at 64x — the O(n*2*sqrt(k)) fold
converging on n^1.5). The documented escalation is SRP-routed
assignment (``assign_nearest_cell_srp``: per-row cost constant-ish in
k). This probe times the realistic composition — hierarchical fit for
the centroids (cheap, measured alpha 0.93 in range) + SRP routing over
the FINE cells — on the same 16x/32x/64x factors (k = 256/512/1024) so
the two assignment strategies share a fit and the delta is the routing.

Usage: python tools/scale_curve_r12b.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import tools.scale_curve as sc  # noqa: E402


def main() -> int:
    out = os.path.join(_REPO, "SCALETEST_r12.json")

    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark import get_spark, registry

    registry.load_catalog()
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        as_double,
        assign_nearest_cell_srp,
        kmeans_centroids_two_level,
    )
    from featurestore_for_joycastle_java_spark.sources import load_table

    spark = get_spark(
        app_name="scale-curve-r12b",
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

    from featurestore_for_joycastle_java_spark.operators.similarity import (
        assign_nearest_cell_two_level,
    )

    def _frames(f: int):
        e = load_table(spark, _dir(f), "embeddings")
        n = 2000 * f
        k = max(4, -(-n // 125))
        # WIDE input on purpose: the inflated fixture is ONE ~35 MB
        # parquet file → one scan partition, which serializes the
        # interpreted-HOF assignment fold on a single core (found this
        # run: load 1.14 on 32 cores — the main-run two-level curve
        # measured single-task folds; octave RATIOS stay valid, absolute
        # costs don't). Both strategies here get the same 32-way input,
        # so the delta is the routing and the numbers are what a real
        # multi-partition input would pay.
        c = e.select(
            F.col("vec_id"), as_double(F.col("embedding")).alias("__cv")
        ).repartition(32)
        return e, n, k, c

    def srp_composed(f: int):
        def thunk():
            e, n, k, c = _frames(f)
            _, fine = kmeans_centroids_two_level(
                e, n_centroids=k, corpus_rows=n
            )
            # the fine frame's sub-fit lineage is consumed by two
            # subtrees of the SRP assignment (bucket build + fallback
            # list) — materialize it once, as any production caller of
            # an expensive centroid pipeline would
            fine = fine.select("cent_id", "__mv").localCheckpoint()
            n_bits = min(16, max(2, math.ceil(math.log2(max(2, k))) - 1))
            return assign_nearest_cell_srp(
                c, fine, "vec_id", n_tables=8, n_bits=n_bits
            )

        return thunk

    def twolevel_wide(f: int):
        def thunk():
            e, n, k, c = _frames(f)
            coarse, fine = kmeans_centroids_two_level(
                e, n_centroids=k, corpus_rows=n
            )
            return assign_nearest_cell_two_level(c, coarse, fine, "vec_id")

        return thunk

    fs = [16, 32, 64]
    results: dict[str, dict] = {}
    for tag, mk, note in (
        (
            "semdedup_fit_assign_two_level_wide",
            twolevel_wide,
            "the main-run two_level curve re-measured on a 32-way input"
            " (the one-file inflation fixture otherwise serializes the"
            " interpreted-HOF fold on ONE core — octave ratios were"
            " valid, absolute costs were single-task): the real"
            " distributed cost of the O(n*2*sqrt(k)) fold",
        ),
        (
            "semdedup_fit_assign_twolevel_srp",
            srp_composed,
            "hierarchical (two-level) centroid FIT + SRP-routed"
            " assignment over the k = n/125 fine cells (n_bits ="
            " ceil(log2 k)-1, 8 tables) — the documented escalation for"
            " the two-level fold's 32x/64x bend; same factors, fit and"
            " 32-way input as the _wide curve so the delta is the"
            " routing",
        ),
    ):
        times = []
        for f in fs:
            run(mk(f))  # warm — discarded
            times.append(round(min(run(mk(f)), run(mk(f))), 2))
            print(f"{tag} x{f}: {times[-1]}", flush=True)
        results[tag] = {
            "sec": dict(zip(map(str, fs), times)),
            "alpha": sc._fit_alpha(fs, times),
            "note": note,
        }
        print(f"{tag}: {times} alpha={results[tag]['alpha']}", flush=True)

    with open(out) as fh:
        doc = json.load(fh)
    doc["queries"].update(results)
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("merged into SCALETEST_r12.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
