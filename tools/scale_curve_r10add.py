"""One-off curve run for the round-10b/10c additions family — reuses
``tools/scale_curve.py``'s inflation fixtures, timing method (discarded
warm run, MIN of two measured runs, noop write sink) and alpha fit, but
times ONLY ``_R10_ADDITIONS_QUERIES`` so the additions get a committed
scaling artifact without re-running the whole suite. Output merges the
same per-query row shape as SCALETEST_r{N}.json.

Usage: python tools/scale_curve_r10add.py [out.json] [factors...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import tools.scale_curve as sc  # noqa: E402


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "SCALETEST_r10add.json"
    factors = (
        [int(a) for a in sys.argv[2:]] if len(sys.argv) > 2 else [1, 2, 4, 8]
    )

    from featurestore_for_joycastle_java_spark import get_spark, registry

    registry.load_catalog()
    from featurestore_for_joycastle_java_spark.registry import QUERIES

    spark = get_spark(
        app_name="scale-curve-r10add",
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
    for name in sc._R10_ADDITIONS_QUERIES:
        times = []
        for f in factors:
            thunk = lambda n=name, ff=f: QUERIES[n](spark, _dir(ff))
            run(thunk)  # warm — discarded
            times.append(round(min(run(thunk), run(thunk)), 2))
        rows = QUERIES[name](spark, _dir(factors[0])).count()
        results[name] = {
            "sec": dict(zip(map(str, factors), times)),
            "out_rows_base": rows,
            "alpha": sc._fit_alpha(factors, times),
        }
        print(f"{name}: {times} alpha={results[name]['alpha']}", flush=True)

    doc = {
        "sf_base": sc._SF,
        "factors": factors,
        "family": "round-10b/10c additions (see tools/scale_curve.py "
        "_R10_ADDITIONS_QUERIES; full-suite runs include them too)",
        "method": "same as SCALETEST_r10.json: noop write, discarded warm "
        "run, MIN of two measured runs per factor, cache cleared",
        "queries": results,
    }
    with open(os.path.join(_REPO, out), "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    shutil.rmtree(sc._SCRATCH, ignore_errors=True)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
