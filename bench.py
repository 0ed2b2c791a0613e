"""Benchmark harness (driver contract): run every benchable registered
query at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is materialized with a noop-format write — full plan execution,
nothing collected to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from featurestore_for_joycastle_java_spark import get_spark, registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import BENCH_SKIP, QUERIES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="featurestore-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session startup; events goes through load_table so the
    # nanos-timestamp conversion path is warmed too (otherwise the
    # alphabetically-first events query absorbs the whole first-touch cost)
    from featurestore_for_joycastle_java_spark.sources import load_table

    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            load_table(spark, sf_dir, f[: -len(".parquet")]).write.format(
                "noop"
            ).mode("overwrite").save()

    names = [n for n in sorted(QUERIES) if n not in BENCH_SKIP]
    timings: dict[str, float] = {}
    t_suite = time.monotonic()
    for name in names:
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
        # each query is measured independently: drop cached blocks (e.g.
        # the LSH shingle table) so storage pressure from earlier queries
        # can't skew later ones — the per-query number is the query, not
        # the suite's accumulated state
        spark.catalog.clearCache()
    total = round(time.monotonic() - t_suite, 3)

    # Regression gate: diff against the prior round's per-query map (the
    # committed bench_queries.json, read BEFORE this run overwrites it).
    # Flag >1.5x slowdowns that also cost >0.3s absolute — sub-second
    # jitter at suite scale is noise, a 1.5x on a multi-second query is
    # rot (r2 shipped a 2.3x CC regression nobody caught in-round).
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_queries.json"
    )
    regressions: dict[str, dict[str, float]] = {}
    prior_sf = None
    if os.path.exists(out_path):
        try:
            with open(out_path) as fh:
                prior = json.load(fh)
            prior_sf = prior.get("sf")
            if prior_sf == (float(sf) if sf.replace(".", "").isdigit() else sf):
                for n, t_now in timings.items():
                    t_old = prior.get("queries", {}).get(n)
                    if t_old and t_now > 1.5 * t_old and t_now - t_old > 0.3:
                        regressions[n] = {
                            "prior": t_old,
                            "now": t_now,
                            "ratio": round(t_now / t_old, 2),
                        }
        except (json.JSONDecodeError, OSError):
            pass

    # Full per-query map goes to a file; the one printed line stays compact
    # (the driver captures a bounded amount of stdout — r1's 108-entry line
    # got tail-truncated to "parsed": null).
    full = {
        "metric": "bench_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(names),
        "skipped": sorted(BENCH_SKIP),
        "regressions_vs_prior": regressions,
    }
    with open(out_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)

    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    print(
        json.dumps(
            {
                "metric": "bench_suite_total",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "sf": full["sf"],
                "n_queries": len(names),
                "n_regressions": len(regressions),
                "full": "bench_queries.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
