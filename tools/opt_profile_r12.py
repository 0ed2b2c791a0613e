"""Round-12 optimization profiler: isolated warm timings + formatted
plans for named queries.

Usage:
    python tools/opt_profile_r12.py [--sf SF_DIR] [--runs N] [--plans DIR]
        query [query ...]

Methodology (guide §1): same session shape as bench.py (local[$SPARK_GRAFT_CPUS],
shuffle width = cpus), JVM + fixture warmed first, each query materialized
with the noop sink, cache cleared between runs, job labeled via
setJobDescription. Prints one JSON line per query:
    {"query": name, "runs_s": [...], "median_s": x}
and (when --plans is given) writes `<plans>/<query>_<tag>.txt` with
`.explain("formatted")` output.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from featurestore_for_joycastle_java_spark import get_spark, registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="extra spark conf key=value (repeatable) for A/B runs",
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(
        app_name="opt-profile-r12",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra or None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from featurestore_for_joycastle_java_spark.sources import load_table

    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for f in sorted(os.listdir(args.sf)):
        if f.endswith(".parquet"):
            load_table(spark, args.sf, f[: -len(".parquet")]).write.format(
                "noop"
            ).mode("overwrite").save()

    for name in args.queries:
        if name not in QUERIES:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
            spark.catalog.clearCache()
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt-profile:{name}")
            t0 = time.monotonic()
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "query": name,
                    "runs_s": runs,
                    "median_s": statistics.median(runs),
                }
            )
        )

    spark.stop()


if __name__ == "__main__":
    main()
