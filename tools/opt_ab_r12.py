"""Round-12 interleaved A/B timing harness.

The r12 box shows 20-30% hypervisor steal under load (committed bench
r12-opt runs: steal_pct_of_busy 2.75 -> 26.7 between two same-code runs),
so sequential before/after sessions are not comparable. This harness
times VARIANTS of the same computation INTERLEAVED in one session
(A,B,A,B,...) so host drift hits both sides equally; the JVM-sum canary
and /proc/stat steal bracket the run for the record.

Variant spec: ``name=module.path:function`` where the function has the
query signature ``(spark, sf_dir) -> DataFrame``, or
``name=registry:<query_name>`` for a registered query.

Usage:
    python tools/opt_ab_r12.py --sf /root/testdata/sf0.1 --rounds 4 \
        before=registry:stream_quota_enforcement \
        after=/tmp/exp_quota.py:stream_quota_enforcement_v2
"""

from __future__ import annotations

import argparse
import importlib
import importlib.util
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from featurestore_for_joycastle_java_spark import get_spark, registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES


def _resolve(spec: str):
    mod_path, fn = spec.rsplit(":", 1)
    if mod_path == "registry":
        return QUERIES[fn]
    if mod_path.endswith(".py"):
        spec_obj = importlib.util.spec_from_file_location("_ab_exp", mod_path)
        mod = importlib.util.module_from_spec(spec_obj)
        sys.modules["_ab_exp"] = mod
        spec_obj.loader.exec_module(mod)
        return getattr(mod, fn)
    return getattr(importlib.import_module(mod_path), fn)


def _steal() -> int:
    try:
        return int(open("/proc/stat").readline().split()[8])
    except (OSError, ValueError, IndexError):
        return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(
        app_name="opt-ab-r12",
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

    def canary() -> float:
        t0 = time.monotonic()
        spark.range(30_000_000).selectExpr(
            "sum(cast(id as double) * cast(id as double)) as s"
        ).write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    canary()
    c0 = canary()
    s0 = _steal()

    fns = {}
    for v in args.variants:
        name, spec = v.split("=", 1)
        fns[name] = _resolve(spec)

    # one discarded warmup per variant (plan compile, python workers)
    for name, fn in fns.items():
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    times: dict[str, list[float]] = {n: [] for n in fns}
    for _ in range(args.rounds):
        for name, fn in fns.items():
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()

    c1 = canary()
    s1 = _steal()
    out = {
        "sf": args.sf,
        "rounds": args.rounds,
        "canary_s": [c0, c1],
        "steal_jiffies": s1 - s0,
        "results": {
            n: {"runs_s": t, "median_s": statistics.median(t)}
            for n, t in times.items()
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
