"""Third round-12 probe: bucket-CAPPED SRP routing vs the two-level
fold at EXTREME k, merged into SCALETEST_r12.json.

The uncapped SRP verdict (this round) was negative: centroid code-bucket
skew grows candidate volume with k, so two-level wins through k = 1024.
The documented remedy is ``bucket_cap`` — at most B centroids per
bucket, selected by alignment with the bucket's mean direction
(measured at fixture scale: cap 4 costs 0.004 exact-argmax agreement).
Capped per-row cost is n_tables·n_bits encode dots + ≤ n_tables·B
candidate dots ≈ 8·log2(k) + 32 — it grows with log k, while the
two-level fold grows with 2√k — so the crossover should appear once
2√k clears ~120-150: k somewhere in the low thousands. This probe
measures exactly that: both strategies, identical two-level fit and
32-way input, at 64x/128x/256x (k = 1024/2048/4096).

Fixtures: only embeddings matter here, so high factors are built as
embeddings-only inflations (same vec_id-offset + 0.0137-rotation recipe
as tools/scale_curve.py) with every other table symlinked — a 256x
full-fact build would inflate lineitem to ~150M rows for nothing.

Usage: python tools/scale_curve_r12c.py
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


def _emb_only_dir(factor: int) -> str:
    """Scratch dir with ONLY embeddings inflated factor-x (the
    scale_curve recipe); every other table symlinked from the base SF."""
    import duckdb

    from featurestore_for_joycastle_java_spark.schemas import TABLE_NAMES

    base = os.path.join(sc._SCRATCH, f"emb_x{factor}")
    if os.path.isdir(base):
        return base
    os.makedirs(base)
    parts = [
        f"""SELECT vec_id + {i * 10_000_000} AS vec_id,
               list_transform(embedding,
                   x -> CAST(x + {i} * 0.0137 AS FLOAT)) AS embedding,
               label
        FROM read_parquet('{sc._SF}/embeddings.parquet')"""
        for i in range(factor)
    ]
    duckdb.connect().execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO "
        f"'{base}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for t in TABLE_NAMES:
        if t == "embeddings":
            continue
        src = os.path.join(sc._SF, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(base, f"{t}.parquet"))
    return base


def main() -> int:
    out = os.path.join(_REPO, "SCALETEST_r12.json")

    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark import get_spark, registry

    registry.load_catalog()
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        as_double,
        assign_nearest_cell_srp,
        assign_nearest_cell_two_level,
        kmeans_centroids_two_level,
    )
    from featurestore_for_joycastle_java_spark.sources import load_table

    spark = get_spark(
        app_name="scale-curve-r12c",
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

    def _frames(f: int):
        e = load_table(spark, _emb_only_dir(f), "embeddings")
        n = 2000 * f
        k = max(4, -(-n // 125))
        c = e.select(
            F.col("vec_id"), as_double(F.col("embedding")).alias("__cv")
        ).repartition(32)
        return e, n, k, c

    def _fit(e, n, k):
        _, fine = kmeans_centroids_two_level(e, n_centroids=k, corpus_rows=n)
        return fine.select("cent_id", "__mv").localCheckpoint()

    def twolevel(f: int):
        def thunk():
            e, n, k, c = _frames(f)
            coarse, fine = kmeans_centroids_two_level(
                e, n_centroids=k, corpus_rows=n
            )
            return assign_nearest_cell_two_level(c, coarse, fine, "vec_id")

        return thunk

    def srp_capped(f: int):
        def thunk():
            e, n, k, c = _frames(f)
            fine = _fit(e, n, k)
            n_bits = min(16, max(2, math.ceil(math.log2(max(2, k))) - 1))
            return assign_nearest_cell_srp(
                c, fine, "vec_id", n_tables=8, n_bits=n_bits, bucket_cap=4
            )

        return thunk

    fs = [64, 128, 256]
    results: dict[str, dict] = {}
    for tag, mk, note in (
        (
            "semdedup_fit_assign_two_level_xk",
            twolevel,
            "two-level fit + O(n*2*sqrt(k)) fold at extreme k"
            " (1024/2048/4096), 32-way input — the incumbent whose"
            " sqrt(k) per-row cost the capped-SRP contender must beat",
        ),
        (
            "semdedup_fit_assign_srp_capped_xk",
            srp_capped,
            "two-level fit + bucket-capped SRP routing (cap 4, n_bits ="
            " ceil(log2 k)-1, 8 tables): per-row cost 8*log2(k) encode"
            " dots + <=32 candidate dots, vs the fold's 2*sqrt(k) —"
            " the skew-bounded escalation measured at the k range where"
            " the crossover is predicted (low thousands)",
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
