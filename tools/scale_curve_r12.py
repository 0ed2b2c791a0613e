"""Round-12 curve run (VERDICT r11 asks #3/#5) — reuses
``tools/scale_curve.py``'s inflation fixtures, timing method (discarded
warm run, MIN of two measured runs, noop write sink) and alpha fit, and
times ONLY:

1. two-level fit+assign at constant cell size through 32x/64x (ask #3):
   SCALETEST_r11 measured alpha 0.93 to 16x, but the shape is
   O(n*2*sqrt(k)) with k = n/m-bar — asymptotically n^1.5 — so the
   near-linear range must end somewhere; this extends the same curve
   (k = n/125, i.e. k = 512/1024 at 32x/64x with n = 64k/128k vectors)
   to find the bend and size the next escalation.

2. dedup_substring_ngrams, raw-string gram shuffle vs xxhash64-hashed
   gram shuffle, at 2x/4x/8x/16x of sf0.1 (ask #5): the registered
   query keeps the raw string because the oracle must replay it; its
   docstring claims the hash is the at-scale default. Measure the claim
   instead of asserting it — the hashed pipeline is byte-identical
   except that both the dup-gram aggregate and the join-back key on
   xxhash64(gram) (8-byte fixed keys) instead of the ~50-byte gram
   string.

Usage: python tools/scale_curve_r12.py [out.json]
Writes SCALETEST_r12.json by default (same row shape as r11's).
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
    out = sys.argv[1] if len(sys.argv) > 1 else "SCALETEST_r12.json"

    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark import get_spark, registry

    registry.load_catalog()
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        as_double,
        assign_nearest_cell_two_level,
        kmeans_centroids_two_level,
    )
    from featurestore_for_joycastle_java_spark.operators.text import shingles
    from featurestore_for_joycastle_java_spark.sources import load_table

    spark = get_spark(
        app_name="scale-curve-r12",
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

    results: dict[str, dict] = {}

    def curve(name: str, thunk_for, fs, note: str) -> None:
        times = []
        for f in fs:
            run(thunk_for(f))  # warm — discarded
            times.append(round(min(run(thunk_for(f)), run(thunk_for(f))), 2))
            print(f"{name} x{f}: {times[-1]}", flush=True)
        results[name] = {
            "sec": dict(zip(map(str, fs), times)),
            "alpha": sc._fit_alpha(fs, times),
            "note": note,
        }
        print(f"{name}: {times} alpha={results[name]['alpha']}", flush=True)

    # 1. two-level fit+assign, k = n/125, through 64x (ask #3).
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

    curve(
        "semdedup_fit_assign_two_level",
        two_level,
        fs=[4, 8, 16, 32, 64],
        note="fit + whole-corpus assignment only (no pair stage), k ="
        " n/125 constant cell size — extends SCALETEST_r11's 4x..16x"
        " curve (alpha 0.93) to 32x/64x (k = 512/1024, n = 64k/128k):"
        " the O(n*2*sqrt(k)) fold is asymptotically n^1.5, this locates"
        " the measured bend (VERDICT r11 ask #3)",
    )

    # 2. substring-ngram dedup: raw gram string vs xxhash64 shuffle key
    # (ask #5). Same pipeline as catalog/round10.py::
    # dedup_substring_ngrams, with the shuffle key as the one variable.
    def _ngrams(f: int, hashed: bool):
        def thunk():
            d = load_table(spark, _dir(f), "documents")
            base = d.select(
                "doc_id", shingles(F.col("text"), k=8).alias("grams")
            )
            ex = base.select("doc_id", F.explode("grams").alias("gram"))
            if hashed:
                ex = ex.select(
                    "doc_id", F.xxhash64("gram").alias("gram")
                )
            dup = (
                ex.groupBy("gram")
                .agg(F.countDistinct("doc_id").alias("__nd"))
                .filter(F.col("__nd") >= 2)
                .select("gram")
            )
            per = ex.join(dup, "gram").groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("__n_dup")
            )
            return (
                base.select(
                    "doc_id",
                    F.size("grams").cast("bigint").alias("n_grams"),
                )
                .join(per, "doc_id", "left")
                .select(
                    "doc_id",
                    "n_grams",
                    F.coalesce(F.col("__n_dup"), F.lit(0))
                    .cast("bigint")
                    .alias("n_dup_grams"),
                )
            )

        return thunk

    ngram_note = (
        "identical pipeline to dedup_substring_ngrams, shuffle key ="
        " {} — ask #5: the registered query keeps the raw string for"
        " oracle replay; this measures whether xxhash64-before-shuffle"
        " (8-byte keys vs ~50-byte gram strings) is the right at-scale"
        " default the docstring claims"
    )
    ngram_fs = [2, 4, 8, 16]
    curve(
        "substring_ngrams_rawstring",
        lambda f: _ngrams(f, hashed=False),
        fs=ngram_fs,
        note=ngram_note.format("the raw 8-token gram string"),
    )
    curve(
        "substring_ngrams_xxhash64",
        lambda f: _ngrams(f, hashed=True),
        fs=ngram_fs,
        note=ngram_note.format("xxhash64(gram)"),
    )

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
