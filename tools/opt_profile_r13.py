"""Round-13 stage-level profiler for the PQ/ANN recall harnesses.

Breaks sim_pq_recall / sim_ivfpq_topk into their component stages and
times each with the noop sink on a quiet session, so the r13 work
attacks the measured hot stage instead of the assumed one (guide §1.1).
Canary + /proc/stat steal bracket the run, as in tools/opt_ab_r12.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark import get_spark
from featurestore_for_joycastle_java_spark.sources import load_table
from featurestore_for_joycastle_java_spark.operators import similarity as S


def _steal() -> int:
    try:
        return int(open("/proc/stat").readline().split()[8])
    except (OSError, ValueError, IndexError):
        return 0


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="opt-profile-r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    noop(spark.range(1_000_000).selectExpr("sum(id)"))

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    q10 = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    q50 = e.filter(F.col("vec_id") % 50 == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nq50 = q50.count()
    print(f"corpus rows={n}, q50 rows={nq50}", flush=True)

    s0 = _steal()
    t_all0 = time.monotonic()

    def timed(label, fn):
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"{dt:8.3f}s  {label}", flush=True)
        spark.catalog.clearCache()
        return out

    # --- stage 1: PQ codebook fit (16 KMeans fits, pooled)
    books = None

    def fit():
        nonlocal books
        books = S.pq_codebooks(e, "embedding", m=16, k=16, dim=64, seed=42)
        noop(books)

    timed("pq_codebooks fit m=16", fit)

    # --- stage 2: PQ encode of the whole corpus
    timed(
        "pq_encode corpus",
        lambda: noop(S.pq_encode(e, books, "vec_id", "embedding", m=16, dim=64)),
    )

    # --- stage 3: brute-force ground truth, 10 queries
    timed(
        "brute_force_topk q=10",
        lambda: noop(S.brute_force_topk(e, q10, k=5)),
    )

    # --- stage 4: brute-force ground truth, n/50 queries
    timed(
        "brute_force_topk q=n/50",
        lambda: noop(S.brute_force_topk(e, q50, k=5)),
    )

    # --- stage 5: full pq_topk (fit + encode + ADC + re-rank)
    timed(
        "pq_topk full q=10",
        lambda: noop(S.pq_topk(e, q10, k=5, m=16, shortlist=100)),
    )

    # --- stage 6: full ivfpq_topk
    timed(
        "ivfpq_topk full q=n/50",
        lambda: noop(
            S.ivfpq_topk(
                e, q50, k=5, n_centroids=16, n_probe=6, m=16, shortlist=100
            )
        ),
    )

    dt_all = time.monotonic() - t_all0
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "wall_s": round(dt_all, 2),
                "steal_jiffies": _steal() - s0,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
