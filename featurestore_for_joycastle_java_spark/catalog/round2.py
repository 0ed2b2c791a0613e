"""Round-2 additions: scale-safe twins and hardened oracles for queries
VERDICT r1 flagged (global unpartitioned windows; no-oracle approx
aggregates). Registered FIRST so the driver's 50-entry correctness window
covers them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.ranks import (
    dense_rank_low_card,
    global_row_number,
    ntile_from_rank,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "window_rank_scalable",
    oracle="""
SELECT c_custkey,
       CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS INT)
           AS bal_rank,
       CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT)
           AS bal_quartile,
       PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS bal_pct_rank,
       CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS bal_cume_dist,
       CAST(DENSE_RANK() OVER (ORDER BY c_nationkey) AS INT) AS nation_rank
FROM customer
""",
)
def window_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of ``window_ntile_dense_rank`` /
    ``window_percent_rank``: exact global row_number / ntile(4) /
    percent_rank / cume_dist / dense_rank with NO single-partition window
    over the fact table.

    Ranks come from the two-pass range-bucketed ``global_row_number``
    (operators/ranks.py) — the only global windows in the plan see 32
    bucket rows and 25 distinct nation keys. ntile/percent_rank/cume_dist
    are integer arithmetic on the exact rank (valid because the
    (c_acctbal, c_custkey) ordering is unique). The r1 exact forms stay
    registered as the one-task oracles of this shape.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    ranked = global_row_number(
        c, "c_acctbal", ["c_custkey"], out_col="bal_rank"
    )
    ranked = dense_rank_low_card(ranked, "c_nationkey", "nation_rank")
    n = F.col("_n_total")
    rk = F.col("bal_rank")
    return ranked.select(
        "c_custkey",
        rk.cast("int").alias("bal_rank"),
        ntile_from_rank(rk, n, 4).alias("bal_quartile"),
        F.when(n > 1, (rk - 1) / (n - 1))
        .otherwise(F.lit(0.0))
        .alias("bal_pct_rank"),
        (rk / n).alias("bal_cume_dist"),
        "nation_rank",
    )
