"""Coverage completions for SURVEY.md §2.2: full-outer join, bag set ops,
pivot, explode/lateral, JSON/map scalar functions, the Pandas-UDF surface,
format round-trips (csv/json/orc), and remaining window functions."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from featurestore_for_joycastle_java_spark.operators.relational import exact_sum
from featurestore_for_joycastle_java_spark.operators.text import tokens
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table, read_any, write_any


@query(
    "join_full_outer",
    oracle="""
SELECT n_name,
       CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp,
       CAST(COALESCE(total_bal, 0) AS DOUBLE) AS total_bal
FROM nation
FULL JOIN (
    SELECT s_nationkey,
           COUNT(*) AS n_supp,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(23,6))) AS DOUBLE) AS total_bal
    FROM supplier GROUP BY s_nationkey) s
  ON n_nationkey = s_nationkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: every nation (suppliers or not) + every supplier
    nation (known or not) — nulls coalesced to zeros."""
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            exact_sum(F.col("s_acctbal")).alias("total_bal"),
        )
    )
    return nation.join(
        supp, nation.n_nationkey == supp.s_nationkey, "full"
    ).select(
        "n_name",
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        F.coalesce("total_bal", F.lit(0.0)).alias("total_bal"),
    )


@query(
    "setops_bag",
    oracle="""
SELECT 'intersect_all' AS op, o_orderpriority FROM (
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
UNION ALL
SELECT 'except_all' AS op, o_orderpriority FROM (
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
""",
)
def setops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) semantics: INTERSECT ALL / EXCEPT ALL preserve
    multiplicities — the other half of the set-op surface."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "o_orderpriority")  # noqa: E731
    return tag(f.intersectAll(p), "intersect_all").unionAll(
        tag(f.exceptAll(p), "except_all")
    )


@query(
    "agg_pivot",
    oracle="""
SELECT CAST(FLOOR(user_id / 10) AS BIGINT) AS user_bucket,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'error') AS error,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'view') AS view
FROM events
GROUP BY CAST(FLOOR(user_id / 10) AS BIGINT)
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per category) with an explicit value list — the
    scalable form: no extra pass to discover categories, output width
    fixed at plan time."""
    types = ["click", "error", "purchase", "signup", "view"]
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.floor(F.col("user_id") / 10).alias("user_bucket"))
        .pivot("event_type", types)
        .count()
    )
    return wide.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
    )


@query(
    "text_token_freq",
    oracle="""
SELECT tok, COUNT(*) AS n
FROM (SELECT UNNEST(list_filter(string_split(lower(text), ' '),
                    x -> x <> '')) AS tok
      FROM documents)
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
""",
)
def text_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode / lateral-view surface: global token frequency top-20
    (deterministic tiebreak on the token)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(20)
    )


@query(
    "scalar_json_map",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       to_json(struct_pack(k2 := CAST(json_extract_string(props, '$.k') AS INT) * 2))
           AS k2_json,
       (map(['base','double'],
            [value, value * 2])['double'])[1] AS mapped_double
FROM events
""",
)
def scalar_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON + map scalar surface: from_json struct extraction, to_json
    re-serialization (both engines emit compact {"k":v}), map build +
    key lookup."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"]
    m = F.map_from_arrays(
        F.array(F.lit("base"), F.lit("double")),
        F.array(F.col("value"), F.col("value") * 2),
    )
    return ev.select(
        "event_id",
        k.alias("k"),
        F.to_json(F.struct((k * 2).alias("k2"))).alias("k2_json"),
        F.element_at(m, "double").alias("mapped_double"),
    )


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT event_id,
       value * 0.5 + (user_id % 7) * 1.5 AS engineered_score
FROM events
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (Arrow-vectorized): elementwise feature formula.
    Exists to exercise the UDF surface — the same formula in pure
    expressions would be the production choice (see oracle); elementwise
    IEEE ops make it bit-exact either way."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def engineered(value: pd.Series, user_mod: pd.Series) -> pd.Series:
        return value * 0.5 + user_mod * 1.5

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        engineered(F.col("value"), (F.col("user_id") % 7).cast("double")).alias(
            "engineered_score"
        ),
    )


@query(
    "udf_grouped_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       ROUND(SUM(value * user_id) / SUM(CAST(user_id AS DOUBLE)), 4)
           AS weighted_mean
FROM events
GROUP BY event_type
""",
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): per-group weighted mean in
    pandas/numpy. 4dp snap absorbs pandas' pairwise-summation vs SQL's
    sequential-summation ulps."""

    def wmean(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["user_id"].astype("float64")
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "weighted_mean": [round((pdf["value"] * w).sum() / w.sum(), 4)],
            }
        )

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(
        wmean, "event_type string, n long, weighted_mean double"
    )


_ROUNDTRIP_AGG = """
SELECT '{fmt}' AS fmt,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(23,6))) AS DOUBLE) AS sum_qty,
       COUNT(DISTINCT l_returnflag) AS n_flags
FROM lineitem WHERE l_orderkey % 10 = 0
"""


@query(
    "formats_roundtrip",
    oracle=" UNION ALL ".join(
        _ROUNDTRIP_AGG.format(fmt=f) for f in ("csv", "json", "orc")
    ),
)
def formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """csv/json/orc sink+scan round-trip fidelity: write a lineitem slice
    in each format, read it back with an explicit schema, checksum — must
    equal the parquet original (columns chosen to be lossless in text
    formats: integers, integer-valued doubles, strings)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )
    schema = "l_orderkey long, l_linenumber int, l_quantity double, l_returnflag string"
    out = None
    base = tempfile.mkdtemp(prefix="fs_fmt_")
    for fmt in ("csv", "json", "orc"):
        path = os.path.join(base, fmt)
        write_any(li, path, fmt=fmt)
        back = read_any(spark, path, fmt=fmt, schema=schema)
        agg = back.agg(
            F.lit(fmt).alias("fmt"),
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            F.countDistinct("l_returnflag").alias("n_flags"),
        ).select("fmt", "n_rows", "sum_qty", "n_flags")
        out = agg if out is None else out.unionAll(agg)
    return out


@query(
    "window_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over explicit full-partition frames (the
    default frame would silently make last_value == current row)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "window_percent_rank",
    oracle="""
SELECT c_custkey,
       PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS bal_pct_rank,
       CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS bal_cume_dist
FROM customer
""",
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist (exact (k-1)/(n-1), k/n arithmetic —
    deterministic). Unique tiebreak keeps ranks reproducible."""
    w = Window.orderBy("c_acctbal", "c_custkey")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )
