"""Advanced surface: SQL subqueries (scalar / correlated EXISTS / IN /
NOT IN), exact percentiles, skew-salted joins, Python UDTFs, and IVF
approximate nearest-neighbor — SURVEY.md §2.2 completions plus the ANN
scale path next to LSH."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.relational import exact_sum, salted_join
from featurestore_for_joycastle_java_spark.operators.similarity import ivf_topk
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


_SCALAR_SUBQ = """
SELECT c_custkey, c_acctbal,
       ROUND((SELECT AVG(c_acctbal) FROM customer), 6) AS avg_bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
"""


@query("subquery_scalar", oracle=_SCALAR_SUBQ)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in both projection and predicate —
    Catalyst plans it as a one-row subquery broadcast, the fact scan stays
    single-pass. Identical ANSI text runs on both engines."""
    _views(spark, sf_dir, "customer")
    return spark.sql(_SCALAR_SUBQ)


_EXISTS_SUBQ = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R'
                    AND l.l_quantity >= 49)
"""


@query("subquery_exists", oracle=_EXISTS_SUBQ)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — Catalyst decorrelates to a
    left-semi + left-anti join (verify with .explain); no per-row
    re-execution of the inner query at any scale."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_EXISTS_SUBQ)


_IN_SUBQ = """
SELECT 'in' AS op, COUNT(*) AS n
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
UNION ALL
SELECT 'not_in' AS op, COUNT(*) AS n
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
"""


@query("subquery_in_notin", oracle=_IN_SUBQ)
def subquery_in_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries, including NOT IN's three-valued-logic
    behavior (a NULL in the subquery empties the NOT IN result — both
    engines implement it; o_custkey is non-null here so counts add up)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_IN_SUBQ)


@query(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25_qty,
       ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50_qty,
       ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75_qty,
       ROUND(median(l_extendedprice), 6) AS median_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear-interpolation continuous quantiles) and
    median per group. Exact percentile needs the group's values together
    — one shuffle on the group key; at 100 TB prefer approx_percentile
    (see agg_approx_percentile_bounded, catalog/round2.py, for the
    bounded-error sketch-side check)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("p25_qty"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 6).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("p75_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("median_price"),
    )


@query(
    "join_salted_skew",
    oracle="""
WITH dim AS (
    SELECT event_type, COUNT(*) AS type_total
    FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, d.type_total
FROM events e JOIN dim d USING (event_type)
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join: events' event_type distribution is heavily skewed
    (a handful of hot keys), so the fact key is salted ×16 and the dim
    replicated — row-identical to the plain join (the oracle IS the plain
    join), but no single reducer owns a hot key."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_total"))
    return salted_join(
        ev, dim, on=["event_type"], n_salt=16, salt_source="event_id"
    ).select("event_id", "event_type", "type_total")


@query(
    "udtf_token_hist",
    oracle="""
SELECT doc_id, tok, n
FROM (SELECT doc_id, tok, COUNT(*) AS n
      FROM (SELECT doc_id,
                   UNNEST(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS tok
            FROM documents WHERE doc_id < 200)
      GROUP BY doc_id, tok)
""",
)
def udtf_token_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 3.5+): per-document token histogram via
    a lateral table function. ``useArrow=True`` (r4) moves the Python
    boundary onto Arrow batches — rows still evaluate one ``eval`` call
    each, but serialization is columnar instead of pickled-per-row, the
    same 10-100× transfer win as pandas_udf. The production-scale
    equivalent remains the pure-Catalyst explode in text_token_freq
    (same oracle family); this registration exists to cover the UDTF
    door with its fastest available transport."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, n long", useArrow=True)
    class TokenHist:
        def eval(self, text: str):
            from collections import Counter

            counts = Counter(t for t in (text or "").lower().split(" ") if t)
            for tok, n in sorted(counts.items()):
                yield tok, n

    spark.udtf.register("token_hist", TokenHist)
    _views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok, t.n
        FROM documents d, LATERAL token_hist(d.text) t
        WHERE d.doc_id < 200
        """
    )


@query(
    "sim_ivf_topk",
    # IVF here is deterministic end-to-end (fixed centroids, no engine-
    # specific hashing), so unlike LSH the oracle can replay the whole
    # index: cell assignment, n_probe probing, exact top-k — approximate
    # vs brute force, exact vs this definition.
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
cents AS (
    SELECT vec_id AS cent_id, v AS cv FROM e ORDER BY vec_id LIMIT 16),
assigned AS (
    SELECT vec_id, cent_id, v FROM (
        SELECT e.vec_id, c.cent_id, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   list_inner_product(e.v, c.cv)
                   / (SQRT(list_inner_product(e.v, e.v))
                      * SQRT(list_inner_product(c.cv, c.cv))) DESC,
                   c.cent_id) AS rn
        FROM e CROSS JOIN cents c)
    WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
probes AS (
    SELECT query_id, cent_id, qv FROM (
        SELECT q.query_id, c.cent_id, q.qv,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                   list_inner_product(q.qv, c.cv)
                   / (SQRT(list_inner_product(q.qv, q.qv))
                      * SQRT(list_inner_product(c.cv, c.cv))) DESC,
                   c.cent_id) AS rn
        FROM q CROSS JOIN cents c)
    WHERE rn <= 4),
scored AS (
    SELECT p.query_id, a.vec_id,
           ROUND(list_inner_product(p.qv, a.v)
                 / (SQRT(list_inner_product(p.qv, p.qv))
                    * SQRT(list_inner_product(a.v, a.v))), 6) AS cos_sim
    FROM probes p JOIN assigned a USING (cent_id))
SELECT query_id, vec_id, cos_sim, rnk
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rnk
      FROM scored)
WHERE rnk <= 5
""",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 for a 10-query batch: nearest-centroid cell
    assignment + n_probe-cell search — the partition-pruned ANN path (LSH
    being the other; both deterministic here)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(e, queries, k=5, n_centroids=16, n_probe=4)


@query(
    "reshape_unpivot",
    oracle="""
SELECT c_nationkey, metric, val
FROM (SELECT c_nationkey,
             CAST(COUNT(*) AS DOUBLE) AS n_cust,
             ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(23,6))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_bal,
             MAX(c_acctbal) AS max_bal
      FROM customer GROUP BY c_nationkey)
UNPIVOT (val FOR metric IN (n_cust, avg_bal, max_bal))
""",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt): per-nation metrics melted to
    (key, metric, value) rows — pivot's inverse, a pure projection
    (no shuffle beyond the feeding agg)."""
    wide = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_cust"),
            F.round(
                exact_sum(F.col("c_acctbal")) / F.count(F.lit(1)),
                6,
            ).alias("avg_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )
    return wide.unpivot(
        ["c_nationkey"], ["n_cust", "avg_bal", "max_bal"], "metric", "val"
    )


@query(
    "split_train_test",
    oracle="""
SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM (SELECT doc_id,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 AS bucket
            FROM documents))
GROUP BY split
""",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by content-addressed
    hash bucket (md5 of the id) — the training-pipeline staple: stable
    under reruns, re-shards, and cluster-size changes, no stored split
    table, and portable across engines (unlike seeded sample())."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        d.select(F.col("doc_id"), split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@query(
    "feature_latest_snapshot",
    oracle="""
SELECT user_id,
       epoch_us(ts) AS last_ts_us,
       value AS last_value,
       event_type AS last_event_type
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
""",
)
def feature_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-value-per-entity snapshot (the online-store materialization
    path): one window shuffle on the entity key, deterministic tiebreak
    on (ts, event_id). At 100 TB this is the incremental-merge candidate;
    the full-recompute form here is the correctness anchor."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.unix_micros("ts").alias("last_ts_us"),
            F.col("value").alias("last_value"),
            F.col("event_type").alias("last_event_type"),
        )
    )
