"""Scalar function surface (SURVEY.md §2.2): string / date / math / array /
conditional expressions — all JVM-side builtins inside whole-stage codegen,
no Python in any hot path.

Cross-engine gotchas encoded in the oracles:
- DuckDB length/strpos/year/... return BIGINT where Spark returns INT —
  oracle casts to match Spark;
- DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday — oracle adds 1;
- floor/ceil: Spark → BIGINT, DuckDB → DOUBLE — oracle casts;
- round() is intentionally NOT oracle-tested on arbitrary doubles (HALF_UP
  vs half-away rounding can disagree on non-representable midpoints);
- float array elements are cast to DOUBLE on BOTH sides (exact widening)
  and summed in explicit fixed order, never via list_sum (accumulator type
  unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       CAST(LENGTH(p_name) AS INT) AS name_len,
       SUBSTR(p_name, 1, 8) AS name_prefix,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       REPLACE(p_type, 'ECONOMY', 'ECO') AS type_short,
       REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
       CAST(STRPOS(p_name, 'a') AS INT) AS first_a,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       TRIM(CONCAT(' ', p_brand, ' ')) AS brand_trim
FROM part
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part. Note Spark regexp_replace is
    global by default; DuckDB needs the 'g' flag to match."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(MONTH(o_orderdate) AS INT) AS order_month_num,
       CAST(DAY(o_orderdate) AS INT) AS order_day,
       CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
       CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS order_dow,
       strftime(o_orderdate, '%Y-%m') AS order_month,
       strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT)
           AS days_to_2002,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
""",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over orders. Dates always rendered as
    strings (date_format/strftime) — raw timestamp outputs don't survive
    cross-engine hashing (ns vs us precision)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month_num"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_2002"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


@query(
    "scalar_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
       SQRT(l_quantity) AS qty_sqrt,
       ROUND(LN(l_extendedprice), 6) AS price_ln,
       l_discount * l_discount AS disc_sq,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       GREATEST(l_tax, l_discount) AS max_rate,
       LEAST(l_tax, l_discount) AS min_rate
FROM lineitem
""",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery. sqrt/abs/multiply are IEEE-exact cross-
    engine; ln (libm) gets rounded to 6; round() itself excluded (HALF_UP
    vs half-away divergence on midpoints)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_discount") * F.col("l_discount")).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
SELECT vec_id,
       CAST(LEN(embedding) AS INT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
         + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)
           AS head4_sum,
       CAST(LEN(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
FROM embeddings
""",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order functions over the embedding column — size,
    element access, lambda filter. All Catalyst-native (no UDF). Elements
    cast float→double on BOTH sides (exact widening); head4_sum is an
    explicit fixed-order chain, not list_sum (unspecified accumulator)."""
    e = load_table(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        el(1).alias("first_val"),
        (el(1) + el(2) + el(3) + el(4)).alias("head4_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "scalar_conditional",
    oracle="""
SELECT o_orderkey,
       CASE
           WHEN o_totalprice >= 300000 THEN 'high'
           WHEN o_totalprice >= 100000 THEN 'mid'
           ELSE 'low'
       END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_label,
       CAST(o_orderstatus = 'F' AS BOOLEAN) AS is_finished,
       IF(o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%',
          1, 0) AS is_urgent
FROM orders
""",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: CASE/WHEN bands, coalesce/nullif, boolean
    projection, LIKE predicates."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_label"
        ),
        (F.col("o_orderstatus") == "F").alias("is_finished"),
        F.when(
            F.col("o_orderpriority").like("1-%")
            | F.col("o_orderpriority").like("2-%"),
            1,
        )
        .otherwise(0)
        .alias("is_urgent"),
    )
