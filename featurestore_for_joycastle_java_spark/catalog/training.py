"""Training-data-export operators (north-star §2.3 extensions): document
chunking, deterministic stratified sampling, greedy sequence packing, and
per-group feature normalization — the shapes an LLM-pretraining or
feature-ML pipeline runs between "corpus" and "batches".

All pure Catalyst expressions; the only shuffles are the ones the
semantics force (one per groupBy/window, keyed to spread at 100 TB:
md5-derived sample buckets are uniform, packing windows partition by
source shard, z-score stats broadcast back to the fact side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from featurestore_for_joycastle_java_spark.operators.relational import exact_sum
from featurestore_for_joycastle_java_spark.operators.text import tokens
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "train_doc_chunks",
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_filter(str_split(lower(text), ' '), x -> x <> '') AS tk
    FROM documents),
s AS (
    SELECT doc_id, tk,
           UNNEST(generate_series(1, len(tk), 25)) AS start
    FROM t WHERE len(tk) > 0)
SELECT doc_id,
       CAST((start - 1) // 25 AS INT) AS chunk_id,
       CAST(LEAST(50, len(tk) - start + 1) AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(tk, start, start + 49), ' ') AS chunk_text
FROM s
""",
)
def train_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (size 50 tokens, stride 25 — 50%
    overlap, trailing remainder kept): the corpus→context-window step of a
    pretraining pipeline. One explode per document, no shuffle at all —
    chunking is embarrassingly parallel over input splits.

    The token array is bound once via the single-element outer transform
    (same no-CSE-across-lambdas trap documented in operators.text.shingles).
    """
    docs = load_table(spark, sf_dir, "documents")

    def build(tk):
        starts = F.sequence(F.lit(1), F.greatest(F.size(tk), F.lit(1)), F.lit(25))
        return F.transform(
            starts,
            lambda s: F.struct(
                ((s - 1) / 25).cast("int").alias("chunk_id"),
                F.least(F.lit(50), F.size(tk) - s + 1)
                .cast("int")
                .alias("n_chunk_tokens"),
                F.concat_ws(" ", F.slice(tk, s, 50)).alias("chunk_text"),
            ),
        )

    chunked = docs.select(
        "doc_id",
        F.explode(
            F.element_at(F.transform(F.array(tokens(F.col("text"))), build), 1)
        ).alias("c"),
    ).filter(F.col("c.n_chunk_tokens") > 0)
    return chunked.select("doc_id", "c.chunk_id", "c.n_chunk_tokens", "c.chunk_text")


@query(
    "train_stratified_sample",
    oracle="""
WITH b AS (
    SELECT event_type,
           CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT)
               % 1000 AS bucket,
           CASE WHEN event_type IN ('click', 'view') THEN 100 ELSE 1000 END
               AS rate_mille
    FROM events)
SELECT event_type,
       CAST(ANY_VALUE(rate_mille) AS INT) AS rate_mille,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN bucket < rate_mille THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept
FROM b
GROUP BY event_type
""",
)
def train_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: md5(event_id) → bucket in
    [0,1000), keep the row iff bucket < the stratum's rate (high-volume
    click/view strata at 10%, the rest kept whole) — the class-rebalancing
    step of a training-set export, summarized per stratum.

    Unlike df.sample/sampleBy this is reproducible across engines, runs,
    AND repartitions (the hash depends only on the row key, not on
    partition/seed state), and it needs no sampling state: at 100 TB it is
    a stateless map-side filter; this summary's single shuffle is just the
    5-key count."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 1000
    )
    rate = (
        F.when(F.col("event_type").isin("click", "view"), F.lit(100))
        .otherwise(F.lit(1000))
    )
    return (
        ev.select("event_type", bucket.alias("bucket"), rate.alias("rate_mille"))
        .groupBy("event_type")
        .agg(
            F.any_value("rate_mille").cast("int").alias("rate_mille"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(F.col("bucket") < F.col("rate_mille"), 1).otherwise(0)
            ).alias("n_kept"),
        )
    )


@query(
    "train_pack_sequences",
    oracle="""
WITH t AS (
    SELECT doc_id, source,
           len(list_filter(str_split(lower(text), ' '), x -> x <> ''))
               AS n_tok
    FROM documents),
c AS (
    SELECT doc_id, source, n_tok,
           SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
    FROM t)
SELECT source,
       CAST((cum - n_tok) // 2048 AS INT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY 1, 2
""",
)
def train_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-based sequence packing: within each source shard, docs in
    doc_id order are assigned to the bin their STARTING token offset
    falls in (``(cum - n_tok) // 2048``) — so a doc straddling a 2048
    boundary stays in the bin it started and bins may overflow by up to
    one doc (the trainer truncates or spills). This is deliberately NOT
    greedy-reset packing: offset binning is a stateless projection over
    one running sum, where greedy reset would need sequential state per
    shard. The batch-packing step before tokenized examples hit the
    trainer.

    The running sum partitions by source, so the window shuffles once on
    the shard key and each shard packs independently — the same layout a
    1000-executor job would use; no global order is ever imposed."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.groupBy(
            "source",
            ((F.col("cum") - F.col("n_tok")) / 2048).cast("int").alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "train_zscore_features",
    oracle="""
WITH stats AS (
    SELECT c_nationkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(23,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(29,8))) AS DOUBLE)
               AS sx2
    FROM customer
    GROUP BY c_nationkey)
SELECT c_custkey, c.c_nationkey,
       ROUND((c_acctbal - sx / n)
             / SQRT((sx2 - sx * sx / n) / (n - 1)), 6) AS z_acctbal
FROM customer c
JOIN stats s ON s.c_nationkey = c.c_nationkey
""",
)
def train_zscore_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization (feature scaling before training):
    group moments from exact fixed-point sums, broadcast back onto the
    fact side — at 100 TB the stats side is |groups| rows, so the fact
    table never shuffles. The per-row arithmetic is the same IEEE double
    op sequence in both engines over identical exact inputs, then an
    explicit 6dp round."""
    cust = load_table(spark, sf_dir, "customer")
    c = F.col("c_acctbal")
    stats = (
        cust.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(c).alias("sx"),
            exact_sum(c * c, dp=8).alias("sx2"),
        )
        .withColumnRenamed("c_nationkey", "s_nationkey")
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(
        (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - F.lit(1))
    )
    return (
        cust.join(
            F.broadcast(stats), F.col("s_nationkey") == F.col("c_nationkey")
        )
        .select(
            "c_custkey",
            "c_nationkey",
            F.round((c - mean) / std, 6).alias("z_acctbal"),
        )
    )


@query(
    "train_source_mix",
    oracle="""
SELECT doc_id, source, bucket
FROM (SELECT doc_id, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 100 AS bucket,
             CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 80
                         WHEN 'src2' THEN 60 WHEN 'src3' THEN 40
                         WHEN 'src4' THEN 20 ELSE 10 END AS rate
      FROM documents)
WHERE bucket < rate
""",
)
def train_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing — the pretraining-mix staple: sample each
    source at its own rate (here src0..src4 at 100/80/60/40/20%, long
    tail at 10%) with a content-addressed md5 bucket, so the mix is
    deterministic across reruns, re-shards, and engines (no seeded
    sample()). Narrow per-row expressions only — no shuffle at all, and
    the rate table is a literal CASE, so at 100 TB this is a pure scan
    whose output size is the weighted sum of the inputs."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    rate = (
        F.when(F.col("source") == "src0", 100)
        .when(F.col("source") == "src1", 80)
        .when(F.col("source") == "src2", 60)
        .when(F.col("source") == "src3", 40)
        .when(F.col("source") == "src4", 20)
        .otherwise(10)
    )
    return (
        d.select("doc_id", "source", bucket.alias("bucket"), rate.alias("rate"))
        .filter(F.col("bucket") < F.col("rate"))
        .drop("rate")
    )


@query(
    "train_dataset_card",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN(list_filter(str_split(lower(text), ' '), x -> x <> '')))
           AS BIGINT) AS total_tokens,
       CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       ROUND(CAST(SUM(LEN(list_filter(str_split(lower(text), ' '),
                                      x -> x <> ''))) AS DOUBLE)
             / COUNT(*), 6) AS avg_tokens
FROM documents
GROUP BY source
""",
)
def train_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-composition card: per-source doc/token/byte totals and
    language coverage — the report every corpus release ships with. One
    map-side-combined groupBy on the (low-cardinality) source key; token
    counts are codegen HOFs, so the scan stays JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text"))).cast("long")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        F.sum(F.octet_length("text").cast("long")).alias("total_bytes"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.sum(n_tok).cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_tokens"
        ),
    )
