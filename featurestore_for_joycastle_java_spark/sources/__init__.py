"""Sources & sinks: fixture parquet loaders, format round-trips, Kafka, JDBC.

The reference's only source is a Kafka topic drained from offset 0
(ConsumerMultiThread.java:89-110) and its only sink is batched JDBC inserts
into per-event-type SQLite tables (CMT:163-201). Spark-first equivalents
live here; parquet/csv/json/orc scans are added per SURVEY.md §2.2 (the
reference has none, but the engine needs them — fixtures are parquet).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from featurestore_for_joycastle_java_spark.schemas import TABLE_NAMES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → column pruning and predicate
    pushdown are free once the caller selects/filters (Catalyst pushes them
    into the scan; verify with .explain → PushedFilters/ReadSchema).

    ``events.ts`` normalization (fixture generations differ): timestamp[ns]
    parquet arrives as long nanos (via the nanosAsLong legacy conf set in
    the session factory) → convert to a µs timestamp; timestamp[us] with
    isAdjustedToUTC=false arrives as TIMESTAMP_NTZ → cast to session-local
    TIMESTAMP (session tz is pinned UTC, so the instant is unchanged and
    matches DuckDB's naive read). Schema-level fixup either way, no data
    shuffle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a SQL temp view (for spark.sql paths)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# --- Generic format scans (SURVEY.md §2.2 row 1) ---


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Uniform reader over parquet/csv/json/orc. An explicit schema skips
    inference (a full extra scan at 100 TB — always pass one in production)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_any(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", partition_by: list[str] | None = None, **options) -> None:
    """Uniform writer. ``partition_by`` gives hive-style layout so downstream
    scans get partition pruning on those keys."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
    writer.options(**options).save(path)


# --- Kafka source (reference op #1, CMT:46-57/89-102) ---

#: The schema Spark's Kafka source emits — used by tests to exercise the
#: post-source pipeline (value decode → JSON parse → ingest) broker-free.
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    streaming: bool = False,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Reader options as a pure (testable) mapping. Reference semantics:
    ``startingOffsets=earliest`` is the seek-every-partition-to-0
    (CMT:93-98); batch ``endingOffsets=latest`` is the drain-then-stop
    (CMT:104-110); ``maxOffsetsPerTrigger`` bounds a micro-batch the way
    ``max.poll.records=1000`` did (CMT:52)."""
    if max_offsets_per_trigger and not streaming:
        raise ValueError(
            "max_offsets_per_trigger is a streaming trigger bound; "
            "a batch read drains the whole offset range"
        )
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }
    if not streaming:
        opts["endingOffsets"] = "latest"
    elif max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_values(df: DataFrame) -> DataFrame:
    """Kafka records → the JSON-string ``value`` column ``ingest_pipeline``
    consumes (the reference's StringDeserializer, CMT:54-55). Works on any
    frame with Kafka's output shape — real source or test stand-in."""
    from pyspark.sql import functions as F

    return df.select(F.col("value").cast("string").alias("value"))


def kafka_batch_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
) -> DataFrame:
    """Bounded replay of a whole topic — the reference's "seek to 0, poll
    until empty" (CMT:93-110) as a batch read. Returns raw key/value binary;
    parse via :func:`kafka_values` + ``ingest_pipeline``. The broker I/O
    itself is not exercised in tests (no broker in the container); the
    option surface and the entire post-source pipeline are (see
    tests/test_ingest.py::test_kafka_shaped_records_through_pipeline)."""
    reader = spark.read.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic).items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_stream_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant of :func:`kafka_batch_source`."""
    reader = spark.readStream.format("kafka")
    opts = kafka_source_options(
        bootstrap_servers,
        topic,
        streaming=True,
        max_offsets_per_trigger=max_offsets_per_trigger,
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


# --- JDBC sink (reference op #12, CMT:163-201) ---


def jdbc_batched_sink(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 1000,
    num_partitions: int | None = None,
    **properties,
) -> None:
    """Spark's JDBC writer does exactly the reference's prepared-statement
    batching (CMT:174-188): per-partition transactions, ``batchsize`` rows
    per executeBatch (reference BATCH_SIZE=1000, CMT:35). ``num_partitions``
    bounds concurrent connections the way the Hikari pool max=4 did
    (CMT:62). Exercised end-to-end against embedded Derby (the JDBC
    driver bundled in Spark's jars) in tests/test_jdbc.py — round-trip
    values, append accumulation, bounded-connection write."""
    if num_partitions:
        df = df.coalesce(num_partitions)
    props = {"batchsize": str(batchsize), **{k: str(v) for k, v in properties.items()}}
    df.write.jdbc(url, table, mode=mode, properties=props)
