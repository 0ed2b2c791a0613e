"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design goal (AQE on, skew-join handling,
Arrow for any Python exchange) while remaining correct on ``local[*]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conservative defaults that are right at both local-test and cluster scale.
# Anything cluster-size-dependent (shuffle partitions, broadcast threshold)
# is overridable via env or kwargs.
_DEFAULT_CONF = {
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed ones.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas_udf / toPandas — 10-100x over pickling.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics across engines (DuckDB oracle parity).
    "spark.sql.session.timeZone": "UTC",
    # events.parquet carries timestamp[ns], which Spark 4 rejects natively
    # (PARQUET_TYPE_ILLEGAL); read as long nanos, converted in load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Don't let tiny files explode task counts in tests; at cluster scale the
    # default 128m is what we want, and this matches it.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Python Data Source API: let custom connectors receive pushed filters
    # (sources/pydatasource.py prunes generation partitions with them).
    "spark.sql.python.filterPushdown.enabled": "true",
}


def get_spark(
    app_name: str = "featurestore-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to whatever the environment provides (spark-submit /
    existing session); tests pass ``local[N]`` explicitly.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
