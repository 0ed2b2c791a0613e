"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``featurestore_for_joycastle_java_spark.registry``): ``queries()`` /
``oracle_sql()`` are populated by the catalog modules, one entry per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from featurestore_for_joycastle_java_spark import registry
from featurestore_for_joycastle_java_spark.registry import ORACLES, QUERIES

registry.load_catalog()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's entire reason to exist — drain the
    events table, extract the numeric feature, demux by event type — then
    summarize per route (rows>0 smoke)."""
    return QUERIES["ingest_demux_counts"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
