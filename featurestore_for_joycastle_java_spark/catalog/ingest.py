"""Reference-pipeline queries (SURVEY.md §2.1 ops 3-8, 12-13) over the
fixture ``events`` table (the game_events topic's stand-in, FIXTURES.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.ingest import (
    FIXTURE_EVENT_FIELDS,
    fixture_ingest,
)
from featurestore_for_joycastle_java_spark.operators.relational import exact_sum
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table

# Shared SQL fragment: the fixture pipeline (conditional regex extraction +
# completeness filter) as the oracle sees it.
_INGEST_SQL = """
SELECT
    event_id,
    user_id,
    event_type,
    CASE
        WHEN event_type IN ('purchase', 'signup')
             AND regexp_extract(props, '(\\d+\\.\\d+|\\d+)', 1) <> ''
        THEN TRY_CAST(regexp_extract(props, '(\\d+\\.\\d+|\\d+)', 1) AS DOUBLE)
        ELSE value
    END AS event_value,
    value,
    props
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
  AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
"""


@query("ingest_dwd", oracle=_INGEST_SQL)
def ingest_dwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops #4-#7: gated regex extraction + completeness filter + projection
    (CMT:115-138). The reference's whole per-record loop as one plan."""
    return fixture_ingest(load_table(spark, sf_dir, "events"))


@query(
    "ingest_demux_counts",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(event_value AS DECIMAL(23,6))) AS DOUBLE) AS sum_event_value,
       CAST(SUM(CAST(event_value AS DECIMAL(23,6))) AS DOUBLE) / COUNT(*) AS avg_event_value
FROM ({_INGEST_SQL})
GROUP BY event_type
""",
)
def ingest_demux_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #8: demux by event type (CMT:36,140) summarized per route — the
    per-dwd-table row counts a downstream consumer of the reference's
    SQLite tables would see, plus value totals. Partial (map-side) agg +
    final agg; one shuffle on the 5-value event_type key."""
    dwd = fixture_ingest(load_table(spark, sf_dir, "events"))
    dsum = exact_sum(F.col("event_value"))
    n = F.count(F.lit(1))
    return dwd.groupBy("event_type").agg(
        n.alias("n_rows"),
        dsum.alias("sum_event_value"),
        (dsum / n).alias("avg_event_value"),
    )


@query(
    "ingest_json_props",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS props_k
FROM events
""",
)
def ingest_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #3: JSON field probe (CMT:114's parse, single-field form) —
    get_json_object stays JVM-side; no Python in the loop."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("props_k"),
    )


@query(
    "ingest_completeness",
    oracle="""
SELECT COUNT(*) AS n_valid
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
  AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
""",
)
def ingest_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op #6: field-completeness validation (CMT:130-132) — count of rows
    surviving the all-fields-present filter."""
    events = load_table(spark, sf_dir, "events")
    valid = events.na.drop(subset=FIXTURE_EVENT_FIELDS)
    return valid.agg(F.count(F.lit(1)).alias("n_valid"))
