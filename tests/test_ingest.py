"""Pipeline-semantics unit tests for the reference-parity ingest path
(SURVEY.md §5 test plan, item 2): regex-extraction cases, completeness
filter incl. null-valued fields (defect D3 semantics), gating (critical
semantics note on CMT:117), and no-tail-loss (defect D2 regression)."""

from __future__ import annotations

import json

from pyspark.sql import Row, functions as F

from featurestore_for_joycastle_java_spark.operators.ingest import (
    demux_tables,
    ingest_pipeline,
)
from featurestore_for_joycastle_java_spark.schemas import EVENT_FIELDS


def _event(**overrides):
    base = {
        "EventID": "e1",
        "PlayerID": "p1",
        "EventTimestamp": "2024-01-01T00:00:00",
        "EventType": "InAppPurchase",
        "EventDetails": "4.99 USD",
        "DeviceType": "ios",
        "Location": "US",
    }
    base.update(overrides)
    return base


def _raw_df(spark, events):
    return spark.createDataFrame(
        [Row(value=json.dumps(e)) for e in events]
    )


def test_decimal_preferred_over_integer(spark):
    # "4.99 USD" -> 4.99, not 4 (alternation order at same start, CMT:121)
    out = ingest_pipeline(_raw_df(spark, [_event(EventDetails="4.99 USD")])).collect()
    assert out[0]["EventValue"] == 4.99


def test_integer_extraction(spark):
    out = ingest_pipeline(_raw_df(spark, [_event(EventDetails="level 7")])).collect()
    assert out[0]["EventValue"] == 7.0


def test_first_match_wins(spark):
    # "2 items 4.99" -> 2 (first match position wins over later decimal)
    out = ingest_pipeline(
        _raw_df(spark, [_event(EventDetails="2 items 4.99")])
    ).collect()
    assert out[0]["EventValue"] == 2.0


def test_no_digits_keeps_row_null_value(spark):
    # no-match branch (CMT:124): row survives, no extracted value
    out = ingest_pipeline(
        _raw_df(spark, [_event(EventDetails="no digits here")])
    ).collect()
    assert len(out) == 1
    assert out[0]["EventValue"] is None
    assert out[0]["EventDetails"] == "no digits here"


def test_non_extract_type_not_extracted_but_kept(spark):
    # CMT:117 gates extraction, NOT survival: click rows still land
    out = ingest_pipeline(_raw_df(spark, [_event(EventType="click")])).collect()
    assert len(out) == 1
    assert out[0]["EventValue"] is None


def test_missing_field_dropped(spark):
    e = _event()
    del e["Location"]
    assert ingest_pipeline(_raw_df(spark, [e])).count() == 0


def test_null_field_dropped(spark):
    # defect D3: present-but-null NPE'd in the reference; here it's dropped
    assert ingest_pipeline(_raw_df(spark, [_event(Location=None)])).count() == 0


def test_extra_fields_ignored(spark):
    out = ingest_pipeline(_raw_df(spark, [_event(Unexpected="x")]))
    assert out.columns == EVENT_FIELDS + ["EventValue"]
    assert out.count() == 1


def test_demux_routing(spark):
    events = [
        _event(EventID=f"e{i}", EventType=t)
        for i, t in enumerate(["InAppPurchase", "SessionEnd", "click", "click"])
    ]
    dwd = ingest_pipeline(_raw_df(spark, events))
    # default: the reference's hardcoded EVENT_TYPES tuple, no driver action
    assert set(demux_tables(dwd)) == {"InAppPurchase", "SessionEnd"}
    # keys=None opts into distinct-key discovery (a collect action)
    tables = demux_tables(dwd, keys=None)
    assert set(tables) == {"InAppPurchase", "SessionEnd", "click"}
    assert tables["click"].count() == 2


def test_no_tail_loss(spark, tmp_path):
    # defect D2 regression: reference dropped up to BATCH_SIZE-1 tail rows
    # per type; whole-DataFrame write must lose nothing.
    events = [_event(EventID=f"e{i}") for i in range(37)]
    dwd = ingest_pipeline(_raw_df(spark, events))
    out = str(tmp_path / "dwd")
    dwd.write.partitionBy("EventType").parquet(out)
    assert spark.read.parquet(out).count() == 37


def test_fixture_ingest_value_passthrough(spark, sf_dir):
    # non-extract fixture types keep their original `value`
    from featurestore_for_joycastle_java_spark.operators.ingest import fixture_ingest
    from featurestore_for_joycastle_java_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    out = fixture_ingest(events)
    mismatch = out.filter(
        (~F.col("event_type").isin("purchase", "signup"))
        & (F.col("event_value") != F.col("value"))
    )
    assert mismatch.count() == 0


def test_kafka_source_options_reference_semantics():
    from featurestore_for_joycastle_java_spark.sources import (
        kafka_source_options,
    )

    batch = kafka_source_options("localhost:9092", "game_events")
    # seek-to-0 (CMT:93-98) + drain-then-stop (CMT:104-110)
    assert batch["startingOffsets"] == "earliest"
    assert batch["endingOffsets"] == "latest"
    assert batch["subscribe"] == "game_events"
    stream = kafka_source_options(
        "localhost:9092", "game_events", streaming=True,
        max_offsets_per_trigger=1000,
    )
    # max.poll.records=1000 analog (CMT:52); no endingOffsets on a stream
    assert stream["maxOffsetsPerTrigger"] == "1000"
    assert "endingOffsets" not in stream


def test_kafka_shaped_records_through_pipeline(spark):
    # the exact consumption path minus the socket: records with Kafka's
    # output schema (binary value) -> StringDeserializer equivalent ->
    # full ingest pipeline
    from pyspark.sql import Row

    from featurestore_for_joycastle_java_spark.sources import (
        KAFKA_SOURCE_SCHEMA,
        kafka_values,
    )

    recs = [
        Row(
            key=None,
            value=json.dumps(_event(EventID=f"e{i}", EventDetails="4.99 USD")).encode(),
            topic="game_events",
            partition=0,
            offset=i,
            timestamp=None,
            timestampType=0,
        )
        for i in range(3)
    ]
    kafka_df = spark.createDataFrame(recs, KAFKA_SOURCE_SCHEMA)
    out = ingest_pipeline(kafka_values(kafka_df)).collect()
    assert len(out) == 3
    assert all(r["EventValue"] == 4.99 for r in out)


def test_kafka_batch_rejects_trigger_bound():
    import pytest

    from featurestore_for_joycastle_java_spark.sources import (
        kafka_source_options,
    )

    with pytest.raises(ValueError, match="streaming"):
        kafka_source_options("h:9092", "t", max_offsets_per_trigger=1000)


def test_demux_other_key_col_requires_explicit_keys(spark):
    import pytest

    dwd = ingest_pipeline(_raw_df(spark, [_event()]))
    with pytest.raises(ValueError, match="keys explicitly"):
        demux_tables(dwd, key_col="DeviceType")
    # explicit keys work for any column
    assert set(demux_tables(dwd, key_col="DeviceType", keys=["ios"])) == {"ios"}


def test_python_datasource_partition_parallel_and_deterministic(spark):
    """The synthetic_events Python data source must (a) honor rows/
    partitions options, (b) produce the exact rows of the public
    generation rule, (c) be layout-invariant: 1 partition and 8
    partitions yield the identical row set."""
    from featurestore_for_joycastle_java_spark.sources.pydatasource import (
        register_synthetic_source,
        synth_row,
    )

    register_synthetic_source(spark)

    def rd(parts):
        return (
            spark.read.format("synthetic_events")
            .option("rows", 500)
            .option("partitions", parts)
            .load()
        )

    df8 = rd(8)
    assert df8.rdd.getNumPartitions() == 8
    got = sorted(map(tuple, df8.collect()))
    assert got == sorted(map(tuple, rd(1).collect()))
    assert len(got) == 500
    assert got[:3] == [synth_row(0), synth_row(1), synth_row(2)]


def test_python_datasource_filter_pushdown_prunes_generation(spark):
    """Range predicates on event_id must reach the connector and shrink
    the PLANNED generation ranges (the custom-source half of predicate
    pushdown); declined filters (event_type) are re-applied by Spark, so
    results stay exact either way."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    from featurestore_for_joycastle_java_spark.sources.pydatasource import (
        _SyntheticReader,
        register_synthetic_source,
        synth_row,
    )

    # unit level: pushed bounds tighten the partition ranges
    r = _SyntheticReader({"rows": "10000", "partitions": "4"})
    declined = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 9000),
                LessThan(("event_id",), 9500),
                EqualTo(("event_type",), "click"),
            ]
        )
    )
    assert [type(f).__name__ for f in declined] == ["EqualTo"]
    parts = r.partitions()
    assert min(p.start for p in parts) == 9000
    assert max(p.end for p in parts) == 9500
    assert sum(p.end - p.start for p in parts) == 500

    # end to end: pushed + declined filters compose correctly
    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 2000)
        .load()
        .filter((F.col("event_id") < 100) & (F.col("event_type") == "click"))
    )
    expect = [synth_row(i) for i in range(100) if synth_row(i)[2] == "click"]
    assert sorted(map(tuple, df.collect())) == sorted(expect)
