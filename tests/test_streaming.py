"""Streaming semantics: batch/stream equivalence (SURVEY.md §5 item 3),
foreachBatch demux sink (no tail loss — defect D2's regression in
streaming form), bounded-state dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark import streaming as ST
from featurestore_for_joycastle_java_spark.sources import load_table


def test_stream_drain_equals_batch(spark, sf_dir):
    src = ST.file_stream_source(spark, sf_dir)
    agg = src.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ST.drain_to_memory(agg, "t_equiv", output_mode="complete")
    stream_counts = {
        r.event_type: r.n for r in spark.table("t_equiv").collect()
    }
    batch_counts = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert stream_counts == batch_counts


def test_foreachbatch_demux_no_tail_loss(spark, sf_dir, tmp_path):
    out = str(tmp_path / "dwd_stream")
    ckpt = str(tmp_path / "ckpt")
    src = ST.file_stream_source(spark, sf_dir)
    q = ST.demux_stream_sink(src, out, key_col="event_type", checkpoint_dir=ckpt)
    q.awaitTermination()
    written = spark.read.parquet(out)
    total = load_table(spark, sf_dir, "events").count()
    assert written.count() == total  # defect D2: reference lost tail rows
    # hive-partitioned by event_type for downstream pruning
    types = {r.event_type for r in written.select("event_type").distinct().collect()}
    assert len(types) == 5


def test_stream_dedup_bounded(spark, sf_dir):
    src = ST.file_stream_source(spark, sf_dir)
    deduped = ST.dedup_within_watermark(src, ["user_id", "event_type"])
    ST.drain_to_memory(deduped, "t_dedup", output_mode="append")
    got = spark.table("t_dedup")
    n_pairs_stream = got.select("user_id", "event_type").distinct().count()
    assert got.count() == n_pairs_stream  # exactly one row per pair
    n_pairs_batch = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert n_pairs_stream == n_pairs_batch
