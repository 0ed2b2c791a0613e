"""Structured Streaming path — the reference's actual modality
(ConsumerMultiThread.java is a Kafka drain loop), Spark-first.

Mapping to the reference (SURVEY.md §2.1):
- "seek to 0, poll until empty, then stop" (CMT:93-110)  →
  ``trigger(availableNow=True)`` — drain everything, then terminate;
- ``max.poll.records=1000`` (CMT:52) → ``maxOffsetsPerTrigger`` /
  ``maxFilesPerTrigger`` (bounded micro-batches);
- per-event-type buffered inserts (CMT:36-150) → ``foreachBatch`` with a
  partitioned write — and unlike the reference, the tail is never lost
  (defect D2) and offsets+sink commit together via checkpointing
  (exactly-once with an idempotent sink, vs. the reference's
  auto-commit-every-10s at-least-once);
- no event-time logic in the reference (EventTimestamp never parsed) —
  the watermark/window/session operators below are the engine extension
  (SURVEY.md §2.2 streaming row).

State-size envelope at 100 TB (design note): every stateful op here is
bounded by its watermark — state = (#keys active within the watermark
horizon) × bytes/key. Tumbling/sliding windows key by (window, group);
session windows and dropDuplicatesWithinWatermark key by entity — size the
horizon accordingly and prefer RocksDB state store on real clusters.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.relational import exact_sum

from featurestore_for_joycastle_java_spark.schemas import EVENTS


#: dir-of-symlinks cache: Spark's file stream source requires a DIRECTORY,
#: fixtures are single read-only files — bridge with a tempdir symlink.
_STREAM_DIRS: dict[str, str] = {}

#: per-path cache of the sniffed events-ts type: the footer read is a
#: driver-side batch job, so pay it once per fixture path, not once per
#: stream construction (fixture files are immutable within a round; a
#: regenerated fixture lands under a fresh process anyway)
_TS_TYPES: dict[str, object] = {}


def _as_stream_dir(file_path: str) -> str:
    if os.path.isdir(file_path):
        return file_path
    if file_path not in _STREAM_DIRS:
        d = tempfile.mkdtemp(prefix="fs_stream_src_")
        os.symlink(file_path, os.path.join(d, os.path.basename(file_path)))
        _STREAM_DIRS[file_path] = d
    return _STREAM_DIRS[file_path]


def file_stream_source(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based stand-in for the Kafka topic: stream the events table.

    The fixture's ts varies by generation — timestamp[ns] (read as long
    under nanosAsLong) or timestamp[us]/isAdjustedToUTC=false (read as
    TIMESTAMP_NTZ). A one-off batch footer read picks the matching stream
    schema, then ts is normalized to a session-local timestamp exactly
    like sources.load_table does for batch."""
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    if path not in _TS_TYPES:
        _TS_TYPES[path] = spark.read.parquet(path).schema["ts"].dataType
    ts_type = _TS_TYPES[path]
    ts_is_long = isinstance(ts_type, LongType)
    ts_ddl = "long" if ts_is_long else ts_type.simpleString()
    schema = (
        f"event_id long, ts {ts_ddl}, user_id long, event_type string, "
        "value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(_as_stream_dir(path))
    if ts_is_long:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def drain_to_memory(
    stream_df: DataFrame, table_name: str, output_mode: str = "complete"
):
    """Run a streaming query with availableNow (the reference's
    drain-then-stop, CMT:104-110) into an in-memory sink and await
    termination. Memory sink collects to the driver — test harness only;
    production uses foreachBatch/parquet sinks below. Returns the
    (terminated) StreamingQuery so callers can read its progress."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def demux_stream_sink(
    stream_df: DataFrame,
    out_dir: str,
    key_col: str = "event_type",
    checkpoint_dir: str | None = None,
):
    """Ops #8-#12 streaming: per-micro-batch partitioned parquet write via
    foreachBatch — the reference's per-type buffered inserts without the
    races (D4) or tail loss (D2). Exactly-once: each micro-batch
    OVERWRITES its own ``batch=<batch_id>`` subdirectory, so a batch
    replayed after a failure between sink write and checkpoint commit
    lands on top of its own partial output instead of appending a
    duplicate (r1 used a plain append here, which was only
    at-least-once). Readers scan ``out_dir`` and see ``batch`` +
    ``key_col`` as discovered partition columns."""
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="fs_ckpt_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.partitionBy(key_col).mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def jdbc_demux_stream_sink(
    stream_df: DataFrame,
    url: str,
    key_col: str = "event_type",
    keys: tuple[str, ...] = ("view", "click", "purchase", "signup", "error"),
    table_prefix: str = "dwd_",
    checkpoint_dir: str | None = None,
    batchsize: int = 1000,
    **properties,
):
    """The reference's END-TO-END shape: stream -> one relational TABLE
    PER EVENT TYPE over JDBC (Kafka -> SQLite there, CMT:163-201;
    file-stream -> Derby here — same drain/demux/batched-insert
    semantics). Each micro-batch routes rows to ``<table_prefix><type>``
    with the reference's batchsize=1000 prepared-statement batching; the
    explicit ``keys`` list mirrors the reference's hardcoded EVENT_TYPES
    (CMT:30) and keeps the per-batch loop free of a distinct() action.

    Delivery is at-least-once into JDBC (the reference's level, S1 in
    SEMANTICS.md): a replayed batch re-inserts. The exactly-once variant
    is the parquet ``demux_stream_sink`` (per-batch-id overwrite)."""
    from featurestore_for_joycastle_java_spark.sources import jdbc_batched_sink

    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="fs_ckpt_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        for k in keys:
            jdbc_batched_sink(
                batch_df.filter(F.col(key_col) == k),
                url,
                f"{table_prefix}{k}",
                batchsize=batchsize,
                **properties,
            )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def tumbling_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window aggregation. Late data beyond the
    watermark is dropped; state per (window × group) is freed once the
    watermark passes the window end."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("sum_value"),
        )
    )


def sliding_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows: each event lands in window/slide overlapping
    windows (state multiplies accordingly — keep the ratio small)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def session_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Session windows (gap-merged) per entity — the streaming twin of
    operators.asof.sessionize; a session closes when the watermark passes
    last_event + gap."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def stateful_user_totals(
    stream_df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) carried across micro-batches in explicit group
    state — the arbitrary-stateful-processing escape hatch for logic
    watermarked windows can't express.

    Emits the updated running totals for every group seen in a batch
    (append mode). State is two scalars per active user — at 100 TB the
    envelope is #distinct-users × ~32 bytes; add a state timeout to age
    out idle users on unbounded streams."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "sum_value": [round(s, 4)],
            }
        )

    # the output key column inherits the input's type (string user ids
    # are as valid as longs — the quota_rate_limiter fix, applied to
    # the whole stateful family)
    key_type = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, n_events long, sum_value double"
        ),
        stateStructType="n long, s double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state ages out beyond it."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: right events joined to left
    events with the same key where ``left_ts <= right_ts <= left_ts +
    within``. Column names must already be distinct across the two sides
    (rename before calling).

    Both sides carry watermarks and the join condition bounds event time
    in both directions, so each side's buffered state is freed once the
    other side's watermark passes the interval — state is
    O(rate x (within + watermark)) per side, never unbounded. This is the
    streaming shape of the as-of/range join family: at 100 TB/day the
    join shuffles both streams on the key once per micro-batch."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    return lw.join(
        rw,
        F.expr(
            f"{left_key} = {right_key} AND {right_ts} >= {left_ts} "
            f"AND {right_ts} <= {left_ts} + interval {within}"
        ),
    )


def scd1_upsert_stream_sink(
    stream_df: DataFrame,
    dim_dir: str,
    key_col: str,
    order_col: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Streaming DIMENSION MAINTENANCE: every micro-batch is reduced to
    one latest row per key (``max_by`` over ``order_col``) and MERGED
    into a dimension snapshot with ``operators.scd.scd1_upsert`` — the
    write path a feature store runs continuously to keep an
    overwrite-in-place (SCD type-1) entity table current off the event
    stream. The reference's INSERT-only sink (CMT:163-201) appends
    duplicates forever; this keeps one row per entity.

    Snapshots are VERSIONED (``dim_dir/v=<batch_id>``), because a
    parquet directory cannot be overwritten while the same job reads it:
    batch b merges the newest snapshot with version < b and writes
    ``v=b`` whole. That also makes delivery exactly-once: a batch
    replayed after a sink write but before the checkpoint commit
    re-reads the same predecessor (versions >= its own id are ignored)
    and deterministically rewrites its own snapshot. Read the current
    dimension with ``read_dim_latest``; retire old versions out-of-band.

    Scale: the merge cost per batch is O(|dim| + |batch|) scan + one
    key-hash shuffle — at 100 TB dimensions use a mergeable table format
    for the same semantics; the versioned-snapshot shape is the plain-
    parquet expression of it, and the per-batch reduce keeps the merge
    input at one row per touched key."""
    from featurestore_for_joycastle_java_spark.operators.scd import scd1_upsert

    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="fs_ckpt_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        payload = [c for c in batch_df.columns if c != key_col]
        # ONE max_by over a struct of the whole payload — independent
        # per-column max_by calls could stitch fields of two different
        # input rows on an order_col tie (same non-atomic-payload bug
        # class as the r4 asof struct-fill fix)
        newest = (
            batch_df.groupBy(key_col)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in payload]), F.col(order_col)
                ).alias("__s")
            )
            .select(key_col, *[F.col(f"__s.{c}").alias(c) for c in payload])
        )
        prev = [
            v
            for v in _committed_versions(dim_dir)
            if v < batch_id
        ]
        if prev:
            dim = spark.read.parquet(os.path.join(dim_dir, f"v={max(prev)}"))
            merged = scd1_upsert(dim, newest, key_col)
        else:
            merged = newest
        merged.write.mode("overwrite").parquet(
            os.path.join(dim_dir, f"v={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    # availableNow on a SimpleDataSourceStreamReader drains only the
    # batch prefetched at query start (its "available" horizon is one
    # read() call) — pass available_now=False and stop() explicitly to
    # pump a multi-batch Python source (see tests); file/Kafka sources
    # drain fully either way.
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _committed_versions(dim_dir: str) -> list[int]:
    """Snapshot versions whose parquet COMMIT MARKER (_SUCCESS) exists —
    a version directory appears at write START, so listing alone would
    let a reader (or a merging batch) observe a partial snapshot."""
    if not os.path.isdir(dim_dir):
        return []
    return [
        int(d.split("=", 1)[1])
        for d in os.listdir(dim_dir)
        if d.startswith("v=")
        and d.split("=", 1)[1].isdigit()
        and os.path.exists(os.path.join(dim_dir, d, "_SUCCESS"))
    ]


def read_dim_latest(spark: SparkSession, dim_dir: str) -> DataFrame:
    """Current dimension = the highest COMMITTED snapshot version under
    ``dim_dir`` (see ``scd1_upsert_stream_sink``; versions without a
    _SUCCESS marker are in-flight or aborted writes and are skipped)."""
    versions = _committed_versions(dim_dir)
    if not versions:
        raise FileNotFoundError(f"no committed dimension snapshots under {dim_dir}")
    return spark.read.parquet(os.path.join(dim_dir, f"v={max(versions)}"))


def quota_rate_limiter(
    stream_df: DataFrame,
    key_col: str = "user_id",
    quota: int = 50,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming per-key quota enforcement via ``applyInPandasWithState``
    — the rate-limiter every ingestion edge runs: each key's first
    ``quota`` events (in event-time order) are admitted, the rest
    counted as denied, and the moment the quota was reached is recorded.
    Watermarked windows cannot express 'first N ever per key'; this is
    the arbitrary-stateful escape hatch used the way the API intends.

    Correctness under micro-batching: rows of one batch-group arrive in
    SHUFFLE order, so each batch's rows are sorted by (ts, id) before
    the quota is applied; across batches the admission decision is
    correct as long as the source delivers batches in event-time order
    (file sources with staged mtimes + maxFilesPerTrigger do; a Kafka
    topic partitioned by key with in-partition ordering does too).

    State per key is four scalars (admitted, denied, reached-at micros,
    reached flag — the flag is its own field because every long value
    is a legal timestamp, so no in-domain sentinel is collision-free)
    — the 100 TB envelope is #keys × ~40 bytes; add a state timeout to
    age out idle keys on unbounded streams. Emits the running totals per
    touched key each batch (append mode); the final emission per key is
    the settled answer."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        # Reached-ness lives in its OWN boolean field: any sentinel
        # inside the long domain collides with some legitimate
        # timestamp (r = -1 fixed the epoch-0 case but a quota reached
        # at epoch minus 1 microsecond stores exactly -1 — ADVICE r11),
        # and pre-epoch event times store negative micros legally.
        a, d, r, reached = (
            state.get if state.exists else (0, 0, 0, False)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, id_col], kind="mergesort")
        # Closed form of the per-row loop (r12 opt, guide §4.2 — batch
        # arithmetic instead of a Python row loop): the first
        # (quota - a) sorted rows are admitted, the rest denied, and
        # the quota is reached exactly at the (quota - a)th admitted
        # row when this batch crosses it.
        m = len(batch)
        adm = min(m, quota - a) if a < quota else 0
        d += m - adm
        if adm and a + adm == quota:
            r = int(
                pd.Timestamp(batch[ts_col].iloc[adm - 1]).value // 1000
            )  # micros
            reached = True
        a += adm
        state.update((a, d, r, reached))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_allowed": [a],
                "n_denied": [d],
                "quota_reached_ts": [
                    pd.Timestamp(r * 1000) if reached else pd.NaT
                ],
            }
        )

    # The output key column inherits the input's type (string user ids
    # are as valid as longs — ADVICE r10: the type was hardcoded long).
    key_type = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, n_allowed long, n_denied long, "
            "quota_reached_ts timestamp"
        ),
        stateStructType="a long, d long, r long, reached boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
