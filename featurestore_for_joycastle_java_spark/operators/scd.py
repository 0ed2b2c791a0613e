"""Slowly-changing-dimension maintenance operators: build an SCD type-2
history from a change log, and APPLY a new change batch to an existing
effective-dated dimension (the MERGE/upsert write every feature store runs
per batch — the reference's INSERT-only sink, ConsumerMultiThread.java:
163-201, is strictly weaker; this is the round-5 extension on top of the
r4 history build / point-in-time lookup).

Scale shape: every operator here is one hash shuffle on the entity key —
lag/lead windows over (key, ts) and an anti-join/union merge. No interval
range join, no explode, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_build(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Gaps-and-islands SCD2 history from a change log: collapse runs of
    consecutive identical values per key (lag-based change detection),
    then effective-date each surviving change with lead.

    Output: ``(key_col, value_col, valid_from, valid_to, is_current)``
    where ``valid_from``/``valid_to`` carry ``ts_col``'s type and the
    open row has ``valid_to IS NULL``. Rows are ordered per key by
    ``(ts_col, order_col)`` — pass a unique tiebreaker (event id) so the
    fold is total and engine-replayable.

    One shuffle: both windows share the ``key_col`` partitioning.

    NULL semantics (r5 review fix): a key's FIRST row always opens a
    version, even when its value is NULL — detected via ``lag(ts_col)``
    being null, because ``eqNullSafe(NULL value, NULL lag)`` is true and
    would otherwise silently collapse it (which broke ``scd2_apply``'s
    identity on open rows with NULL values: the seed row vanished).
    NULL→NULL runs still collapse; NULL→x and x→NULL are changes.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    chg = changes.withColumn(
        "__is_chg",
        (
            F.lag(ts_col).over(w).isNull()
            | ~F.col(value_col).eqNullSafe(F.lag(value_col).over(w))
        ).cast("int"),
    ).filter(F.col("__is_chg") == 1)
    return chg.select(
        key_col,
        value_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Apply a change batch to an existing SCD2 dimension: close each
    affected open row, insert the batch's new versions, and pass every
    other row through untouched — the MERGE (apply-changes) maintenance
    write, expressed as filter + union + one windowed rebuild over only
    (open rows ∪ batch).

    ``dim`` must be ``scd2_build`` output (columns ``key_col, value_col,
    valid_from, valid_to, is_current``); ``batch`` is new change-log rows
    ``(key_col, ts_col, value_col, order_col)``.

    Contract (append-only change log): batch rows at or before an
    existing open row's ``valid_from`` are LATE data and are dropped
    (applying them would require rewriting closed history — a backfill
    rebuild, not an apply). Batch rows whose value equals the key's
    current value are no-ops and produce no new version. Keys absent
    from ``dim`` insert their full mini-history.

    Composition law (tested): ``scd2_apply(scd2_build(prefix), suffix)
    == scd2_build(prefix ∪ suffix)`` for any time-split of the change
    log — because run-collapse is prefix-composable once the open row
    seeds the rebuild.

    Scale: closed rows never move (filter pass-through); the rebuild
    windows touch one row per (active key) plus the batch — at 100 TB
    the apply costs O(|batch| + |open rows of touched keys|), not
    O(|dim|). Two shuffles total (the guard join + the rebuild window,
    both on ``key_col``).
    """
    closed = dim.filter(~F.col("is_current")).select(
        key_col, value_col, "valid_from", "valid_to", "is_current"
    )
    open_rows = dim.filter(F.col("is_current"))

    order_type = batch.schema[order_col].dataType
    seed = open_rows.select(
        key_col,
        F.col("valid_from").alias(ts_col),
        value_col,
        F.lit(None).cast(order_type).alias(order_col),
    )
    # late-data guard: batch rows not strictly after the key's open row
    # are dropped (documented contract above)
    guarded = (
        batch.select(key_col, ts_col, value_col, order_col)
        .join(
            open_rows.select(key_col, F.col("valid_from").alias("__seed_t")),
            key_col,
            "left",
        )
        .filter(
            F.col("__seed_t").isNull() | (F.col(ts_col) > F.col("__seed_t"))
        )
        .drop("__seed_t")
    )
    # the seed's null order_col sorts FIRST among equal timestamps, but by
    # the guard every surviving batch row has ts > seed ts, so the seed is
    # always the key's first row regardless of null ordering
    rebuilt = scd2_build(
        seed.unionByName(guarded), key_col, ts_col, value_col, order_col
    )
    return closed.unionByName(rebuilt)


def scd1_upsert(
    dim: DataFrame,
    batch: DataFrame,
    key_col: str,
) -> DataFrame:
    """SCD type-1 (latest-wins) upsert: batch rows replace the key's
    dimension row; untouched keys pass through. The anti-join + union
    MERGE pattern — both inputs one row per key (pre-aggregate the batch
    with ``max_by`` first when it carries multiple versions).

    One shuffle on ``key_col`` (the anti join); with a dim bucketed or
    pre-partitioned on the key the exchange drops out entirely."""
    return dim.join(
        batch.select(key_col), key_col, "left_anti"
    ).unionByName(batch)
