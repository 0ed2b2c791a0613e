"""Point-in-time (as-of) joins and sessionization — the feature-store core
that plain SQL engines special-case (DuckDB ASOF JOIN; Spark has no native
ASOF as of 4.x, SURVEY.md §7.3).

The as-of join here is the union+window pattern, chosen for 100 TB scale:

    tag left/right → union → window over (key, order by ts, side)
        → last(right payload, ignorenulls) → keep left rows

- ONE shuffle (on the join key) + a per-key local sort — same cost shape
  as a sort-merge join. No range-explode, no per-key collect.
- Right side rows carry their payload; left rows carry nulls; `last(...,
  ignorenulls=True)` over an unbounded-preceding frame fills each left row
  with the most recent right payload — exactly "the latest feature value
  known at event time" (backward direction), leakage-free.
- Skew: one hot entity serializes into one task. Mitigation at scale:
  pre-aggregate the right side to (key, time-bucket) granularity first, or
  split hot keys by time-range and stitch — both preserve semantics.

Direction semantics (matching DuckDB ASOF for the oracle):
- backward: match the latest right row with r.ts <= l.ts (ties included);
- forward:  match the earliest right row with r.ts >= l.ts (ties included).

If multiple right rows share one (key, ts), which one wins is undefined in
both engines — deduplicate the right side first (max_by/arg_max) when the
timestamp isn't unique per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    suffix: str = "_matched",
) -> DataFrame:
    """As-of join: every left row + the right payload as of its timestamp.

    ``right_cols`` are the payload columns to carry over (renamed with
    ``suffix`` if they collide with left columns). The matched right
    timestamp is exposed as ``<right_ts><suffix>``. Left rows with no
    qualifying right row keep nulls (left-outer semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    ts = "__asof_ts"
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    matched_ts = right_ts + suffix

    left_cols = [c for c in left.columns]
    l = left.select(
        *on,
        F.col(left_ts).alias(ts),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_cols if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(matched_ts),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
        *[F.col(c).alias(out_names[c]) for c in right_cols],
        F.col(right_ts).alias(matched_ts),
    )
    # The payload travels as ONE struct per right row (non-null struct
    # even when members are null), filled with a single last(ignorenulls)
    # — filling each column independently would let a NULL payload value
    # on the matched row pull a STALE value from an earlier right row,
    # pairing fields of two different right rows (r4 review fix).
    payload = F.when(
        F.col(_SIDE) == 0,
        F.struct(
            *[F.col(out_names[c]) for c in right_cols],
            F.col(matched_ts).alias(matched_ts),
        ),
    )
    unioned = l.unionByName(r).withColumn("__p", payload)

    # backward scans time ascending (right rows first at equal ts so ties
    # match); forward scans descending with the same tie rule.
    if direction == "backward":
        w = Window.partitionBy(*on).orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
    else:
        w = Window.partitionBy(*on).orderBy(F.col(ts).desc(), F.col(_SIDE).asc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    filled = unioned.select(
        "*", F.last("__p", ignorenulls=True).over(w).alias("__f")
    )
    result = filled.filter(F.col(_SIDE) == 1).select(
        *on,
        F.col(ts).alias(left_ts),
        *[c for c in left_cols if c not in on and c != left_ts],
        *[F.col("__f." + out_names[c]).alias(out_names[c]) for c in right_cols],
        F.col("__f." + matched_ts).alias(matched_ts),
    )
    return result


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when the gap
    since the entity's previous event exceeds ``gap_seconds``.

    lag + cumulative-sum over one window: a single shuffle on the entity
    key. Epoch seconds keep the arithmetic integer-exact (oracle parity and
    no DST surprises). The streaming twin is F.session_window (see
    streaming module)."""
    epoch = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(*key_cols).orderBy(epoch)
    is_new = F.when(
        (epoch - F.lag(epoch).over(w)) > gap_seconds, 1
    ).otherwise(0)
    # first row per key: lag is null -> when() falls to otherwise(0); session
    # ids then start at 0 for every entity.
    running = Window.partitionBy(*key_cols).orderBy(epoch).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_new).over(running))


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_matched",
) -> DataFrame:
    """Nearest-in-time as-of join (pandas ``merge_asof(direction=
    'nearest')`` — which neither Spark nor DuckDB ships natively): every
    left row takes the temporally CLOSEST right payload, backward winning
    exact-distance ties.

    ONE shuffle, not two joins: the tagged union is windowed twice over
    the same (key) partitioning — ascending for the backward fill,
    descending for the forward fill; Catalyst plans a single exchange
    with two Window operators (the second sorts within partitions, no
    re-shuffle). Per-row arithmetic then picks the closer side.

    Timestamps must be NUMERIC (epoch µs/seconds) so the distance
    comparison is exact integer math — callers convert with
    ``unix_micros`` first (same contract the oracle replays)."""
    ts = "__asof_ts"
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    matched_ts = right_ts + suffix

    left_cols = list(left.columns)
    l = left.select(
        *on,
        F.col(left_ts).alias(ts),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_cols if c not in on],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
            for c in right_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(matched_ts),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(_SIDE),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in on
        ],
        *[F.col(c).alias(out_names[c]) for c in right_cols],
        F.col(right_ts).alias(matched_ts),
    )
    # one struct per right row, filled once per direction — see
    # asof_join's payload note (a per-column fill could mix fields of
    # two different right rows when payload values are null)
    payload = F.when(
        F.col(_SIDE) == 0,
        F.struct(
            *[F.col(out_names[c]) for c in right_cols],
            F.col(matched_ts).alias(matched_ts),
        ),
    )
    unioned = l.unionByName(r).withColumn("__p", payload)

    w_b = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).desc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last("__p", ignorenulls=True).over(w_b).alias("__b"),
        F.last("__p", ignorenulls=True).over(w_f).alias("__f"),
    )
    b_ts, f_ts = F.col("__b." + matched_ts), F.col("__f." + matched_ts)
    use_b = b_ts.isNotNull() & (
        f_ts.isNull() | ((F.col(ts) - b_ts) <= (f_ts - F.col(ts)))
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *on,
        F.col(ts).alias(left_ts),
        *[c for c in left_cols if c not in on and c != left_ts],
        *[
            F.when(use_b, F.col("__b." + out_names[c]))
            .otherwise(F.col("__f." + out_names[c]))
            .alias(out_names[c])
            for c in right_cols
        ],
        F.when(use_b, b_ts).otherwise(f_ts).alias(matched_ts),
    )
