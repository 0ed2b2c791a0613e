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
- Skew: one hot entity serializes into one task. Mitigation (r5,
  implemented): ``asof_join_bucketed`` splits the window's partitioning
  key to (key, time-bucket) and stitches cross-bucket matches from a
  bucket-granular carry frame — semantics identical, hot keys spread
  across their time range. ``multi_asof_join`` joins ONE left spine to N
  feature frames in a single shuffle (the training-set assembly read).

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
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join: every left row + the right payload as of its timestamp.

    ``right_cols`` are the payload columns to carry over (renamed with
    ``suffix`` if they collide with left columns). The matched right
    timestamp is exposed as ``<right_ts><suffix>``. Left rows with no
    qualifying right row keep nulls (left-outer semantics).

    ``tolerance`` (pandas ``merge_asof(tolerance=...)``, r5): maximum
    allowed |l.ts - r.ts| for a match — the bounded-staleness contract a
    feature store serves ("use the latest value, but never older than
    X"). Matches beyond it are nulled wholesale (payload + matched ts
    together — atomic, never a half-expired row). Requires NUMERIC
    timestamps (epoch seconds/µs) so the distance is exact integer math;
    the plan cost is unchanged (one post-fill comparison per row)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")

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
    # pairing fields of two different right rows (r4 review fix). Right
    # rows with a NULL timestamp carry NO payload (r5 review fix): a
    # NULL ts can never satisfy l.ts >= r.ts / <= r.ts — DuckDB ASOF
    # matches nothing — but they sort first/last in the window and would
    # otherwise fill a half-row (payload with null matched ts).
    payload = F.when(
        (F.col(_SIDE) == 0) & F.col(matched_ts).isNotNull(),
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
    if tolerance is not None:
        # one condition gates payload AND matched ts — a match either
        # survives whole or nulls whole (same atomicity rule as the fill)
        fresh = F.abs(F.col(ts) - F.col("__f." + matched_ts)) <= F.lit(
            tolerance
        )
        filled = filled.withColumn(
            "__f", F.when(fresh, F.col("__f"))
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
    # asof_join's payload notes (per-column fills could mix rows; NULL-ts
    # right rows carry no payload)
    payload = F.when(
        (F.col(_SIDE) == 0) & F.col(matched_ts).isNotNull(),
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


def multi_asof_join(
    left: DataFrame,
    rights: list[tuple[DataFrame, str, list[str], str]],
    on: list[str],
    left_ts: str,
) -> DataFrame:
    """Point-in-time join of ONE left spine to N right feature frames in
    a SINGLE shuffle — the leakage-free training-set assembly read (one
    label spine as-of joined to every feature table at label time).

    ``rights``: list of ``(right_df, right_ts, payload_cols, tag)``.
    Payload column names must be unique across all rights and disjoint
    from the left's columns (pre-alias them); each right's matched
    timestamp is exposed as ``<tag>_ts_matched``.

    Plan shape: tag all N+1 frames, union, then N independent
    ``last(payload_struct, ignorenulls)`` fills over the SAME window
    spec — Catalyst plans ONE Exchange (on the key) and ONE Window
    operator evaluating all N fills in a single pass. A per-feature
    asof_join chain would shuffle the spine N times; this shuffles the
    union once, which at 100 TB is the difference between N fact-table
    exchanges and one.

    Direction is backward-inclusive (latest right row with r.ts <= l.ts,
    DuckDB ASOF semantics); per-right ties at one (key, ts) are
    undefined in both engines — dedup each right first (same contract as
    ``asof_join``). Payloads travel as one struct per right row so a
    null payload value can never pair with another row's timestamp."""
    ts = "__asof_ts"
    left_cols = list(left.columns)
    taken = set(left_cols)
    for _, _, cols, tag in rights:
        # the generated matched-ts name participates in the uniqueness
        # check too (r5 review fix: duplicate tags — or a left column
        # named like one — would emit ambiguous output columns)
        for c in [*cols, f"{tag}_ts_matched"]:
            if c in taken:
                raise ValueError(f"duplicate payload column: {c}")
            taken.add(c)

    frames = [
        left.select(
            *on,
            F.col(left_ts).alias(ts),
            F.lit(1).alias(_SIDE),
            *[F.col(c) for c in left_cols if c not in on and c != left_ts],
        )
    ]
    for i, (right, right_ts, cols, tag) in enumerate(rights):
        frames.append(
            right.select(
                *on,
                F.col(right_ts).alias(ts),
                F.lit(0).alias(_SIDE),
                # NULL-ts right rows carry no payload (see asof_join)
                F.when(
                    F.col(right_ts).isNotNull(),
                    F.struct(
                        *[F.col(c) for c in cols],
                        F.col(right_ts).alias(f"{tag}_ts_matched"),
                    ),
                ).alias(f"__p{i}"),
            )
        )
    u = frames[0]
    for fr in frames[1:]:
        u = u.unionByName(fr, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"__p{i}", ignorenulls=True).over(w).alias(f"__f{i}")
            for i in range(len(rights))
        ],
    )
    out_cols: list = [
        *on,
        F.col(ts).alias(left_ts),
        *[c for c in left_cols if c not in on and c != left_ts],
    ]
    for i, (_, _, cols, tag) in enumerate(rights):
        out_cols += [F.col(f"__f{i}.{c}").alias(c) for c in cols]
        out_cols.append(
            F.col(f"__f{i}.{tag}_ts_matched").alias(f"{tag}_ts_matched")
        )
    return filled.filter(F.col(_SIDE) == 1).select(*out_cols)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    bucket_width: int,
    suffix: str = "_matched",
) -> DataFrame:
    """Skew-mitigated backward as-of join: result-identical to
    ``asof_join(direction="backward")``, but the big window partitions by
    (key, time-bucket) instead of (key) — a hot entity's rows spread
    across its time range instead of serializing into one task (the
    module-doc skew note, implemented).

    Decomposition: the latest right row at-or-before t is either (a) in
    the left row's own bucket — found by an as-of join partitioned on
    (key, bucket) — or (b) the LATEST right row of the nearest earlier
    non-empty bucket, which is independent of t within the bucket. (b)
    comes from a bucket-granular carry frame: one ``max_by`` per (key,
    bucket), forward-filled per key over bucket indices — a frame of
    size O(#keys x #active buckets), so the only per-key-serial window
    runs over bucket counts, not row counts.

    Cost: 3 small shuffles (within-bucket union window + carry window +
    stitch join, the last two on bucket-granular/bucket-keyed frames) vs
    asof_join's 1 — buy it when the hot key's single-task sort costs
    more than two extra full-frame shuffles. The crossover is
    PARALLELISM-DEPENDENT (the straggler runs on one core while the
    extra shuffles use all of them). Measured:

    - local[8], 2 M left + 1 M right rows, 95% on ONE key over 64 daily
      buckets: plain 2.56 s (one task sorts ~2.8 M rows) vs 1.51 s
      bucketed — bucketed WINS.
    - local[32] (SCALETEST_r11, inflated sf0.1 events): plain still
      wins at 0.96 M hot rows (1.13 vs 3.24 s, 30% skew), at 2.9 M
      (1.33 vs 1.63 s, 90% skew) and at 5.8 M (1.96 vs 2.28 s), the
      ratio shrinking monotonically per octave (1.5 → 1.23 → 1.16) —
      measured-extrapolated crossover ~1–2×10⁷ rows/key at 32-way
      parallelism.

    Guidance threshold (from the three measurements): reach for the
    bucketed variant when rows-on-the-hottest-key ≳ 3 M × (cores / 8)
    at single-node parallelism (Spark's single-task sort clears ~3 M
    rows/s warm, so the straggler must carry tens of millions before
    it beats two extra shuffle rounds); on a large cluster the
    comparison is one-core sort of the hot key vs two extra
    all-to-all shuffle ROUNDS of the frame — with thousands of cores
    the shuffle rounds amortize and the crossover drops back toward
    ~10⁶–10⁷ rows/key. Even-key frames should always prefer plain
    asof_join (one shuffle, no stitch).

    ``left_ts``/``right_ts`` must be NUMERIC (epoch seconds/µs) so
    ``floor(ts / bucket_width)`` is exact integer math. Tie semantics
    and the dedup-right contract match ``asof_join`` (ties only arise
    within a bucket, where the inner as-of applies the same rule)."""
    bkt = "__asof_bkt"
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    matched_ts = right_ts + suffix

    lb = left.withColumn(bkt, F.floor(F.col(left_ts) / F.lit(bucket_width)))
    rb = right.withColumn(bkt, F.floor(F.col(right_ts) / F.lit(bucket_width)))

    # (a) within-bucket as-of: the heavy window, partitioned on (key, bucket)
    within = asof_join(
        lb, rb, on + [bkt], left_ts, right_ts, right_cols, "backward", suffix
    )

    # (b) carry frame: latest right payload per (key, bucket), exposed to
    # every LATER left bucket. Right buckets enter the fill at sort key
    # (bkt + 1) so a left bucket b sees exactly the right buckets < b.
    payload_t = F.struct(
        *[F.col(c).alias(out_names[c]) for c in right_cols],
        F.col(right_ts).alias(matched_ts),
    )
    # NULL-ts right rows can never match (see asof_join) and their bucket
    # is NULL anyway — drop them before the carry aggregation
    r_latest = rb.filter(F.col(right_ts).isNotNull()).groupBy(*on, bkt).agg(
        F.max_by(payload_t, F.col(right_ts)).alias("__carry")
    )
    l_buckets = lb.select(*on, bkt).distinct()
    carry_u = l_buckets.select(
        *on, F.col(bkt), F.col(bkt).alias("__k"), F.lit(1).alias(_SIDE)
    ).unionByName(
        r_latest.select(
            *on,
            F.col(bkt),
            (F.col(bkt) + 1).alias("__k"),
            F.lit(0).alias(_SIDE),
            "__carry",
        ),
        allowMissingColumns=True,
    )
    w_c = (
        Window.partitionBy(*on)
        .orderBy(F.col("__k").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        carry_u.select(
            *on, bkt, _SIDE, F.last("__carry", ignorenulls=True).over(w_c).alias("__c")
        )
        .filter(F.col(_SIDE) == 1)
        .select(*on, bkt, "__c")
    )

    # stitch: within-bucket match wins; else the carry — the matched ts
    # is the non-null witness of a real within match (payload values may
    # legitimately be null on a matched row). The join is NULL-SAFE on
    # the keys (r5 review fix): Window.partitionBy groups NULL keys into
    # one partition, so the plain as-of matches them — a null-unsafe
    # equi-join here would silently drop their cross-bucket carry.
    from functools import reduce as _reduce

    w_al, c_al = within.alias("__wb"), carry.alias("__cb")
    cond = _reduce(
        lambda a, b: a & b,
        [
            F.col(f"__wb.{c}").eqNullSafe(F.col(f"__cb.{c}"))
            for c in on + [bkt]
        ],
    )
    stitched = w_al.join(c_al, cond, "left")
    has_within = F.col(f"__wb.{matched_ts}").isNotNull()
    return stitched.select(
        *[F.col(f"__wb.{c}").alias(c) for c in on],
        F.col(f"__wb.{left_ts}").alias(left_ts),
        *[
            F.col(f"__wb.{c}").alias(c)
            for c in left.columns
            if c not in on and c != left_ts and c != bkt
        ],
        *[
            F.when(has_within, F.col(f"__wb.{out_names[c]}"))
            .otherwise(F.col(f"__cb.__c.{out_names[c]}"))
            .alias(out_names[c])
            for c in right_cols
        ],
        F.coalesce(
            F.col(f"__wb.{matched_ts}"), F.col(f"__cb.__c.{matched_ts}")
        ).alias(matched_ts),
    )
