"""Feature-engineering operators a feature store serves next to plain
aggregates (reference scope: the DWD property extraction feeding feature
tables, ConsumerMultiThread.java:43-160 — these are the derived-feature
computations a production store layers on top).

Currently: exponentially-decayed (EWMA) per-entity feature values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def ewma_decay(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    since: Column | str | None = None,
) -> DataFrame:
    """Exponentially-decayed feature value per entity:
    ``ewma_n = alpha * v_n + (1 - alpha) * ewma_(n-1)``, seeded with the
    entity's first event, events ordered by ``(ts_col, order_col,
    value_col)`` for a total deterministic order.

    Output: ``(entity_col, n_events, ewma_value)`` — ``n_events`` counts
    the non-null values that entered the fold (null values are dropped
    explicitly; Spark's ``collect_list`` would drop them silently while
    external replays — e.g. DuckDB ``list()`` — keep them, so the filter
    pins identical semantics on every engine).

    ``since``: the bounded time slice. EWMA state is the entity's
    collected event array, so an unbounded scan of a years-deep corpus
    concentrates every event of a hot entity into one aggregation buffer.
    Pass a literal/Column lower bound on ``ts_col`` (exclusive events
    before it) to cap the per-entity array at the slice's event count —
    the envelope a production backfill uses (process one time slice per
    run, seed the next slice from the previous EWMA). At 100 TB the
    filter is a pushed-down predicate, so the scan itself shrinks too.

    Shape: one groupBy(entity) shuffle carrying each entity's (ts, order,
    value) structs, then a per-row HOF fold — no window, no second
    shuffle, no UDF. The recursive fold is NOT expressible as a
    closed-form window without changing float semantics, so the
    collected-array fold IS the scale path for this feature.
    """
    ev = df.filter(F.col(value_col).isNotNull())
    if since is not None:
        ev = ev.filter(F.col(ts_col) >= since)
    # struct sort compares field-by-field, so value_col is an explicit
    # tertiary key — replays must order by all three, not just (ts, order)
    arr = F.sort_array(
        F.collect_list(
            F.struct(F.col(ts_col), F.col(order_col), F.col(value_col))
        )
    )
    g = ev.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_events"), arr.alias("__evs")
    )

    # bind the value array ONCE (no CSE across HOF lambda boundaries),
    # then fold: init = first value, aggregate over the tail
    def ewma(vals):
        tail = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
        return F.round(
            F.aggregate(
                tail,
                F.element_at(vals, 1),
                lambda acc, v: F.lit(alpha) * v + F.lit(1.0 - alpha) * acc,
            ),
            6,
        )

    vals_once = F.element_at(
        F.transform(
            F.array(F.transform(F.col("__evs"), lambda s: s[value_col])),
            lambda vals: ewma(vals),
        ),
        1,
    )
    return g.select(entity_col, "n_events", vals_once.alias("ewma_value"))
