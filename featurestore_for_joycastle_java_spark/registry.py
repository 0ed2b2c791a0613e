"""Query/oracle registry — the driver contract's backbone.

Every implemented operator registers a named query ``(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) a DuckDB oracle string. The driver
runs both sides at sf0.01 and hash-compares; ``__spark_entry__.py`` just
re-exports these dicts.

Naming rule (driver compares columns sorted by NAME): every computed or
aggregate column is aliased identically in the Spark code and the oracle
SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Queries excluded from the sf0.1 bench (e.g. quadratic brute-force
#: baselines kept only as correctness oracles for their scalable variants).
BENCH_SKIP: set[str] = set()

#: Catalog modules; each registers its queries at import time.
#:
#: ORDER MATTERS for the driver: its correctness file records the first 50
#: registered queries only. Policy (r4+): least-recently-driver-verified
#: rotation — each round leads with the new round module, then the modules
#: whose latest driver row is oldest, so no query's newest driver row ages
#: more than a couple of rounds. r3's window covered round3..scalars;
#: r4's actual window = round4 (grew to 24 queries in-round: every new r4
#: surface gets a driver row) + asof (6) + ingest (4) + the head of
#: relational. r5's window (this order) = round5 (7) + round2 (6) +
#: streaming (7) + multimodal (4) + training (6) + extras (10) +
#: advanced (10) = 50 — exactly the 43 queries whose latest driver row
#: was r2, plus the new r5 surface. r6 should lead with round6, then
#: round5b (5) + round5c (24) — the r5 continuation additions with NO
#: driver row yet — then fill the remainder from the then-oldest
#: modules (round4/asof/ingest/relational, last driver rows r4, and
#: round3/tpch3/tpch/text/dedup/similarity/windows/scalars, last driver
#: rows r3). r6 did NOT rotate (stall — window re-ran r5's 50), so r7
#: leads with the never-driver-checked set: round5b (5) + round5c (35)
#: + round5d (8) = 48, then round7 (new r7 surface; its head fills the
#: window to 50), then round5e/5f/5g/5h + the round7 tail — the
#: remaining never-checked queries, queued first for r8 — then the
#: modules by driver-row age (r4 rows: round4/asof/ingest/relational;
#: r3 rows: round3..scalars; r6 rows last: round5/round2/streaming/
#: multimodal/training/extras/advanced). Everything outside the window
#: stays protected by tests/test_oracle_parity.py and the full
#: tools/driver_sim.py sweep (215/215 green at sf0.01 AND sf0.1 —
#: SIM_r*.json).
#: r8 rotation (EXECUTED at round-8 open): round5e (8) + round5f (6) +
#: round5g (3) + round5h (3) = 20 lead, then round7 — whose two
#: r7-driver-verified queries (dedup_incremental_batch, dedup_semdedup)
#: were moved to register LAST within the module — contributes its 30
#: never-checked queries as window slots 21-50. The r8 window is thus
#: exactly the 50 queries that have never had a driver CORRECTNESS row
#: outside round7b, clearing the pre-round7b debt entirely.
#: r9 rotation (EXECUTED at round-9 open): round7b moved to the head.
#: It registers 56 queries (NOT the stale 28 a previous comment
#: claimed), so the r9 window = its first 50 in registration order —
#: exactly the 50 production queries, because the six tail
#: registrations (text_zipf_fit + the five bench=False measurement
#: harnesses) were split into catalog/round7b_tail.py, which imports
#: immediately after and keeps the global order byte-identical.
#: r10 rotation (EXECUTED at round-10 open): the round7b tail (6) +
#: the then-oldest driver rows — tpch3 (12) + tpch (5) + asof (6) +
#: ingest (4) + round4 head (17) = 50, exactly the staged plan. Next:
#: the r11 window leads with round9 + the r3-vintage
#: round3/text/dedup/similarity/windows/scalars + r4-vintage
#: relational (1+6+6+7+2+5+5+18 = 50), pinned below and in
#: tests/test_survey_registry.py::test_r11_window_arithmetic_holds.
_CATALOG_MODULES = [
    # r10 rotation EXECUTED (the pure reorder staged at r9 close): the
    # round7b tail 6 + the then-oldest driver rows — the r3-vintage
    # TPC-H refresh (tpch3 12 + tpch 5) + r4-vintage asof (6) +
    # ingest (4) + round4's first 17 = exactly the driver's 50-row
    # window, pinned by tests/test_survey_registry.py::
    # test_r10_window_is_tail_plus_stale_modules.
    "round7b_tail",
    "tpch3",
    "tpch",
    "asof",
    "ingest",
    "round4",
    # r9-window queries (round7b's 50 production registrations) drop
    # below the window, freshly driver-verified last round.
    "round7b",
    "round5e",
    "round5f",
    "round5g",
    "round5h",
    "round7",
    "round5b",
    "round5c",
    "round5d",
    # r11 window (staged — pinned by test_r11_window_arithmetic_holds):
    # round9 (1) + the r3-vintage round3 (6) + text (6) + dedup (7) +
    # similarity (2) + windows (5) + scalars (5) + r4-vintage
    # relational (18) = exactly 50. The r11 move is again a pure
    # reorder: [round9, round3, text, dedup, similarity, windows,
    # scalars, relational] to the head. round4's tail 4 (registrations
    # 18-21) then join the r6-vintage round5/round2/streaming/
    # multimodal/training/extras/advanced modules as the r12 pool.
    "relational",
    "round3",
    "text",
    "dedup",
    "similarity",
    "windows",
    "scalars",
    "round5",
    "round2",
    "streaming",
    "multimodal",
    "training",
    "extras",
    "advanced",
    # r9 addition — earns its driver row in the r11 window above.
    "round9",
    # r10 additions (14) — register last so the staged r11 window is not
    # displaced (VERDICT r9 ask #8); they join round4's tail 4 and the
    # r6-vintage modules in the r12 pool.
    #
    # r12 window (staged — pinned by test_r12_window_arithmetic_holds):
    # round10 (14) + round4 (21: the r4-vintage tail 4 plus a refresh of
    # the 17 r10-window rows) + r6-vintage round5 (7) + round2 (6) +
    # multimodal's first 2 = exactly 50 (partial-module head, the
    # round4[:17] precedent). The r12 move is a pure reorder:
    # [round10, round4, round5, round2, multimodal] to the head.
    # Multimodal's tail 2 and the remaining r6-vintage modules
    # (streaming 7 + training 6 + extras 10 + advanced 10) lead the r13
    # pool.
    "round10",
    # r10 continuation batch (10) — registers last; joins the r13 pool
    # behind multimodal's tail 2 and the r6-vintage modules (the staged
    # r11/r12 windows above are unaffected: both are pure reorders of
    # modules that register BEFORE this one).
    "round10b",
    # r10 continuation batch 2 (7) — same staging rules as round10b.
    #
    # r13 window (staged — pinned by test_r13_window_arithmetic_holds):
    # streaming (7) + training (6) + extras (10) + advanced (10) +
    # round10b (10) + round10c (7) = exactly 50, no partial-module head.
    # The r13 move is a pure reorder: [streaming, training, extras,
    # advanced, round10b, round10c] to the head. Multimodal's tail 2
    # (r12 takes its first 2) then lead the r14 pool with the
    # then-oldest rows (supersedes the r12 comment above, which slotted
    # them for r13 before the round-10b/10c additions existed).
    "round10c",
    # r10 continuation batch 3 (3) — registers last; r14 pool (the r13
    # window above is already exactly 50 without it).
    "round10d",
    # r10 continuation batch 4 (4) — registers last; r14 pool.
    "round10e",
    # r10 continuation batch 5 (3) — registers last; r14 pool.
    "round10f",
    # r10 continuation batch 6 (1, streaming) — registers last; r14 pool.
    "round10g",
]


def query(
    name: str, oracle: str | None = None, bench: bool = True
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the equivalent DuckDB
    SQL (omit only for genuinely non-SQL-expressible ops — the driver then
    records a weaker rows-only check). ``bench=False`` keeps a query out of
    the sf0.1 benchmark suite."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if not bench:
            BENCH_SKIP.add(name)
        return fn

    return deco


def load_catalog() -> None:
    """Import every catalog module (idempotent)."""
    for mod in _CATALOG_MODULES:
        try:
            importlib.import_module(
                f"featurestore_for_joycastle_java_spark.catalog.{mod}"
            )
        except ModuleNotFoundError as e:
            # Catalog modules are added incrementally; only swallow a miss of
            # the module itself, not of its imports.
            if mod not in str(e):
                raise
