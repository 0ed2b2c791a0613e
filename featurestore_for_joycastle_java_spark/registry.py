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
#: registered queries only. Rounds 1+2 verified 100/116 queries (zero
#: failures); those stay protected by tests/test_oracle_parity.py. Round 3
#: rotates the last driver-unverified queries to the front — all of tpch3
#: (12), tpch (tpch_q19_disjunct), text (bpe/tfidf/fingerprint) — plus the
#: new round3 module (SRP-LSH, SimHash-md5, winnowing) and dedup, whose
#: minhash/pipeline LSH queries gained exact oracles after their stale r1
#: rows-only verdicts were recorded.
_CATALOG_MODULES = [
    "round3",
    "tpch3",
    "tpch",
    "text",
    "dedup",
    "similarity",
    "windows",
    "scalars",
    "asof",
    "ingest",
    "relational",
    "round2",
    "streaming",
    "multimodal",
    "training",
    "extras",
    "advanced",
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
