"""Local stand-in for the driver's DuckDB-oracle comparison.

Mirrors the driver contract: run the Spark query and the oracle SQL on the
same parquet tables, then compare row count, column names, and an
order-insensitive value comparison with columns sorted by name. Exact string
equality on rendered values — if a query only passes with a tolerance, the
query (or its oracle) must round explicitly instead.
"""

from __future__ import annotations

import math

import duckdb

from featurestore_for_joycastle_java_spark.schemas import TABLE_NAMES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _render(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        # repr of float is exact round-trip; both engines produce IEEE doubles
        return repr(v)
    return str(v)


def _canon(df_pandas) -> tuple[int, list[str], list[tuple]]:
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_render(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return len(rows), cols, sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result (driver-style)."""
    import pandas as pd  # noqa: F401  (toPandas requirement)

    mine = spark_df.toPandas()
    theirs = duckdb_run(oracle_sql, sf_dir)
    n1, c1, r1 = _canon(mine)
    n2, c2, r2 = _canon(theirs)
    assert c1 == c2, f"column mismatch: spark={c1} oracle={c2}"
    assert n1 == n2, f"row count mismatch: spark={n1} oracle={n2}"
    if r1 != r2:
        diffs = [(a, b) for a, b in zip(r1, r2) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
