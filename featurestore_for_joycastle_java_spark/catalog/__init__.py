"""Named queries + DuckDB oracles, one module per operator area."""
