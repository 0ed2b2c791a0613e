"""Driver-style oracle parity: every registered query with an oracle must
match DuckDB exactly (row count + columns + order-insensitive values).

This is the local mirror of the driver's CORRECTNESS gate; it runs at
sf0.001 for speed (driver runs sf0.01). New catalog queries are picked up
automatically via parametrization over the registry.
"""

from __future__ import annotations

import pytest

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import ORACLES, QUERIES
from tests.oracle import compare


def test_registry_nonempty():
    assert QUERIES, "no queries registered"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # materializes the plan


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
