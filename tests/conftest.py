"""Shared fixtures: one local SparkSession per test run, fixture dirs."""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from featurestore_for_joycastle_java_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="featurestore-tests",
        master="local[8]",
        shuffle_partitions=8,
        # saveAsTable targets (bucketed-join tests) land in a tempdir,
        # never the repo
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="fs_warehouse_")
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    # override with SPARK_GRAFT_ORACLE_SF_DIR to run parity at sf0.01
    return SF_ORACLE
