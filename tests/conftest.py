"""Shared fixtures: one SparkSession per test session, sf0.001 paths."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from tmdb_movie_data_pipeline_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # default sf0.001 for speed; SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
    # mirrors the driver's correctness scale.
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMALL)
