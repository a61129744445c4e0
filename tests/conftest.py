from __future__ import annotations

import os

import pytest

from pulsar_topic_deduplicator_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pulsar_topic_deduplicator_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # default: fast smoke SF; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
    # to mirror the driver's correctness scale exactly
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)
