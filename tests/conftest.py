import os

import pytest

from flink_window_dgim_traffic_spark.session import get_spark, table
from flink_window_dgim_traffic_spark.streaming.stateful_dgim import (
    enable_tws_runtime,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# must run BEFORE any SparkSession exists: Python workers inherit
# PYTHONPATH through the JVM, so the protobuf fallback path has to be
# in the environment when the JVM starts for the TWS state server to
# import google.protobuf worker-side
enable_tws_runtime()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    return table(spark, sf_dir, "events")
