import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphgen_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        app_name="graphgen_spark_tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "2000"},
    )
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
