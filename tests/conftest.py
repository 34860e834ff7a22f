import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF001 = os.path.join(TESTDATA, "sf0.001")
SF01 = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from words_in_context_spark.session import get_spark

    s = get_spark(cores=8, app_name="wics-tests", shuffle_partitions=8)
    yield s
