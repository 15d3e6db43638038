import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture(scope="session")
def spark():
    from elevation_service_spark.session import get_spark
    s = get_spark(app="pytest", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")),
                  shuffle_partitions=8)
    yield s
