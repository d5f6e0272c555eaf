import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import joint_entity_and_relation_extraction_spark  # noqa: F401  (BLAS env)
import pytest

from joint_entity_and_relation_extraction_spark.session import build_session

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    s = build_session(master="local[4]", app_name="jers-tests",
                      shuffle_partitions=8)
    yield s
    s.stop()
