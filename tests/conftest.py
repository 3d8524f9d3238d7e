import os
import sys

import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_TESTS_DIR)
sys.path.insert(0, _REPO_DIR)

# Executor python workers are separate processes: they need the repo and
# tests dir on PYTHONPATH to unpickle closures defined in test modules
# (e.g. foreachPartition fakes).  Must be set before the JVM starts.
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_REPO_DIR, _TESTS_DIR, os.environ.get("PYTHONPATH", "")]
)

FIXTURES = os.path.join(_TESTS_DIR, "fixtures")
SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from grower_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    spark = get_spark("grower-spark-tests", cpus=cpus)
    yield spark
    spark.stop()
