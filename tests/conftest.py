import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("hbsir-old-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
