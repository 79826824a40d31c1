import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_volume_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # faulthandler ON for tests (default off for benches): the
    # inherited flaky "Python worker exited unexpectedly" crash lives
    # in the suite, and the next occurrence should print its native
    # stack (see OPTIMIZATION_r14.md "Inherited state").
    os.environ.setdefault("SPARK_GRAFT_FAULTHANDLER", "true")
    spark = get_spark(app_name="cvs-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
