import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from web_crawler_spark.session import get_spark

    # small local session for tests; shuffle partitions low to keep rounds fast
    s = get_spark(app_name="wcs-tests", master="local[8]", shuffle_partitions=8)
    yield s
