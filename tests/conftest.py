from __future__ import annotations

import pytest

from paragrapher_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="paragrapher-spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
