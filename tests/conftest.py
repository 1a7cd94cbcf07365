from __future__ import annotations

import pytest

from flnr_wins_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="flnr-wins-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
