from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from bids2table_spark.session import get_spark

    s = get_spark(app="b2t-tests", master="local[4]", shuffle_partitions=8)
    yield s
