from __future__ import annotations

import pytest

from game_library_enrichment_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4, app_name="tests")
    yield s
