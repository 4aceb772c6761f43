from __future__ import annotations

import pytest

from distributed_vector_search_system_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dvss-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    yield s
    s.stop()


SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
