from __future__ import annotations

import pytest

from fantasy_premier_league_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("fpl-spark-tests")
    yield spark
