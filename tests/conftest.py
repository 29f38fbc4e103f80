from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")


@pytest.fixture(scope="session")
def spark():
    from crawl4ai_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    s = get_spark("crawl4ai_spark_tests", cpus=cpus, shuffle_partitions=4)
    yield s
