from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("LSD2_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from lsd2_spark.session import get_spark

    s = get_spark(app_name="lsd2_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
