"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (the driver gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from lsd2_spark.queries import all_oracles, all_queries
from tests.oracle_harness import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def _oracle_cases():
    oracles = all_oracles()
    return sorted(oracles.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, duck, name):
    fn = all_queries()[name]
    sql = all_oracles()[name]
    df = fn(spark, SF_DIR)
    assert len(df.toPandas()) >= 0  # plan executes
    compare(fn(spark, SF_DIR), duck, sql, name)


def test_every_query_runs(spark):
    for name, fn in all_queries().items():
        df = fn(spark, SF_DIR)
        df.limit(1).collect()
