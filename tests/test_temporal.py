"""As-of join variants: planted-timestamp semantics for backward,
forward, and nearest (the oracle gate covers the events-table scale;
these pin the edge semantics directly)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from lsd2_spark.operators.temporal import (
    asof_join_backward,
    asof_join_forward,
    asof_join_nearest,
)


def _t(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"lid": [1, 2, 3], "k": [1, 1, 1], "ts": [_t(10), _t(20), _t(5)]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"rid": [100, 200], "k": [1, 1], "ts": [_t(8), _t(30)], "v": [1.0, 2.0]})
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    out = (
        asof_join_backward(left, right, "k", "ts", ["lid"], ["rid"])
        .toPandas().set_index("lid")["asof_rid"]
    )
    assert out[1] == 100        # 10 -> latest at/before is 8
    assert out[2] == 100        # 20 -> 8 (30 is after)
    assert pd.isna(out[3])      # 5  -> nothing before


def test_asof_forward_semantics(spark):
    left, right = _frames(spark)
    out = (
        asof_join_forward(left, right, "k", "ts", ["lid"], ["rid"])
        .toPandas().set_index("lid")["asof_rid"]
    )
    assert out[1] == 200        # 10 -> earliest at/after is 30
    assert out[2] == 200
    assert out[3] == 100        # 5 -> 8


def test_asof_nearest_semantics_and_tie(spark):
    left, right = _frames(spark)
    out = (
        asof_join_nearest(left, right, "k", "ts", ["lid"], ["rid"])
        .toPandas().set_index("lid")["asof_rid"]
    )
    assert out[1] == 100        # |10-8|=2 < |30-10|=20
    assert out[2] == 200        # |20-8|=12 > |30-20|=10
    assert out[3] == 100        # only forward candidate distance 3 vs none back
    # exact tie prefers the backward row
    left2 = spark.createDataFrame(pd.DataFrame({"lid": [9], "k": [1], "ts": [_t(19)]}))
    tie = (
        asof_join_nearest(left2, _frames(spark)[1], "k", "ts", ["lid"], ["rid"])
        .toPandas().set_index("lid")["asof_rid"]
    )
    assert tie[9] == 100        # |19-8|=11 == |30-19|=11 -> backward wins
