"""asof_join / range_join_bucketed unit tests: inclusive-backward
semantics, tie-breaks, no-match nulls, and bucketed-vs-naive parity."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


SCHEMA = "user_id long, ts timestamp, event_id long, value double"


def test_asof_inclusive_backward(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100, 1.0), (1, _ts(20), 101, 2.0), (1, _ts(5), 102, 3.0)],
        SCHEMA,
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 200, 10.0), (1, _ts(15), 201, 20.0)], SCHEMA
    )
    out = {
        r["event_id"]: (r["ts_asof"], r["value_asof"])
        for r in asof_join(
            left, right, on=["user_id"], right_cols=("value",), tiebreak_col="event_id"
        ).collect()
    }
    # equal-ts right row matches (inclusive)
    assert out[100] == (_ts(10), 10.0)
    # latest at-or-before 20 is ts=15
    assert out[101] == (_ts(15), 20.0)
    # nothing at-or-before 5 -> nulls
    assert out[102] == (None, None)


def test_asof_equal_ts_tiebreak(spark):
    left = spark.createDataFrame([(1, _ts(10), 100, 1.0)], SCHEMA)
    right = spark.createDataFrame(
        [(1, _ts(10), 200, 10.0), (1, _ts(10), 201, 20.0)], SCHEMA
    )
    [row] = asof_join(
        left, right, on=["user_id"], right_cols=("value",), tiebreak_col="event_id"
    ).collect()
    # greatest tiebreak id wins among equal timestamps
    assert row["value_asof"] == 20.0


def test_asof_keys_isolated(spark):
    left = spark.createDataFrame([(1, _ts(10), 100, 1.0)], SCHEMA)
    right = spark.createDataFrame([(2, _ts(5), 200, 10.0)], SCHEMA)
    [row] = asof_join(left, right, on=["user_id"], right_cols=("value",)).collect()
    assert row["value_asof"] is None  # other user's rows never match


@pytest.mark.parametrize("band", [7.0, 30.0])
def test_range_join_matches_naive(spark, band):
    import random

    rng = random.Random(7)
    rows = [
        (rng.randrange(3), _ts(rng.uniform(0, 200)), i, float(i))
        for i in range(120)
    ]
    left = spark.createDataFrame(rows[:60], SCHEMA)
    right = spark.createDataFrame(rows[60:], SCHEMA)

    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in range_join_bucketed(
            left, right, on=["user_id"], band_seconds=band
        ).collect()
    }
    naive = {
        (l[2], r[2])
        for l in rows[:60]
        for r in rows[60:]
        if l[0] == r[0] and abs((l[1] - r[1]).total_seconds()) <= band
    }
    assert got == naive


def test_range_join_band_edges(spark):
    left = spark.createDataFrame([(1, _ts(100), 1, 0.0)], SCHEMA)
    right = spark.createDataFrame(
        [(1, _ts(95), 2, 0.0), (1, _ts(105), 3, 0.0), (1, _ts(105.000001), 4, 0.0)],
        SCHEMA,
    )
    got = {
        r["r_event_id"]
        for r in range_join_bucketed(
            left, right, on=["user_id"], band_seconds=5.0
        ).collect()
    }
    # exactly-at-band matches both sides; 1us past does not
    assert got == {2, 3}
