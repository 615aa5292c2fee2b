"""NTZ-safe epoch helpers: the two dtype branches must agree bit-for-bit
under a UTC session — including PRE-EPOCH sub-unit timestamps, where
unix_millis/unix_seconds FLOOR while a naive timestamp_diff would
truncate toward zero (r5 review, confirmed divergence before the fix)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fetchez_spark.functions.epoch import epoch_ms, epoch_s, epoch_us

CASES = [
    dt.datetime(1969, 12, 31, 23, 59, 59, 500000),  # pre-epoch, sub-second
    dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
    dt.datetime(1970, 1, 1, 0, 0, 0, 0),
    dt.datetime(1970, 1, 1, 0, 0, 0, 1),
    dt.datetime(1969, 6, 15, 3, 4, 5, 123456),
    dt.datetime(2024, 7, 1, 12, 34, 56, 789012),
]


@pytest.mark.parametrize("fn", [epoch_us, epoch_ms, epoch_s])
def test_ltz_and_ntz_branches_agree_bit_for_bit(spark, fn):
    ltz = spark.createDataFrame(
        [(t.replace(tzinfo=dt.timezone.utc),) for t in CASES], "ts timestamp"
    )
    ntz = spark.createDataFrame([(t,) for t in CASES], "ts timestamp_ntz")
    a = [r[0] for r in ltz.select(fn(ltz, "ts").alias("v")).collect()]
    b = [r[0] for r in ntz.select(fn(ntz, "ts").alias("v")).collect()]
    assert a == b, (fn.__name__, list(zip(CASES, a, b)))


def test_floor_semantics_match_unix_functions(spark):
    """The LTZ branch IS unix_*; assert the shared expectation explicitly
    so a Spark behavior change is caught loudly."""
    t = dt.datetime(1969, 12, 31, 23, 59, 59, 500000, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame([(t,)], "ts timestamp")
    row = df.select(
        F.unix_seconds("ts").alias("s"), F.unix_millis("ts").alias("ms")
    ).collect()[0]
    assert row["s"] == -1 and row["ms"] == -500  # floor, not truncate
    ntz = spark.createDataFrame(
        [(dt.datetime(1969, 12, 31, 23, 59, 59, 500000),)], "ts timestamp_ntz"
    )
    got = ntz.select(
        epoch_s(ntz, "ts").alias("s"), epoch_ms(ntz, "ts").alias("ms")
    ).collect()[0]
    assert got["s"] == -1 and got["ms"] == -500
