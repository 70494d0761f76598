"""Event-time storage dispatch (functions/event_time.py): the same instants
stored as LONG nanoseconds and as parquet timestamp[us] must produce
identical epoch values through the accessors — the contract that broke
round 2 when the testdata writer changed physical types."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ihop_reddit_spark.functions.event_time import (
    ts_epoch_micros,
    ts_epoch_seconds,
    ts_event_time,
)

#: µs-grain instants (the cross-engine precision): epoch, sub-second
#: fractions, a second boundary, and a far-future value.
_INSTANTS_US = [0, 1, 999_999, 1_000_000, 1_700_000_123_456_789, 4_102_444_800_000_000]


@pytest.fixture(scope="module")
def storage_variants(spark, tmp_path_factory):
    """The same instants written two ways: LONG ns column and timestamp[us]."""
    base = tmp_path_factory.mktemp("ts_storage")
    long_path = os.path.join(str(base), "events_long_ns")
    us_path = os.path.join(str(base), "events_ts_us")

    pq.write_table(
        pa.table({"ts": pa.array([us * 1000 for us in _INSTANTS_US], pa.int64())}),
        os.path.join(long_path + ".parquet"),
    )
    pq.write_table(
        pa.table({"ts": pa.array(_INSTANTS_US, pa.timestamp("us"))}),
        os.path.join(us_path + ".parquet"),
    )
    return long_path + ".parquet", us_path + ".parquet"


def test_accessors_agree_across_storage_types(spark, storage_variants):
    long_path, us_path = storage_variants
    df_long = spark.read.parquet(long_path)
    df_us = spark.read.parquet(us_path)

    assert isinstance(df_long.schema["ts"].dataType, T.LongType)
    assert isinstance(
        df_us.schema["ts"].dataType, (T.TimestampType, T.TimestampNTZType)
    )

    for fn in (ts_epoch_seconds, ts_epoch_micros):
        a = sorted(r[0] for r in df_long.select(fn(df_long)).collect())
        b = sorted(r[0] for r in df_us.select(fn(df_us)).collect())
        assert a == b, fn.__name__

    # event_time: second-truncated TIMESTAMP, identical instants either way
    a = sorted(r[0] for r in df_long.select(ts_event_time(df_long)).collect())
    b = sorted(r[0] for r in df_us.select(ts_event_time(df_us)).collect())
    assert a == b


def test_epoch_values_are_exact(spark, storage_variants):
    _, us_path = storage_variants
    df = spark.read.parquet(us_path)
    secs = sorted(r[0] for r in df.select(ts_epoch_seconds(df)).collect())
    assert secs == sorted(us // 1_000_000 for us in _INSTANTS_US)
    micros = sorted(r[0] for r in df.select(ts_epoch_micros(df)).collect())
    assert micros == sorted(_INSTANTS_US)


def test_unsupported_storage_type_raises(spark):
    df = spark.createDataFrame([("not a timestamp",)], "ts string")
    with pytest.raises(TypeError, match="unsupported event-time storage"):
        df.select(ts_epoch_seconds(df))
