"""Event-time accessors: the ONE place that knows how ``events.ts`` is stored.

The events table's physical timestamp encoding is a storage detail that has
legitimately varied across data generations: parquet TIMESTAMP(NANOS)
(which Spark, under ``spark.sql.legacy.parquet.nanosAsLong``, reads as LONG
nanoseconds) and parquet ``timestamp[us]`` (which Spark 4 reads as
TIMESTAMP_NTZ). Hard-coding either assumption breaks the moment the writer
changes — round 2 proved it: every ``ts div N`` site threw
``DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES`` when the data moved to micros.

The reference sidesteps this by declaring ``created_utc`` INTEGER in its
import schema (``ihop/import_data.py:33-36``); a general engine has to be at
least that robust against what the parquet actually contains, so every
event-time expression in the engine (query catalog, streaming, tests) goes
through these helpers, which dispatch on the READ schema:

* LONG          → integer ``div`` conversions (ns since epoch exceeds 2^53,
                  double division would lose precision — never ``/``).
* TIMESTAMP /   → ``unix_seconds`` / ``unix_micros`` on a cast to
  TIMESTAMP_NTZ   session-zoned TIMESTAMP. Sessions pin
                  ``spark.sql.session.timeZone=UTC`` (``session.py``), so an
                  NTZ wall-clock is interpreted as the same UTC instant
                  DuckDB's naive ``epoch(ts)`` produces — the oracle parity
                  contract.

CONTRACT: event time is post-1970 (``ts >= 0``). ``div``/``unix_seconds``
truncate toward zero while DuckDB ``floor()`` floors; the two agree only on
non-negative epochs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Nanoseconds storage (legacy LONG read) unit divisors.
_NS_PER_SECOND = 1_000_000_000
_NS_PER_MICRO = 1_000


def _ts_type(df: DataFrame, col: str) -> T.DataType:
    try:
        return df.schema[col].dataType
    except KeyError as exc:  # pragma: no cover - defensive
        raise KeyError(f"no event-time column {col!r} in {df.columns}") from exc


def _is_timestamp(dt: T.DataType) -> bool:
    return isinstance(dt, (T.TimestampType, T.TimestampNTZType))


def ts_epoch_seconds(df: DataFrame, col: str = "ts") -> Column:
    """Epoch seconds (LONG) for the event-time column, whatever its storage.

    Matches DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)`` for post-1970 data.
    """
    dt = _ts_type(df, col)
    if _is_timestamp(dt):
        return F.unix_seconds(F.col(col).cast("timestamp"))
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return F.expr(f"{col} div {_NS_PER_SECOND}")
    raise TypeError(f"unsupported event-time storage type for {col!r}: {dt}")


def ts_epoch_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch microseconds (LONG). µs is the cross-engine grain: DuckDB's
    parquet TIMESTAMP_NS read keeps only µs precision, and Spark's timestamp
    types are µs-native — so both storages floor to the same integer."""
    dt = _ts_type(df, col)
    if _is_timestamp(dt):
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return F.expr(f"{col} div {_NS_PER_MICRO}")
    raise TypeError(f"unsupported event-time storage type for {col!r}: {dt}")


def ts_event_time(df: DataFrame, col: str = "ts") -> Column:
    """Second-truncated TIMESTAMP for streaming event time.

    Truncation to seconds is deliberate: the streaming queries' batch oracles
    do second-floored epoch arithmetic (``floor(epoch(ts))``), so the stream
    and its oracle must share the second clock regardless of storage
    precision.
    """
    return F.timestamp_seconds(ts_epoch_seconds(df, col))
