"""Scoped-persist ownership for operators that cache intermediates.

Several operators persist an intermediate that feeds multiple consumers in
the returned plan (e.g. the shingle stream on both sides of a similarity
self-join — measured: Catalyst gives zero ReusedExchange across aliased
self-joins, so without the persist the lineage recomputes per consumer).
The persist cannot be dropped before the caller's action, so the returned
DataFrame carries a handle to its cached dependencies instead:

* operators call :func:`register_scoped_persists` on their result;
* callers that keep the session alive call :func:`release_scoped_persists`
  once they have consumed the result (harnesses that run many queries can
  keep using ``spark.catalog.clearCache()`` — coarser, same effect).

The handle lives on the returned DataFrame OBJECT; deriving a new frame
from it (select/filter/...) does not carry the handle along — release from
the frame the operator returned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_scoped_persists"


def register_scoped_persists(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach persisted dependency frames to ``out`` for later release."""
    deps = list(getattr(out, _ATTR, []))
    deps.extend(cached)
    setattr(out, _ATTR, deps)
    return out


def release_scoped_persists(df: DataFrame) -> int:
    """Unpersist every cached dependency registered on ``df``; returns how
    many were released. Safe to call on frames without a handle."""
    deps = getattr(df, _ATTR, [])
    for c in deps:
        c.unpersist()
    setattr(df, _ATTR, [])
    return len(deps)
