"""Set operations (SURVEY §2.7, U1-U2).

The reference does these driver-side in pandas (``app.py:626-628``) or on
Python dict key-sets (``ihop/clustering.py:163-169``); here they are
distributed DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_dedup(left: DataFrame, right: DataFrame) -> DataFrame:
    """U1 — union by name + exact dedup (``pd.concat(...).drop_duplicates()``
    at ``app.py:626-628``). ``dropDuplicates`` is a hash aggregate on all
    columns — one shuffle; prefer key-scoped dedup when a key exists.
    """
    return left.unionByName(right).dropDuplicates()


def key_alignment(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    fill: dict | None = None,
) -> DataFrame:
    """U2 — align two keyed tables on the intersection (inner) or union
    (full_outer) of their key sets, with missing-side fill values.

    Reference: cluster-comparison universes ``keys() & keys()`` / ``|`` with
    missing cluster id −1 (``ihop/clustering.py:40-42, 163-175``).
    """
    joined = left.join(right, key, how)
    if fill:
        joined = joined.na.fill(fill)
    return joined
