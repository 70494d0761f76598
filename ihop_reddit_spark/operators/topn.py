"""Top-N / sort / limit operators (SURVEY §2.4 A1, §2.6 O1-O2).

Scale notes: ``orderBy(...).limit(n)`` plans as ``TakeOrderedAndProject`` — a
distributed top-k (per-partition heap + driver merge), NOT a global sort. This
is the only safe way to take a bounded head of a 100 TB aggregate; never
``collect`` then slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_n_by_count(
    df: DataFrame,
    group_col: str,
    n: int,
    count_col: str = "count",
) -> DataFrame:
    """A1 — group-count top-N with deterministic tie-break.

    ``groupBy(group_col).count().orderBy(count desc, group_col asc).limit(n)``
    — the reference's vocabulary query (``ihop/import_data.py:48-60``,
    ``get_top_n_counts``). The ``(count DESC, key ASC)`` compound order makes
    the cut deterministic under ties, which the duckdb oracle requires.

    Plan: partial (map-side) count → shuffle by key → final count →
    TakeOrderedAndProject. One shuffle, bounded result.
    """
    counted = df.groupBy(group_col).agg(F.count(F.lit(1)).alias(count_col))
    return counted.orderBy(F.col(count_col).desc(), F.col(group_col).asc()).limit(n)


def sort_multi(
    df: DataFrame, columns: list[str], ascending: list[bool], limit: int | None = None
) -> DataFrame:
    """O1/O2 — multi-key mixed-direction sort with optional limit.

    Reference: ``ihop/import_data.py:55-59``. With a limit this is distributed
    top-k; without one it is a full range-partitioned sort (avoid on huge data
    unless the sink needs global order).
    """
    cols = [
        F.col(c).asc() if asc else F.col(c).desc()
        for c, asc in zip(columns, ascending)
    ]
    out = df.orderBy(*cols)
    return out.limit(limit) if limit is not None else out
