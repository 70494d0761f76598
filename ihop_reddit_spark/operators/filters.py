"""Row-filter operators (SURVEY §2.2, P2-P5).

All of these are plain Catalyst predicates: they push down to the parquet/JSON
scan, stay inside WholeStageCodegen, and never shuffle. That is the whole
scale story for this module — keep filters declarative and adjacent to the
scan, exactly like the reference does (``ihop/import_data.py:74-114``).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_by_regex(
    df: DataFrame, column: str, pattern: str, keep_matches: bool = False
) -> DataFrame:
    """Keep or drop rows where ``column`` matches a Java regex (P2).

    Reference: ``ihop/import_data.py:74-87`` (``remove_rows_by_regex_match``,
    default drops user-page subreddits ``^u_.*``).
    """
    matches = F.col(column).rlike(pattern)
    return df.where(matches if keep_matches else ~matches)


def filter_not_equal(df: DataFrame, column: str, value) -> DataFrame:
    """Drop rows where ``column == value`` (P3) — e.g. deleted authors.

    Reference: ``ihop/import_data.py:90-97`` (``remove_deleted_authors``).
    NULLs are dropped too (comparison yields NULL → row filtered), matching
    the reference's behavior on missing authors.
    """
    return df.where(F.col(column) != F.lit(value))


def filter_not_in(df: DataFrame, column: str, values: Iterable) -> DataFrame:
    """Drop rows whose ``column`` is in ``values`` (P4, negated IN-list).

    Reference: ``ihop/import_data.py:100-114`` (``remove_deleted_text``,
    sentinels ``[removed]``/``[deleted]``).
    """
    return df.where(~F.col(column).isin(list(values)))


def filter_in(df: DataFrame, column: str, values: Iterable) -> DataFrame:
    """Keep rows whose ``column`` is in ``values`` (P10's Spark form)."""
    return df.where(F.col(column).isin(list(values)))


def filter_open_range(
    df: DataFrame,
    column: str | Column,
    lower=None,
    upper=None,
) -> DataFrame:
    """Exclusive range predicate with optional bounds (P5).

    Reference: ``ihop/import_data.py:343-366`` (``filter_by_time_between``,
    ``min < col < max`` each side optional, both exclusive), reused by
    ``ihop/text_processing.py:204-206``.
    """
    col = F.col(column) if isinstance(column, str) else column
    if lower is not None:
        df = df.where(col > F.lit(lower))
    if upper is not None:
        df = df.where(col < F.lit(upper))
    return df
