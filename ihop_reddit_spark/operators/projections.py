"""Projection / derived-column operators (SURVEY §2.2, P1, P6-P9).

Pure narrow transformations — no shuffle, fully codegen'd. Column pruning from
a ``select`` reaches the parquet scan via Catalyst (check ``ReadSchema`` in
``.explain``), so projecting early is free *and* reduces scan bytes at scale.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, columns: Iterable[str | Column]) -> DataFrame:
    """P1 — column projection. Reference: ``ihop/text_processing.py:221-230``."""
    return df.select(*columns)


def with_prefixed_id(
    df: DataFrame, column: str, prefix: str, output_col: str
) -> DataFrame:
    """P6 — derived column ``output_col = prefix + column`` (string concat).

    Reference: ``ihop/import_data.py:300-313`` (``fullname_id = 't3_' + id``
    to build the submissions-side join key for comments' ``link_id``).
    """
    return df.withColumn(output_col, F.concat_ws("", F.lit(prefix), F.col(column)))


def with_difference(
    df: DataFrame, left: str | Column, right: str | Column, output_col: str
) -> DataFrame:
    """P7 — derived arithmetic column ``left - right``.

    Reference: ``ihop/import_data.py:404-417`` (``time_to_comment_in_seconds =
    comments_created_utc - created_utc``; epoch-seconds integer arithmetic).
    """
    lcol = F.col(left) if isinstance(left, str) else left
    rcol = F.col(right) if isinstance(right, str) else right
    return df.withColumn(output_col, lcol - rcol)


def rename_with_prefix(
    df: DataFrame, columns: Iterable[str], prefix: str
) -> DataFrame:
    """P8 — bulk rename ``c -> prefix + c`` for the given columns.

    Reference: ``ihop/import_data.py:325-340`` (comment columns prefixed
    ``comments_`` before the submissions join to avoid name collisions).
    Implemented as a single ``toDF`` (one projection, not N).
    """
    targets = set(columns)
    new_names = [f"{prefix}{c}" if c in targets else c for c in df.columns]
    return df.toDF(*new_names)


def drop_columns(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """P9 — drop columns. Reference: ``ihop/import_data.py:272, 467``."""
    return df.drop(*columns)


def recategorize(
    df: DataFrame,
    column: str,
    keep_values: Iterable,
    output_col: str,
    other_label: str = "other",
) -> DataFrame:
    """E4 — CASE WHEN recategorization: keep selected values, else 'other'.

    Reference: ``ihop/visualizations.py:70-74`` (``np.where(isin)`` driver-side
    in the Dash app) → Spark-native ``F.when(col.isin(...))``.
    """
    col = F.col(column)
    return df.withColumn(
        output_col,
        F.when(col.isin(list(keep_values)), col).otherwise(F.lit(other_label)),
    )
