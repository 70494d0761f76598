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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 100,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``df.sampleBy`` — E2's stratified
    sampling surface, ``ihop/annotation_task_export.py:106-190``, made an
    explicit operator).

    Deterministic for a fixed seed AND fixed partitioning of the input —
    reproducible within Spark, NOT across engines (exports that must be
    cross-engine-stable use content-addressed md5 choice instead, see
    ``ml/exports.py``). Strata missing from ``fractions`` are dropped
    (sampleBy semantics).
    """
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)
