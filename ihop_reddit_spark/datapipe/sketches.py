"""Mergeable distinct-count sketch tables (Apache DataSketches HLL via
Spark 4's native ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

The 100 TB pattern this enables: materialize per-partition sketches ONCE
(e.g. one row per ``(event_type, day)`` with a binary sketch column —
a few KB per row regardless of input size), persist them as an ordinary
parquet table, and answer any coarser distinct-count rollup later by
merging sketches — no second scan of the fact table, and the merge input
is dimension-sized, not fact-sized. ``hll_union_agg`` is a register-max
merge, so partial sketches built per partition/day/batch union to exactly
the sketch a single pass would have built (associative + commutative +
idempotent) — re-processing a day and re-unioning is safe (idempotent
upsert semantics for free).

Reference parity: the reference computes exact ``nunique`` driver-side
(ihop/import_data.py corpus stats); this tier is the engine's scale
extension alongside ``approx_count_distinct`` (A4) — the sketch TABLE is
the new capability: approx_count_distinct returns a number, this returns
a reusable, mergeable artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: lgConfigK = 12 → 4096 registers, relative standard error ≈ 1.04/64 ≈
#: 1.6%; estimates are exact until the sketch leaves list/set mode.
DEFAULT_LG_K = 12


def hll_partial_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One binary HLL sketch row per ``keys`` group over ``value_col``.

    One shuffle on ``keys`` with map-side partial sketching (the agg is
    a declared Spark aggregate, so partials combine on the map side —
    shuffle payload is sketches, not raw values). The result is a
    persistable sketch table.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, lg_k).alias(sketch_col)
    )


def hll_rollup(
    sketch_df: DataFrame,
    group_keys: list[str],
    *,
    sketch_col: str = "sketch",
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Merge partial sketches up to ``group_keys`` and estimate.

    Input is the (dimension-sized) sketch table — the fact table is never
    rescanned. Union is register-max: associative/commutative/idempotent.
    """
    return sketch_df.groupBy(*group_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col))
        .alias(estimate_col)
    )
