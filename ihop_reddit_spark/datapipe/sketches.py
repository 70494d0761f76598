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

from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------------------------------
# Mergeable quantile sketches (fixed-grid histogram form)
# ---------------------------------------------------------------------------
def histogram_partials(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    quantize: int = 1000,
) -> DataFrame:
    """Per-key value HISTOGRAM partials — the quantile sibling of
    :func:`hll_partial_sketches`, and the same 100 TB pattern: build one
    support-bounded table per batch/day ONCE (``keys + (bucket, n)``
    rows, bucket = ``floor(value·quantize)``), persist it, and answer
    any later quantile/CDF question by MERGING histograms — a sum-merge
    (associative + commutative), never a second scan of the fact table.

    Unlike GK/KLL sketches, the fixed grid is deterministic and
    engine-portable: floor of an exact IEEE multiply, so the sketch —
    and every quantile read from it — is cross-engine hash-exact, and
    quantile error is bounded by the grid step (1/quantize), not by a
    rank-error guarantee. Callers pick ``quantize`` to bound the support
    (the module docstring's KS plan makes the same trade).

    NULL values are excluded (no NULL bucket; cross-engine NULL
    ordering).
    """
    v = F.floor(F.col(value_col) * quantize).cast("long").alias("bucket")
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, v)
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_merge(
    partials: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Union-merge histogram partials (e.g. daily tables) into one
    histogram per key grain: sum counts per (keys, bucket). Idempotent
    re-merge requires the usual care (don't merge the same partial
    twice) — counts are additive, not register-max."""
    return partials.groupBy(*keys, "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def histogram_quantiles(
    hist: DataFrame,
    keys: list[str],
    quantiles_permille: list[int],
    *,
    quantize: int = 1000,
) -> DataFrame:
    """Exact type-1 (lower) quantiles of the QUANTIZED distribution per
    key: for each q‰, the smallest bucket whose cumulative count reaches
    ``ceil(q·total/1000)``. Output ``keys + (q_permille, bucket,
    value)`` with ``value = bucket/quantize`` (exact IEEE divide).

    Plan: one cumulative window per key over the bucket-grain frame
    (support-sized, not fact-sized) crossed with the requested ranks —
    the window is partitioned by key, so no global sort.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        *keys,
        "bucket",
        "n",
        F.sum("n").over(w).alias("__cum"),
        F.sum("n").over(Window.partitionBy(*keys)).alias("__total"),
    )
    qs = F.explode(
        F.array(*[F.lit(q) for q in quantiles_permille])
    ).alias("q_permille")
    crossed = cum.select(*keys, "bucket", "__cum", "__total", qs)
    # rank threshold: ceil(q·total/1000) in pure non-negative integers
    # ((x + 999) div 1000 — Spark's div truncates toward zero, so the
    # usual -((-x) div d) negation trick would give floor here)
    thresh = F.expr("(q_permille * __total + 999) div 1000")
    hit = crossed.where(F.col("__cum") >= thresh)
    per_q = hit.groupBy(*keys, "q_permille").agg(
        F.min("bucket").alias("bucket")
    )
    return per_q.select(
        *keys,
        F.col("q_permille").cast("long").alias("q_permille"),
        F.col("bucket").cast("long").alias("bucket"),
        (F.col("bucket") / F.lit(float(quantize))).alias("value"),
    )


# ---------------------------------------------------------------------------
# Mergeable frequency sketches (count-min)
# ---------------------------------------------------------------------------
def _cm_bucket_rows(item: Column, width: int, depth: int) -> Column:
    """The CM hash family as an array of (d, w) structs — the ONE
    definition both the build side and the probe side must share:
    ``w_d(item) = int(md5('cm:' || d || ':' || item)[0:8hex]) mod
    width``. A divergence between the two sides would silently break
    the est ≥ true upper bound, so there is exactly one copy."""
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":", F.lit("cm"), F.lit(str(d)), item
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("w"),
            )
            for d in range(depth)
        ]
    )


def cm_partials(
    df: DataFrame,
    item_col: str,
    *,
    keys: list[str] | None = None,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch partials — the FREQUENCY pillar beside the HLL
    (distinct) and histogram (quantile) sketch tables, same 100 TB
    pattern: one ``keys + (d, w, n)`` table per batch, ``depth·width``
    rows per key grain regardless of item cardinality, sum-mergeable.

    Hash family is derandomized md5 (the engine's standard idiom):
    ``w_d(item) = int(md5('cm:' || d || ':' || item)[0:8hex]) mod
    width`` — deterministic and engine-portable, so the sketch AND every
    estimate read from it are cross-engine hash-exact (estimates are
    deterministic upper bounds: est ≥ true count, overcount ≤
    collisions per row; standard CM guarantees with ε ≈ e/width at
    confidence 1 − e^(−depth)).

    NULL items are excluded.
    """
    keys = keys or []
    rows = _cm_bucket_rows(F.col(item_col).cast("string"), width, depth)
    return (
        df.where(F.col(item_col).isNotNull())
        .select(*keys, F.explode(rows).alias("__dw"))
        .select(*keys, F.col("__dw.d").alias("d"), F.col("__dw.w").alias("w"))
        .groupBy(*keys, "d", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cm_merge(partials: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Sum-merge count-min partials (same additive contract as
    :func:`histogram_merge` — don't merge one partial twice)."""
    keys = keys or []
    return partials.groupBy(*keys, "d", "w").agg(
        F.sum("n").cast("long").alias("n")
    )


def cm_estimate(
    cm: DataFrame,
    probes: DataFrame,
    item_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for a probe item set: min over depths
    of the item's bucket counts (absent bucket ⇒ 0). Probes are
    typically a small frame; the sketch side is depth·width rows per
    grain — both sides stay tiny regardless of the original corpus, so
    the join is broadcast-able by AQE. Returns ``(item_col, est)``."""
    rows = _cm_bucket_rows(F.col(item_col).cast("string"), width, depth)
    probe_buckets = probes.select(
        F.col(item_col), F.explode(rows).alias("__dw")
    ).select(
        item_col, F.col("__dw.d").alias("d"), F.col("__dw.w").alias("w")
    )
    joined = probe_buckets.join(cm, ["d", "w"], "left").select(
        item_col, F.coalesce(F.col("n"), F.lit(0)).alias("__n")
    )
    return joined.groupBy(item_col).agg(
        F.min("__n").cast("long").alias("est")
    )
