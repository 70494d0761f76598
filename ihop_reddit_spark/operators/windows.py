"""Window-function operators (SURVEY §2.5, W1 + per-group top-k).

The reference's only window is a ``percent_rank`` over a GLOBAL order
(``Window.partitionBy()`` with no keys, ``ihop/import_data.py:219-221``) —
a single-partition sort of every user, the one scalability cliff in its
relational layer (SURVEY §4). This module provides:

* :func:`exclude_top_percent` — exact percent_rank semantics computed
  scalably: aggregate to DISTINCT metric values (cardinality ≪ rows), compute
  the cumulative rank on that tiny table, broadcast-join the threshold back.
  No global sort of the data ever happens.
* :func:`top_k_per_group` — row_number-based per-group head (A10/O6/E2),
  partitioned by the group key so it scales with normal shuffle parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclude_top_percent(
    df: DataFrame,
    metric_col: str,
    exclude_fraction: float,
    keep_boundary: bool = True,
) -> DataFrame:
    """W1 — drop rows whose ``metric_col`` falls in the top ``exclude_fraction``
    of the GLOBAL percent_rank distribution (heavy-user exclusion).

    Exact semantics of the reference (``ihop/import_data.py:197-225``):
    ``percent_rank() OVER (ORDER BY metric)``, keep rows with
    ``pr <= 1 - exclude_fraction``. percent_rank = (min_rank − 1)/(N − 1) =
    (#rows with metric strictly less)/(N − 1), so it is computable from the
    value histogram alone:

    1. ``groupBy(metric)`` → per-value frequency (one shuffle; output is the
       number of DISTINCT metric values — e.g. distinct activity counts, a few
       thousand rows even for billions of users).
    2. Running sum over the value-ordered histogram → #rows strictly below
       each value. Single-partition window, but over the tiny histogram only.
    3. Broadcast-join the per-value percent_rank back and filter.

    Unlike the reference (which leaks its helper ``percentile`` column — the
    ``drop`` result is discarded at ``ihop/import_data.py:224``), the output
    schema equals the input schema.
    """
    if not 0 <= exclude_fraction < 1:
        raise ValueError("exclude_fraction must be in [0, 1)")
    threshold = 1.0 - exclude_fraction
    hist = df.groupBy(metric_col).agg(F.count(F.lit(1)).alias("__freq"))
    w_below = Window.orderBy(metric_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = hist.select(
        F.col(metric_col),
        F.coalesce(F.sum("__freq").over(w_below), F.lit(0)).alias("__below"),
        F.sum("__freq").over(w_all).alias("__n"),
    )
    pr = F.when(F.col("__n") == 1, F.lit(0.0)).otherwise(
        F.col("__below") / (F.col("__n") - 1)
    )
    cmp = pr <= F.lit(threshold) if keep_boundary else pr < F.lit(threshold)
    keep_values = ranked.where(cmp).select(metric_col)
    # re-select to keep the input column ORDER (a semi-join moves the join
    # key first; this operator promises output schema == input schema)
    return df.join(F.broadcast(keep_values), metric_col, "left_semi").select(
        df.columns
    )


def percent_rank_exact(df: DataFrame, metric_col: str, out_col: str = "percent_rank") -> DataFrame:
    """Reference-literal W1 (single-partition window) — for tests/small data.

    Kept as the semantic spec that :func:`exclude_top_percent` must match;
    do NOT use on large inputs (empty ``partitionBy`` ⇒ one-partition sort).
    """
    w = Window.partitionBy().orderBy(metric_col)
    return df.withColumn(out_col, F.percent_rank().over(w))


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = True,
) -> DataFrame:
    """A10/O6/E2 — deterministic per-group top-k via row_number.

    ``order_cols`` are Column expressions (include a unique tie-break as the
    last key for determinism). Partitioned by the group key — scales with
    shuffle parallelism; skewed groups are bounded by k after the window.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def top_k_per_group_salted(
    df: DataFrame,
    group_col: str,
    order_struct: list,
    k: int,
    n_salts: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Skew-hardened :func:`top_k_per_group` — the same two-phase salted
    shape as ``aggregates.grouped_concat_salted``, for the case where one
    MEGA-GROUP (a domain holding 10% of a crawl, a bot user) would make
    the plain window sort billions of rows in one task.

    1. ``groupBy(key, salt)`` with salt = hash(order keys) mod n: each
       partial keeps only its own top-k via
       ``slice(sort_array(collect_list(struct(order...))), 1, k)`` —
       partial state is bounded at k rows per (key, salt), and map-side
       combine applies;
    2. ``groupBy(key)`` merges the ≤ n·k surviving rows and re-ranks.

    ``order_struct`` must be the ASCENDING sort key columns (include a
    unique tie-break last); rows outside the struct are not carried —
    callers project what they need into it. Returns one row per
    surviving (group, rank) with the struct fields unpacked, exactly
    the columns ``top_k_per_group`` would keep. Equivalence against the
    window path is property-tested.
    """
    skey = F.struct(*order_struct)
    salt = F.pmod(F.xxhash64(*order_struct), F.lit(n_salts))
    partial = (
        df.select(F.col(group_col), salt.alias("__salt"), skey.alias("__s"))
        .groupBy(group_col, "__salt")
        .agg(
            F.slice(F.sort_array(F.collect_list("__s")), 1, k).alias("__top")
        )
    )
    merged = (
        partial.groupBy(group_col)
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("__top"))), 1, k
            ).alias("__top")
        )
        .select(group_col, F.posexplode("__top").alias("__r", "__s"))
    )
    out = merged.select(
        group_col,
        (F.col("__r") + 1).alias(rank_col),
        F.col("__s.*"),
    )
    return out


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: events within ``gap`` of the previous
    event (same key) share a session; ``session_col`` numbers sessions per
    key from 1 in time order.

    Batch twin of ``streaming/events.user_sessions_stream``'s
    ``session_window``. Two stacked window functions over the SAME
    (partitionBy key, orderBy ts) spec — one shuffle, one sort, both
    windows evaluated in a single WindowExec pass.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    new_session = F.when(
        F.lag(ts_col).over(w).isNull()
        | (F.col(ts_col) - F.lag(ts_col).over(w) >= gap),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
