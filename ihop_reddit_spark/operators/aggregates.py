"""Aggregation operators (SURVEY §2.4, A2-A11).

Design rules applied throughout:

* Every aggregation is a hash aggregate with map-side partial aggregation —
  one shuffle on the group key, no global sort.
* Ordered group-concat is done with ``array_sort(collect_list(struct(...)))``
  INSIDE the group — the reference's ``orderBy`` → ``groupBy`` →
  ``collect_list`` (``ihop/text_processing.py:208-219``) has undefined
  ordering per Spark semantics and only works single-partition; sorting the
  collected array is both defined and cheaper (no pre-shuffle sort).
* ``collect_list`` is unbounded state per key; callers at 100 TB must bound it
  (``max_items``) — per-key truncation via ``slice`` after sort keeps the
  top-k deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_concat(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    sep: str = " ",
    concat_col: str = "context_concat",
    length_col: str = "context_length",
    max_items: int | None = None,
) -> DataFrame:
    """A2/A8/A10 — per-group ordered string concatenation + group size.

    Reference: ``ihop/import_data.py:228-272`` (user → space-joined subreddit
    context "sentence" + context length) and ``ihop/annotation_task_export.py:
    35-39``. When ``order_cols`` is given, elements are sorted inside the
    group by those columns (then by the value itself as the final tie-break),
    giving a total deterministic order — the scalable, well-defined version of
    the reference's sort-before-groupBy idiom.
    """
    if order_cols:
        struct_cols = [F.col(c) for c in order_cols] + [F.col(value_col)]
        collected = F.array_sort(F.collect_list(F.struct(*struct_cols)))
        values = F.transform(collected, lambda s: s[value_col])
    else:
        values = F.collect_list(F.col(value_col))
    if max_items is not None:
        if not order_cols:
            raise ValueError(
                "max_items without order_cols would truncate an unordered "
                "collect_list nondeterministically; pass order_cols"
            )
        values = F.slice(values, 1, max_items)
    return df.groupBy(group_col).agg(
        F.concat_ws(sep, values).alias(concat_col),
        F.count(F.lit(1)).alias(length_col),
    )


def assemble_thread_documents(
    df: DataFrame,
    thread_col: str,
    first_cols: list[str],
    body_col: str,
    order_cols: list[str],
    doc_col: str = "document_text",
    count_col: str = "num_comments",
    sep: str = " ",
) -> DataFrame:
    """A8 — thread-document assembly: per thread, the (constant) submission
    columns + all comment bodies concatenated in event-time order.

    Reference: ``ihop/text_processing.py:208-219`` (``orderBy(time_delta).
    groupBy(submission_id).agg(first(...), concat_ws(collect_list(body)))``).
    ``first_cols`` are functionally dependent on the thread id, so ``first``
    is safe; ordering is made explicit with an in-group ``array_sort`` over
    ``struct(order_cols..., body)``.
    """
    struct_cols = [F.col(c) for c in order_cols] + [F.col(body_col)]
    collected = F.array_sort(F.collect_list(F.struct(*struct_cols)))
    bodies = F.transform(collected, lambda s: s[body_col])
    aggs = [F.first(F.col(c)).alias(c) for c in first_cols]
    aggs.append(F.concat_ws(sep, bodies).alias(doc_col))
    aggs.append(F.count(F.lit(1)).alias(count_col))
    return df.groupBy(thread_col).agg(*aggs)


def group_counts(df: DataFrame, group_col: str, count_col: str = "count") -> DataFrame:
    """A3 — per-group activity count (``ihop/import_data.py:293``)."""
    return df.groupBy(group_col).agg(F.count(F.lit(1)).alias(count_col))


def decimal_sum(col: str | Column, precision: int = 18, scale: int = 4) -> Column:
    """Exact, order-independent sum of a float column via decimal cast.

    Summing doubles is order-dependent (different partitionings → different
    ulps); casting each value to a fixed-scale decimal first makes the sum
    exact and bit-identical on any engine — required for the duckdb oracle
    and generally the right semantics for money-like columns.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})"))


def corpus_stats(
    df: DataFrame,
    distinct_cols: list[str],
    ts_col: str | None = None,
    value_col: str | None = None,
    approx_rsd: float | None = None,
) -> DataFrame:
    """A4-A7 — one-pass corpus statistics (single-row result).

    Reference: ``print_comparison_stats`` (``ihop/import_data.py:117-178``)
    runs 5 separate actions re-scanning the source each time; here the stats
    are ONE aggregate (one scan, one job). ``approx_rsd`` switches the
    count-distincts to ``approx_count_distinct`` (HLL++, one pass, bounded
    state) — exact distinct over billions of user ids is itself a massive
    shuffle, so at 100 TB the approx path is the default posture and the
    rsd (relative standard deviation, e.g. 0.01) is the contract.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("num_rows")]
    for c in distinct_cols:
        if approx_rsd is not None:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd=approx_rsd).alias(
                    f"distinct_{c}"
                )
            )
        else:
            aggs.append(F.countDistinct(F.col(c)).alias(f"distinct_{c}"))
    if ts_col is not None:
        aggs.append(F.min(ts_col).alias(f"min_{ts_col}"))
        aggs.append(F.max(ts_col).alias(f"max_{ts_col}"))
    if value_col is not None:
        aggs.append(decimal_sum(value_col).alias(f"sum_{value_col}"))
    return df.select(aggs)


def describe_column(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """A7/A11 — per-group count/mean/stddev/min/max of a numeric column.

    Reference: ``df.describe`` (``ihop/text_processing.py:43-47``) and pandas
    ``std``/``mean`` (``ihop/annotation_task_export.py:75-77``). Mean and
    sample-stddev are computed from exact decimal ``sum``/``sum-of-squares``
    partials so the result is deterministic (oracle-comparable); the formula
    is the standard one-pass ``sqrt((Σx² − (Σx)²/n) / (n−1))``.
    """
    x = F.col(value_col).cast(f"decimal(18,{scale})")
    n = F.count(F.lit(1))
    sx = F.sum(x)
    sxx = F.sum(x * x)
    mean = (sx.cast("double") / n).alias(f"mean_{value_col}")
    var = (sxx.cast("double") - sx.cast("double") * sx.cast("double") / n) / (n - 1)
    return df.groupBy(group_col).agg(
        n.alias("count"),
        mean,
        F.sqrt(var).alias(f"stddev_{value_col}"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
    )


def contingency_table(
    df: DataFrame,
    left_col: str,
    right_col: str,
    weight_col: str | None = None,
    count_col: str = "n",
) -> DataFrame:
    """M9 (first half) — long-form contingency table over two labelings.

    Reference: ``ihop/clustering.py:96-128`` builds a dense numpy contingency
    matrix on the driver; here it is a distributed ``groupBy(c1, c2)`` with an
    optional weight, which feeds the comparison metrics in
    ``ml/cluster_metrics.py`` and pivots to dense form only at the driver edge
    (k×k, k≈hundreds).
    """
    w = F.sum(weight_col) if weight_col else F.count(F.lit(1))
    return df.groupBy(left_col, right_col).agg(w.alias(count_col))


def vector_sum_by_group(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    quantized: bool = True,
) -> DataFrame:
    """A9 — per-group element-wise vector sum, long form (group, pos, sum).

    Reference: ``Summarizer.sum(vectorized)`` per subreddit (PMI notebook
    cell 7). Here: ``posexplode`` + ``groupBy(group, pos)`` — a plain
    columnar aggregation that map-side combines and never builds a dense
    per-group buffer, so it scales to any dimensionality / group count.
    ``quantized=True`` sums floor(v·2²⁴) int64s (exact, order-independent,
    oracle-comparable); False sums raw doubles. ``pos`` is 1-based.
    Pivot back to arrays at the edge with
    ``groupBy(group).agg(array_sort(collect_list(struct(pos, s))))`` if a
    dense row is needed.
    """
    from ..functions.vectors import QUANT_SCALE

    ex = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "__v")
    )
    if quantized:
        val = F.floor(F.col("__v").cast("double") * F.lit(float(QUANT_SCALE))).cast(
            "long"
        )
        agg = F.sum(val).alias("qsum")
    else:
        agg = F.sum(F.col("__v").cast("double")).alias("sum")
    return ex.select(
        group_col, (F.col("pos") + 1).cast("long").alias("pos"), F.col("__v")
    ).groupBy(group_col, "pos").agg(agg)


def grouped_concat_salted(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_cols: list[str],
    n_salts: int = 16,
    sep: str = " ",
    concat_col: str = "context_concat",
    length_col: str = "context_length",
) -> DataFrame:
    """Skew-hardened :func:`grouped_concat` — two-phase salted aggregation.

    A2's scale hazard: one hot key (a bot user with 10⁷ comments) turns the
    single ``groupBy(user)`` into one straggler task holding the whole
    group's sort buffer. Salting splits every group into ``n_salts``
    sub-groups for the wide phase:

    1. ``groupBy(key, salt)`` where salt = hash(order cols) mod n — each
       partial sorts/collects only ~1/n of a hot group (map-side combine
       still applies);
    2. ``groupBy(key)`` merges the ≤n pre-sorted partial arrays (flatten +
       one final ``array_sort`` of already-collected structs — no row data
       moves twice).

    Same total order and output as ``grouped_concat(order_cols=...)``
    (property-tested); use when key skew is known/observed. The final merge
    still materializes one full array per key — cap output with downstream
    ``slice`` or pre-aggregate if even that is too large.
    """
    struct_cols = [F.col(c) for c in order_cols] + [F.col(value_col)]
    salt = F.pmod(F.hash(*[F.col(c) for c in order_cols], F.col(value_col)), F.lit(n_salts))
    partial = df.groupBy(F.col(group_col), salt.alias("__salt")).agg(
        F.collect_list(F.struct(*struct_cols)).alias("__part"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    merged = partial.groupBy(group_col).agg(
        F.array_sort(F.flatten(F.collect_list("__part"))).alias("__all"),
        F.sum("__cnt").alias(length_col),
    )
    return merged.select(
        group_col,
        F.concat_ws(
            sep, F.transform(F.col("__all"), lambda s: s[value_col])
        ).alias(concat_col),
        length_col,
    )


def merge_additive_aggregates(
    old: DataFrame,
    delta: DataFrame,
    keys: list[str],
    add_cols: list[str],
) -> DataFrame:
    """Incremental materialized-view maintenance for ADDITIVE aggregates
    (SUM/COUNT): merge a maintained aggregate table with the aggregate of
    a new data slice by full-outer key join + coalesced addition —
    equivalent to re-aggregating everything, at the cost of the DELTA
    only. (Min/max are also mergeable with greatest/least; averages must
    be carried as sum+count — the caller materializes those parts.)

    Plan: both sides are aggregate-grain (dimension-sized), one key
    shuffle; the raw fact history is never rescanned — the same
    incremental shape as retrieval.merge_postings_index.
    """
    o = old.select(
        *keys, *[F.col(c).alias(f"__o_{c}") for c in add_cols]
    )
    d = delta.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in add_cols]
    )
    j = o.join(d, keys, "full_outer")
    return j.select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"__o_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in add_cols
        ],
    )
