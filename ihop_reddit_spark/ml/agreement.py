"""Inter-rater agreement over annotation exports — the engine-side
version of the reference's ``notebooks/inter_rater_agreements.ipynb``
step in the annotation workflow (coherence/intruder task exports
(E1/E2) go to human raters; agreement decides whether the labels are
usable).

Both statistics are computed in EXACT integer arithmetic so they are
cross-engine hash-stable:

* :func:`cohens_kappa` — two raters, nominal categories. κ is kept as
  the integer pair ``(numer, denom)`` over a common denominator
  (``N²·(1 − p_e)`` cross-multiplied), plus the float for display.
* :func:`fleiss_kappa` — m raters per item, nominal categories,
  rater-anonymous. Same exact-rational treatment.

Scale: both reduce to category-grain contingency aggregates (one
shuffle on the category key(s), map-side partial) — frames after
aggregation are |categories|²-sized regardless of row count; the final
scalar assembly is a driver computation over that tiny frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's κ between two raters' nominal labels.

    κ = (p_o − p_e) / (1 − p_e) with p_o = Σ n_kk / N and
    p_e = Σ (rowₖ · colₖ) / N². Cross-multiplied into integers::

        numer = N·Σn_kk − Σ rowₖ·colₖ
        denom = N² − Σ rowₖ·colₖ

    Returns ONE row: ``n, n_agree, kappa_numer, kappa_denom, kappa``
    (kappa = numer/denom as DOUBLE; 0/0 → NULL for a degenerate
    single-category table where κ is undefined). All products are
    ≤ N², int64-exact to N ≤ 3·10⁹ rated items — far beyond any human
    annotation set, so this one stays a lazy plan.

    Rows with a NULL label on either side are excluded (un-rated items).
    """
    rated = df.where(
        F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    ).select(
        F.col(rater_a_col).alias("__a"), F.col(rater_b_col).alias("__b")
    )
    cells = rated.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).alias("__n")
    )
    # marginals from the |K|² cell table (tiny), then one driver-free
    # assembly: join row/col marginals per category and aggregate
    rows = cells.groupBy("__a").agg(F.sum("__n").alias("__row"))
    cols = cells.groupBy("__b").agg(F.sum("__n").alias("__col"))
    chance = (
        rows.join(cols, rows["__a"] == cols["__b"])
        .agg(F.sum(F.col("__row") * F.col("__col")).alias("__pe_numer"))
    )
    totals = cells.agg(
        F.sum("__n").alias("__n_total"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n"))
              .otherwise(0)).alias("__n_agree"),
    )
    # coalesce the totals ONCE and reuse — an empty/all-NULL input makes
    # sum() NULL, and multiplying the un-coalesced columns would leak
    # NULL into numer/denom while n/n_agree read 0 (zero-on-empty is the
    # contract shared with ks_two_sample / categorical_tvd)
    n_total = F.coalesce(F.col("__n_total"), F.lit(0))
    n_agree = F.coalesce(F.col("__n_agree"), F.lit(0))
    pe_numer = F.coalesce(F.col("__pe_numer"), F.lit(0))
    out = totals.crossJoin(F.broadcast(chance)).select(
        n_total.cast("long").alias("n"),
        n_agree.cast("long").alias("n_agree"),
        (n_total * n_agree - pe_numer).cast("long").alias("kappa_numer"),
        (n_total * n_total - pe_numer).cast("long").alias("kappa_denom"),
    )
    return out.withColumn(
        "kappa",
        F.when(
            F.col("kappa_denom") != 0,
            F.col("kappa_numer") / F.col("kappa_denom"),
        ),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
) -> DataFrame:
    """Fleiss' κ for m rater-anonymous labels per item (one input row
    per (item, rating); every item must have the same rating count m).

    With n items, m ratings/item, category counts n_ic per item::

        P_o   = (Σ_i Σ_c n_ic² − n·m) / (n·m·(m−1))
        P_e   = Σ_c (Σ_i n_ic)² / (n·m)²
        κ     = (P_o − P_e) / (1 − P_e)

    The cross-multiplied products (common denominator
    ``n·m·(m−1)·((n·m)² − Σ_c T_c²)``) exceed int64 past ~5·10⁵ items,
    so — like :func:`~ihop_reddit_spark.datapipe.drift.
    two_proportion_significance` — the distributed work is ONE
    category-grain aggregation pass producing four bounded longs, and
    the κ fraction is assembled on the driver in Python
    arbitrary-precision integers (EAGER: runs the job at call time;
    batch readout only). The float is ``float(numer)/float(denom)`` —
    two nearest-double roundings then one IEEE divide, bit-identical to
    an engine computing ``CAST(numer AS DOUBLE)/CAST(denom AS DOUBLE)``
    from the same integers.

    Returns one row: ``n_items, m_raters, kappa`` (NULL kappa when the
    denominator is 0; ``m_raters = -1`` poisons the row when items have
    deviating rating counts instead of silently mixing them).
    """
    ratings = df.where(F.col(label_col).isNotNull()).select(
        F.col(item_col).alias("__i"), F.col(label_col).alias("__c")
    )
    per_cell = ratings.groupBy("__i", "__c").agg(
        F.count(F.lit(1)).alias("__nic")
    )
    per_item = per_cell.groupBy("__i").agg(
        F.sum("__nic").alias("__m"),
        F.sum(F.col("__nic") * F.col("__nic")).alias("__sq"),
    )
    cat_tot = per_cell.groupBy("__c").agg(
        F.sum("__nic").alias("__tc")
    ).agg(F.sum(F.col("__tc") * F.col("__tc")).alias("__sum_tc2"))
    agg = per_item.agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__m").alias("__m_min"),
        F.max("__m").alias("__m_max"),
        F.sum("__sq").alias("__sum_sq"),
    )
    row = agg.crossJoin(F.broadcast(cat_tot)).collect()[0]
    n = int(row["__n"] or 0)
    m_min = int(row["__m_min"] or 0)
    m_max = int(row["__m_max"] or 0)
    sum_sq = int(row["__sum_sq"] or 0)
    sum_tc2 = int(row["__sum_tc2"] or 0)
    m = m_min
    nm = n * m
    numer = (sum_sq - nm) * nm * nm - sum_tc2 * nm * (m - 1)
    denom = nm * (m - 1) * (nm * nm - sum_tc2)
    equal_m = m_min == m_max
    # poison means POISON: unequal rating counts make the mixed-m
    # formula meaningless, so kappa is NULL, not a plausible number
    kappa = (
        float(numer) / float(denom) if denom != 0 and equal_m else None
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n, m if equal_m else -1, kappa)],
        schema="n_items long, m_raters long, kappa double",
    )
