"""Distribution-drift and robust-outlier QA operators: the statistical
monitoring a production data pipeline runs between dataset versions
(did yesterday's ingest shift the value distribution? which rows are
gross outliers?).

Both operators are EXACT and cross-engine hash-stable:

* :func:`ks_two_sample` keeps the Kolmogorov–Smirnov statistic as an
  integer NUMERATOR over the common denominator ``n_a · n_b`` — no
  float division anywhere, so the sup-distance is exact and the drift
  verdict is a pure integer comparison.
* :func:`mad_outliers` uses type-1 (lower) medians — actual data values
  selected by rank, not interpolations — so median, MAD, and the
  ``|x − med| > k·MAD`` comparisons are identical IEEE operations in
  any engine.

Scale notes: the KS plan aggregates to the DISTINCT-QUANTIZED-value
grain first (``groupBy(bucket)`` — one shuffle, map-side partial), then
runs one cumulative window over that bucket-grain frame. The window is
globally ordered; callers control the bucket width, which bounds the
frame to the value domain (e.g. 1e-3 quantization ⇒ ≤ a few million
rows regardless of corpus size — range-partitionable if ever needed).
``mad_outliers`` uses per-group windows (partitioned by the group key,
no global sort) and two rank-selection passes — the same plan family as
quantiles_value_by_event_type.

Reference parity: the reference has no statistical QA; this extends the
engine's quality tier (datapipe/quality.py constraint/profile/skew
reports) with distribution-level checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a: str,
    side_b: str,
    *,
    quantize: int = 1000,
    threshold_permille: int = 50,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance between the
    ``value_col`` distributions of two populations.

    Values are quantized to ``floor(value · quantize)`` (exact IEEE
    multiply + floor — identical in any engine) to bound the support.
    Returns ONE row::

        n_a, n_b            sample sizes (LONG)
        ks_numer            max |cumA·n_b − cumB·n_a|  (LONG — the KS
                            statistic's numerator over n_a·n_b)
        drift               ks_numer·1000 > threshold_permille·n_a·n_b
                            (i.e. D > threshold_permille/1000, exact)
    """
    v = F.floor(F.col(value_col) * quantize).cast("long").alias("bucket")
    # NULL values are excluded up front: a NULL bucket would sort
    # NULLS FIRST in Spark's window but NULLS LAST in other engines,
    # breaking cross-engine hash-exactness.
    sided = df.where(
        F.col(side_col).isin([side_a, side_b])
        & F.col(value_col).isNotNull()
    ).select(v, F.col(side_col).alias("__side"))
    counts = sided.groupBy("bucket").agg(
        F.sum(F.when(F.col("__side") == side_a, 1).otherwise(0))
        .alias("ca"),
        F.sum(F.when(F.col("__side") == side_b, 1).otherwise(0))
        .alias("cb"),
    )
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    # sample sizes: 1-row frame, broadcast into the row-wise numerator
    totals = counts.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    joined = cum.crossJoin(F.broadcast(totals))
    # coalesce(·, 0) defines the empty-input case: the global agg over
    # an empty frame yields one all-NULL row; zeros make the contract
    # "no data ⇒ n_a=n_b=ks_numer=0, drift=false" instead of NULLs.
    return joined.agg(
        F.max(
            F.abs(F.col("cuma") * F.col("n_b") - F.col("cumb") * F.col("n_a"))
        ).alias("ks_numer"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    ).select(
        F.coalesce(F.col("n_a"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("long").alias("n_b"),
        F.coalesce(F.col("ks_numer"), F.lit(0))
        .cast("long")
        .alias("ks_numer"),
        F.coalesce(
            F.col("ks_numer") * 1000
            > F.lit(threshold_permille) * F.col("n_a") * F.col("n_b"),
            F.lit(False),
        ).alias("drift"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    k: int = 3,
) -> DataFrame:
    """Per-group robust outlier counts via the median-absolute-deviation
    rule: a row is an outlier when ``|x − median| > k · MAD``.

    Type-1 (lower) medians throughout — rank-selected data values, no
    interpolation — so every arithmetic step is engine-exact. Returns one
    row per group: ``group, median_value, mad, n, n_outliers``.
    """
    w_grp = Window.partitionBy("grp")
    ranked = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    ).withColumn(
        "rn", F.row_number().over(w_grp.orderBy("v"))
    ).withColumn("n", F.count(F.lit(1)).over(w_grp))
    med = ranked.where(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(F.col("grp"), F.col("v").alias("med"), "n")
    devs = ranked.join(med.select("grp", "med"), "grp").select(
        "grp", "v", "med", "n",
        F.abs(F.col("v") - F.col("med")).alias("dev"),
    )
    w_dev = Window.partitionBy("grp").orderBy("dev")
    # group sizes already computed in `ranked` — carry them instead of a
    # second count window over the deviation frame
    dev_ranked = devs.withColumn(
        "rn", F.row_number().over(w_dev)
    ).withColumnRenamed("n", "nn")
    mad = dev_ranked.where(
        F.col("rn") == F.expr("(nn + 1) div 2")
    ).select("grp", F.col("dev").alias("mad"))
    flagged = devs.join(mad, "grp")
    return flagged.groupBy("grp").agg(
        F.first("med").alias("median_value"),
        F.first("mad").alias("mad"),
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("dev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
        ).alias("n_outliers"),
    ).select(
        F.col("grp").alias(group_col),
        "median_value",
        "mad",
        F.col("n").cast("long").alias("n"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
    )


def two_proportion_significance(
    df: DataFrame,
    variant_col: str,
    variant_a: str | int,
    variant_b: str | int,
    success: Column,
    *,
    z2_scaled: int = 38416,  # z² · 10⁴ for z = 1.96 (95% two-sided)
) -> DataFrame:
    """Exact A/B readout: pooled two-proportion z-test with the decision
    taken in INTEGER arithmetic — no sqrt, no float division, so the
    verdict is bit-identical on any engine.

    The usual test ``|p̂₁−p̂₂| > z·√(p̂(1−p̂)(1/n₁+1/n₂))`` is squared and
    cross-multiplied into::

        (s₁n₂ − s₂n₁)² · N · 10⁴  >  z²10⁴ · S(N−S) · n₁n₂

    with ``S = s₁+s₂``, ``N = n₁+n₂``. The distributed work is ONE
    aggregation pass over the filtered variants (conditional sums
    partial-combine map-side) producing four longs; the inequality is
    then decided on the driver in Python arbitrary-precision integers
    (NOTE: this makes the function EAGER — it runs the aggregation at
    call time and returns a literal 1-row frame, so it does not compose
    onto streaming frames; use it as a batch readout) —
    ``diff²·N·10⁴`` exceeds DECIMAL(38,0) once cohorts reach ~10⁷ rows
    per side, where Spark's non-ANSI decimal arithmetic would silently
    NULL the verdict, so the 4-scalar collect (bounded, one row) is the
    scale-correct altitude for the decision. Returns one row:
    ``n_a, s_a, n_b, s_b, significant``.
    """
    agg = df.where(
        F.col(variant_col).isin([variant_a, variant_b])
    ).agg(
        F.sum(
            F.when(F.col(variant_col) == variant_a, 1).otherwise(0)
        ).alias("n_a"),
        F.sum(
            F.when(
                (F.col(variant_col) == variant_a) & success, 1
            ).otherwise(0)
        ).alias("s_a"),
        F.sum(
            F.when(F.col(variant_col) == variant_b, 1).otherwise(0)
        ).alias("n_b"),
        F.sum(
            F.when(
                (F.col(variant_col) == variant_b) & success, 1
            ).otherwise(0)
        ).alias("s_b"),
    )
    row = agg.collect()[0]
    n_a = int(row["n_a"] or 0)
    s_a = int(row["s_a"] or 0)
    n_b = int(row["n_b"] or 0)
    s_b = int(row["s_b"] or 0)
    n = n_a + n_b
    s = s_a + s_b
    diff = s_a * n_b - s_b * n_a
    lhs = diff * diff * n * 10_000
    rhs = z2_scaled * s * (n - s) * n_a * n_b
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n_a, s_a, n_b, s_b, lhs > rhs)],
        schema="n_a long, s_a long, n_b long, s_b long, significant boolean",
    )


def categorical_tvd(
    df: DataFrame,
    cat_col: str,
    side_col: str,
    side_a: str,
    side_b: str,
    *,
    threshold_permille: int = 50,
) -> DataFrame:
    """Exact total-variation distance between two populations' CATEGORY
    distributions — the categorical sibling of :func:`ks_two_sample`
    (which needs an ordered support). TVD = ½·Σ|p̂ₐ(c) − p̂ᵦ(c)| is kept
    as the integer numerator ``Σ|cₐ·n_b − cᵦ·n_a|`` over ``2·n_a·n_b``;
    the drift verdict is the pure integer comparison
    ``numer·1000 > 2·threshold·n_a·n_b``.

    One shuffle on the category key (map-side partial counts), then a
    category-grain aggregate — the frame after the first aggregation is
    support-sized regardless of row count.
    """
    # NULL categories are excluded for the same cross-engine reason as
    # ks_two_sample's NULL buckets (NULL grouping/ordering divergence).
    sided = df.where(
        F.col(side_col).isin([side_a, side_b]) & F.col(cat_col).isNotNull()
    ).select(
        F.col(cat_col).alias("cat"), F.col(side_col).alias("__side")
    )
    counts = sided.groupBy("cat").agg(
        F.sum(F.when(F.col("__side") == side_a, 1).otherwise(0))
        .alias("ca"),
        F.sum(F.when(F.col("__side") == side_b, 1).otherwise(0))
        .alias("cb"),
    )
    totals = counts.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    joined = counts.crossJoin(F.broadcast(totals))
    # empty-input contract matches ks_two_sample: zeros + drift=false.
    return joined.agg(
        F.sum(
            F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
        ).alias("tvd_numer"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    ).select(
        F.coalesce(F.col("n_a"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("long").alias("n_b"),
        F.coalesce(F.col("tvd_numer"), F.lit(0))
        .cast("long")
        .alias("tvd_numer"),
        F.coalesce(
            F.col("tvd_numer") * 1000
            > 2 * F.lit(threshold_permille) * F.col("n_a") * F.col("n_b"),
            F.lit(False),
        ).alias("drift"),
    )
