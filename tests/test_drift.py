"""Closed-form tests for the statistical-QA tier (datapipe/drift.py):
exact KS numerator on hand-computable samples, MAD rule vs numpy."""

from __future__ import annotations

from ihop_reddit_spark.datapipe.drift import ks_two_sample, mad_outliers


def test_ks_identical_distributions_zero(spark):
    rows = [("a", float(v)) for v in range(10)] + [
        ("b", float(v)) for v in range(10)
    ]
    df = spark.createDataFrame(rows, ["side", "value"])
    r = ks_two_sample(df, "value", "side", "a", "b").collect()[0]
    assert r["ks_numer"] == 0 and not r["drift"]
    assert r["n_a"] == r["n_b"] == 10


def test_ks_disjoint_supports_is_max(spark):
    # a: 0..4, b: 10..14 → D = 1 exactly → numerator = n_a*n_b
    rows = [("a", float(v)) for v in range(5)] + [
        ("b", float(v + 10)) for v in range(5)
    ]
    df = spark.createDataFrame(rows, ["side", "value"])
    r = ks_two_sample(df, "value", "side", "a", "b").collect()[0]
    assert r["ks_numer"] == 25 and r["drift"]


def test_ks_hand_computed_partial_overlap(spark):
    # a = {0,1,2,3}, b = {2,3,4,5}: cum diffs (×16 denom):
    # after 0: |1·4-0·4|=4; 1: 8; 2: |3·4-1·4|=8; 3: 0... max when
    # cumA=2,cumB=0 → 8. D = 8/16 = 0.5
    rows = [("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 2.0), ("b", 3.0), ("b", 4.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, ["side", "value"])
    r = ks_two_sample(df, "value", "side", "a", "b").collect()[0]
    assert r["ks_numer"] == 8 and r["n_a"] == 4 and r["n_b"] == 4
    assert r["drift"]  # 0.5 > 0.05


def test_mad_outliers_closed_form(spark):
    # group g: values 1..7 plus outlier 100 → n=8, lower median = 4
    # devs: |1-4|..|7-4|,|100-4| = [3,2,1,0,1,2,3,96] sorted
    # [0,1,1,2,2,3,3,96], lower median (rank 4) = 2 → MAD=2
    # outliers: dev > 6 → only 96 → 1
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], ["grp_col", "value"]
    )
    r = mad_outliers(df, "value", "grp_col").collect()[0]
    assert r["median_value"] == 4.0
    assert r["mad"] == 2.0
    assert r["n"] == 8 and r["n_outliers"] == 1


def test_two_proportion_significance_closed_form(spark):
    from pyspark.sql import functions as F

    from ihop_reddit_spark.datapipe.drift import two_proportion_significance

    def run(sa, na, sb, nb):
        rows = [("a", i < sa) for i in range(na)] + [
            ("b", i < sb) for i in range(nb)
        ]
        df = spark.createDataFrame(rows, ["variant", "succ"])
        return two_proportion_significance(
            df, "variant", "a", "b", F.col("succ")
        ).collect()[0]

    # identical rates → never significant
    r = run(50, 100, 50, 100)
    assert not r["significant"]
    assert (r["n_a"], r["s_a"], r["n_b"], r["s_b"]) == (100, 50, 100, 50)
    # 50% vs 10% at n=100 → z ≈ 6.2, decisively significant
    assert run(50, 100, 10, 100)["significant"]
    # same gap at tiny n → not significant (5/10 vs 1/10, z ≈ 1.9 < 1.96)
    assert not run(5, 10, 1, 10)["significant"]


def test_categorical_tvd_closed_form(spark):
    from ihop_reddit_spark.datapipe.drift import categorical_tvd

    # a: 3×x + 1×y (n=4); b: 1×x + 3×y (n=4)
    # TVD = ½(|3/4−1/4| + |1/4−3/4|) = ½ → numer = Σ|ca·nb−cb·na| = 16
    rows = [("x", "a")] * 3 + [("y", "a")] + [("x", "b")] + [("y", "b")] * 3
    df = spark.createDataFrame(rows, ["cat", "side"])
    r = categorical_tvd(df, "cat", "side", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["tvd_numer"]) == (4, 4, 16)
    assert r["drift"]  # 0.5 > 0.05

    # identical mixes → zero distance, no drift
    same = [("x", s) for s in ("a", "b")] + [("y", s) for s in ("a", "b")]
    r2 = categorical_tvd(
        spark.createDataFrame(same, ["cat", "side"]), "cat", "side",
        "a", "b",
    ).collect()[0]
    assert r2["tvd_numer"] == 0 and not r2["drift"]


def test_ks_null_values_excluded_and_empty_defined(spark):
    """ADVICE r3: NULL value rows must not create a NULL bucket (which
    windows order differently across engines), and an empty side/input
    must yield the defined all-zero row rather than NULLs."""
    from ihop_reddit_spark.datapipe.drift import ks_two_sample

    rows = [(0.5, "a"), (0.5, "b"), (None, "a"), (None, "b")]
    df = spark.createDataFrame(rows, "value double, side string")
    r = ks_two_sample(df, "value", "side", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["ks_numer"]) == (1, 1, 0)
    assert r["drift"] is False

    empty = df.where("value > 999")
    r0 = ks_two_sample(empty, "value", "side", "a", "b").collect()[0]
    assert (r0["n_a"], r0["n_b"], r0["ks_numer"]) == (0, 0, 0)
    assert r0["drift"] is False


def test_tvd_null_categories_excluded_and_empty_defined(spark):
    from ihop_reddit_spark.datapipe.drift import categorical_tvd

    rows = [("x", "a"), ("x", "b"), (None, "a")]
    df = spark.createDataFrame(rows, "cat string, side string")
    r = categorical_tvd(df, "cat", "side", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["tvd_numer"]) == (1, 1, 0)
    assert r["drift"] is False

    r0 = categorical_tvd(
        df.where("cat = 'never'"), "cat", "side", "a", "b"
    ).collect()[0]
    assert (r0["n_a"], r0["n_b"], r0["tvd_numer"], r0["drift"]) == (
        0, 0, 0, False,
    )


def test_two_proportion_significance_exceeds_decimal38(spark):
    """ADVICE r3 (medium): the decision must survive cohort sizes whose
    diff²·N·10⁴ exceeds DECIMAL(38,0); the driver-side Python-int
    decision is exact at any scale. Replicate the function's formula at
    1e8-per-side scale (past the decimal38 ceiling) and check the
    verdict, then exercise the end-to-end path on a small frame."""
    from pyspark.sql import functions as F

    from ihop_reddit_spark.datapipe.drift import two_proportion_significance

    n_a = n_b = 10**8
    s_a, s_b = 51_000_000, 50_000_000
    diff = s_a * n_b - s_b * n_a
    lhs = diff * diff * (n_a + n_b) * 10_000
    assert lhs > 10**38  # would overflow DECIMAL(38,0)
    rhs = 38416 * (s_a + s_b) * ((n_a + n_b) - (s_a + s_b)) * n_a * n_b
    assert lhs > rhs  # 51% vs 50% at n=1e8 is decisively significant

    # and the end-to-end path still returns the right small-sample row
    rows = [("a", True)] * 3 + [("a", False)] * 3 + [("b", False)] * 6
    df = spark.createDataFrame(rows, "variant string, succ boolean")
    r = two_proportion_significance(
        df, "variant", "a", "b", F.col("succ")
    ).collect()[0]
    assert (r["n_a"], r["s_a"], r["n_b"], r["s_b"]) == (6, 3, 6, 0)
