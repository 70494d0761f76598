"""Mergeable-HLL sketch table tests (datapipe/sketches.py): persistence
round-trip, merge-equals-direct, and idempotent re-union — the contracts
that make a persisted sketch table valid as a reusable artifact."""

from __future__ import annotations

from pyspark.sql import functions as F

from ihop_reddit_spark.datapipe.sketches import (
    hll_partial_sketches,
    hll_rollup,
)


def _events(spark):
    rows = [
        # (etype, day, user) — purchase spans 2 days with overlapping users
        ("purchase", 1, 10), ("purchase", 1, 11), ("purchase", 2, 10),
        ("purchase", 2, 12), ("click", 1, 10), ("click", 1, 10),
        ("click", 2, 13), ("click", 2, 14), ("click", 2, 15),
    ]
    return spark.createDataFrame(rows, ["event_type", "day", "user_id"])


def test_sketch_roundtrip_and_rollup(spark, tmp_path):
    ev = _events(spark)
    partials = hll_partial_sketches(ev, ["event_type", "day"], "user_id")
    path = str(tmp_path / "sketches")
    partials.write.parquet(path)  # binary sketch column persists as-is
    got = {
        r["event_type"]: r["distinct_est"]
        for r in hll_rollup(
            spark.read.parquet(path), ["event_type"]
        ).collect()
    }
    # small cardinalities stay in exact (list/set) mode
    assert got == {"purchase": 3, "click": 4}


def test_union_is_idempotent_and_matches_direct(spark):
    ev = _events(spark)
    partials = hll_partial_sketches(ev, ["event_type", "day"], "user_id")
    # re-unioning the same day twice (replayed batch) changes nothing
    doubled = hll_rollup(
        partials.unionAll(partials), ["event_type"]
    ).withColumnRenamed("distinct_est", "est2")
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("d")
    )
    j = (
        hll_rollup(partials, ["event_type"])
        .join(doubled, "event_type")
        .join(direct, "event_type")
        .collect()
    )
    for r in j:
        assert r["distinct_est"] == r["est2"] == r["d"]


def test_histogram_sketch_merge_equals_direct_and_quantiles(spark):
    """The mergeable-quantile contract: daily partials sum-merged must
    equal the direct histogram, and quantile reads are exact type-1
    over the quantized grid."""
    from ihop_reddit_spark.datapipe.sketches import (
        histogram_merge,
        histogram_partials,
        histogram_quantiles,
    )

    rows = [("g", d, v / 10.0) for d in (1, 2) for v in range(10)]
    rows += [("g", 1, None)]  # NULLs excluded
    df = spark.createDataFrame(rows, "grp string, day int, value double")

    partials = histogram_partials(df, ["grp", "day"], "value", quantize=10)
    merged = histogram_merge(partials, ["grp"])
    direct = histogram_partials(df, ["grp"], "value", quantize=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # 20 values = two copies of {0.0 … 0.9} → buckets 0..9, 2 each.
    # q=500: ceil(0.5*20)=10th value → bucket 4; q=900: 18th → bucket 8;
    # q=1000: 20th → bucket 9.
    qs = {
        r["q_permille"]: (r["bucket"], r["value"])
        for r in histogram_quantiles(
            merged, ["grp"], [500, 900, 1000], quantize=10
        ).collect()
    }
    assert qs[500] == (4, 0.4)
    assert qs[900] == (8, 0.8)
    assert qs[1000] == (9, 0.9)


def test_cm_sketch_merge_estimate_and_bounds(spark):
    from pyspark.sql import functions as F

    from ihop_reddit_spark.datapipe.sketches import (
        cm_estimate,
        cm_merge,
        cm_partials,
    )

    rows = [(d, f"item{i % 5}") for d in (1, 2) for i in range(20)]
    rows += [(1, None)]  # NULLs excluded
    df = spark.createDataFrame(rows, "day int, item string")

    partials = cm_partials(df, "item", keys=["day"], width=64, depth=3)
    merged = cm_merge(partials.drop("day"))
    direct = cm_partials(df, "item", width=64, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )

    probes = spark.createDataFrame(
        [("item0",), ("item3",), ("missing",)], ["item"]
    )
    est = {
        r["item"]: r["est"]
        for r in cm_estimate(
            merged, probes, "item", width=64, depth=3
        ).collect()
    }
    # every item0..4 occurs 8 times; CM never undercounts, and with 5
    # items in a 64-wide sketch, depth-3 min recovers exactly here
    assert est["item0"] >= 8 and est["item3"] >= 8
    assert est["missing"] >= 0
    # deterministic: same call → identical estimates
    est2 = {
        r["item"]: r["est"]
        for r in cm_estimate(
            merged, probes, "item", width=64, depth=3
        ).collect()
    }
    assert est == est2
