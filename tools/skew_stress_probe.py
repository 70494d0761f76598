"""Skew-stress probe for the dedup tier (VERDICT r3 item 8).

Plants a single near-duplicate MEGA-CLUSTER holding 10% of the sf0.1
documents table (one boilerplate template plus a short per-doc tail, so
the cluster is a true near-dup family: banded candidates, high Jaccard,
exact verification survives) and measures the operators whose
skew-safety claims otherwise rest on sf0.01-shaped data:

* ``ngram_jaccard_pairs``       — the exact similarity join; the planted
  cluster makes its hot shingles ~10%-mass keys.
* ``build_minhash_index`` + ``incremental_minhash_candidates`` — the
  scale-tier banding path; the mega-cluster lands in one band bucket.
* ``dedup_keep_best``           — the argmax-under-skew claim
  (``datapipe/dedup.py``): one component holds 10% of the corpus.
* ``fuzzy_decontaminate``       — (r4 tier) the benchmark doc IS the
  boilerplate, so every benchmark shingle is a ~10%-mass hot key and
  the drop set is corpus-proportional.
* ``histogram_partials/quantiles`` — (r4 tier) 90% of events collapse
  onto one (key, bucket) cell; partials must stay support-bounded.

The planted pair count inside a C-member cluster is C·(C−1)/2, which is
quadratic by PROBLEM DEFINITION (those pairs genuinely exist); the probe
therefore caps the mega-cluster at ``--cluster-size`` members (default
2,000 → ~2M true pairs at sf0.1's 20k docs ≈ 10%) and reports wall
times plus the emitted pair/survivor counts so the numbers are
interpretable. What the probe checks is that the plans COMPLETE at that
density without driver/executor failure and in time proportional to the
output size — not that quadratic output is free.

Usage: python tools/skew_stress_probe.py [sf_dir] [--cluster-size N]
Prints one JSON line: {"planted": N, "ops": {name: {"sec": s, ...}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--cluster-size", type=int, default=2000)
    ns = ap.parse_args()
    sf_dir = ns.sf_dir
    cluster_size = ns.cluster_size

    from pyspark.sql import functions as F

    from ihop_reddit_spark.session import get_spark_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark_session(
        "skew-stress",
        config={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": cpus,
        },
        master=f"local[{cpus}]",
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    planted = min(cluster_size, n_docs // 10)

    # 10%-mass mega-cluster: the lowest `planted` doc_ids share one long
    # boilerplate template; a short unique tail keeps them near- (not
    # exact-) duplicates. Everything else keeps its original text.
    boiler = " ".join(
        f"boilerplate{w % 37} legal disclaimer shared footer text"
        for w in range(40)
    )
    skewed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") < planted,
            F.concat_ws(
                " ",
                F.lit(boiler),
                F.concat(F.lit("tail"), F.col("doc_id").cast("string")),
            ),
        ).otherwise(F.col("text")),
    ).persist()
    skewed.count()

    from ihop_reddit_spark.datapipe.dedup import (
        build_minhash_index,
        dedup_keep_best,
        incremental_minhash_candidates,
        ngram_jaccard_pairs,
    )

    ops: dict[str, dict] = {}

    t0 = time.time()
    pairs = ngram_jaccard_pairs(
        skewed, "text", "doc_id", n=3, threshold=0.5
    )
    n_pairs = pairs.count()
    ops["ngram_jaccard_pairs"] = {
        "sec": round(time.time() - t0, 2), "pairs": n_pairs,
    }
    spark.catalog.clearCache()
    skewed.persist().count()

    t0 = time.time()
    old = skewed.where(F.col("doc_id") % 2 == 0)
    new = skewed.where(F.col("doc_id") % 2 == 1)
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="skew_probe_")
    table = "skew_probe_minhash_index"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    build_minhash_index(
        old, "text", "doc_id", table, os.path.join(workdir, "index")
    )
    cand = incremental_minhash_candidates(
        spark, new, "text", "doc_id", table
    )
    n_cand = cand.count()
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(workdir, ignore_errors=True)
    ops["incremental_minhash_candidates"] = {
        "sec": round(time.time() - t0, 2), "candidates": n_cand,
    }
    spark.catalog.clearCache()
    skewed.persist().count()

    # keep_best over the planted component: pair list = mega-cluster
    # spanning tree + a chain over the rest is enough to form the
    # component without materializing the quadratic pair set again.
    t0 = time.time()
    span = spark.range(1, planted).select(
        F.lit(0).alias("left_id"), F.col("id").alias("right_id")
    )
    survivors = dedup_keep_best(
        skewed, span, "doc_id", broadcast_drops=False
    )
    n_surv = survivors.count()
    ops["dedup_keep_best"] = {
        "sec": round(time.time() - t0, 2),
        "survivors": n_surv,
        "dropped": n_docs - n_surv,
    }

    # --- round-4 tier (VERDICT r4 item 8) --------------------------------
    # Hot-shingle fuzzy decontamination: one benchmark doc IS the
    # boilerplate template, so every one of its shingles is a ~10%-mass
    # hot key in the train×bench shingle join; the drop set is the whole
    # mega-cluster (corpus-proportional — exercising the un-hinted
    # t_sizes/anti-join path from the r4 verdict fix).
    from ihop_reddit_spark.datapipe.curation import fuzzy_decontaminate

    t0 = time.time()
    bench = spark.createDataFrame(
        [(0, boiler)], "doc_id long, text string"
    )
    clean = fuzzy_decontaminate(
        skewed, bench, "text", "doc_id", n=3, jaccard_threshold=0.5
    )
    n_clean = clean.count()
    ops["fuzzy_decontaminate_hot_shingles"] = {
        "sec": round(time.time() - t0, 2),
        "survivors": n_clean,
        "dropped": n_docs - n_clean,
    }
    spark.catalog.clearCache()

    # Hot-key histogram sketch: 90% of events collapse onto one
    # (event_type, bucket) cell — the partial agg must absorb the hot
    # cell map-side (partials stay support-bounded), and the quantile
    # window stays per-key over the support, never the fact rows.
    from ihop_reddit_spark.datapipe.sketches import (
        histogram_merge,
        histogram_partials,
        histogram_quantiles,
    )

    t0 = time.time()
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_ev = ev.count()
    hot = ev.select(
        F.when(F.col("event_id") % 10 < 9, F.lit("hot"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("event_id") % 10 < 9, F.lit(1.0))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    hist = histogram_merge(
        histogram_partials(hot, ["event_type"], "value"), ["event_type"]
    )
    q = histogram_quantiles(
        hist, ["event_type"], [500, 900, 990]
    )
    n_q = q.count()
    n_support = hist.count()
    ops["histogram_sketch_hot_key"] = {
        "sec": round(time.time() - t0, 2),
        "events": n_ev,
        "support_rows": n_support,
        "quantile_rows": n_q,
    }

    print(json.dumps({
        "sf_dir": sf_dir, "n_docs": n_docs, "planted": planted,
        "ops": ops,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
