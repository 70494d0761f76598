"""Subset bench (round 14): time chosen queries with EXACTLY the bench.py
methodology — t0 before query construction (driver-actioned plans count),
noop sink, best-of-N, clearCache between runs, same warm-up — so numbers
are directly comparable to BENCH_r*.json entries without paying for the
whole suite on every optimization iteration.

Usage: python tools/bench_subset.py [--sf DIR] [--repeats N] query [query ...]
Prints one JSON line {"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    shuffle_parts = cpus if cpus.isdigit() else str(os.cpu_count() or 8)

    from ihop_reddit_spark.session import get_spark_session

    import __spark_entry__ as entrymod

    spark = get_spark_session(
        "bench-subset",
        config={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": shuffle_parts,
        },
        master=f"local[{cpus}]",
    )
    queries = entrymod.queries()

    sibling = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")
    warm_dir = sibling if os.path.isdir(sibling) else args.sf
    for warm_q in ("topn_parts_by_lineitems", "embedding_near_dup_pairs"):
        queries[warm_q](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in args.queries:
        if name not in queries:
            errors[name] = "MISSING"
            continue
        spark.sparkContext.setJobDescription(f"bench-subset:{name}")
        best = float("inf")
        for _ in range(max(args.repeats, 1)):
            t0 = time.time()
            try:
                queries[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001 - isolate per query
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                break
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        if name not in errors:
            timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()

    print(json.dumps({"queries": timings, "errors": errors, "sf": args.sf}))
    spark.stop()


if __name__ == "__main__":
    main()
