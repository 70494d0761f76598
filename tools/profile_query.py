"""Per-query optimization harness (round 14): capture `.explain("formatted")`
into plans/r14/<query>_<tag>.txt and time the query with the noop sink
(guide §1.4), best-of-N, cache-cleared between runs exactly like bench.py.

Usage:
    python tools/profile_query.py [--sf DIR] [--tag before|after] \
        [--repeats N] [--no-time] query [query ...]

Writes plans/r14/<query>_<tag>.txt and prints one line per query:
    <query> <best_sec> <n_exchanges> <join kinds...>
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r14"))
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    shuffle_parts = cpus if cpus.isdigit() else str(os.cpu_count() or 8)

    from ihop_reddit_spark.session import get_spark_session

    import __spark_entry__ as entrymod

    spark = get_spark_session(
        "profile",
        config={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": shuffle_parts,
        },
        master=f"local[{cpus}]",
    )
    queries = entrymod.queries()

    # same warm-up as bench.py so first-query JIT/worker-fork noise is gone
    sibling = os.path.join(
        os.path.dirname(args.sf.rstrip("/")), "sf0.001"
    )
    warm_dir = sibling if os.path.isdir(sibling) else args.sf
    for warm_q in ("topn_parts_by_lineitems", "embedding_near_dup_pairs"):
        queries[warm_q](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()

    for name in args.queries:
        if name not in queries:
            print(f"{name} MISSING")
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = queries[name](spark, args.sf)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"\b(\w*Join\w*)\b", plan))
        )
        pyev = sorted(set(re.findall(
            r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
            r"FlatMapGroupsInPandas)\b", plan)))
        best = None
        if not args.no_time:
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(max(args.repeats, 1)):
                df_run = queries[name](spark, args.sf)
                t0 = time.time()
                df_run.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
        print(
            f"{name} "
            + (f"{best:.3f}s " if best is not None else "")
            + f"exchanges={n_ex} joins={','.join(joins) or '-'} "
            + f"python={','.join(pyev) or '-'}"
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
