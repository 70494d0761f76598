"""Single-node engine comparison: run a catalog query on Spark (noop
sink, full plan executes) AND its own DuckDB oracle SQL (result fetched,
discarded) at the same scale factor, timed separately. Both engines get
all cores (DuckDB parallelizes by default; Spark runs local[n]).

The oracles were written for CORRECTNESS parity, not to flatter either
engine — they are idiomatic analytic SQL over the same parquet files, so
the comparison is a fair "same work, same machine" measurement and the
basis for the matches-or-beats-single-node-throughput claim.

Usage: python tools/engine_compare.py [sf_dir] [query ...]
Prints one line per query and a final JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Default set: real work in both engines, no planted-fixture synthesis
#: dominating the clock, spread across tiers.
DEFAULT_QUERIES = [
    "topn_parts_by_lineitems",
    "order_lineitem_ship_delay",
    "exclude_top_users",
    "user_event_contexts",
    "order_thread_documents",
    "rollup_order_status_totals",
    "quantiles_value_by_event_type",
    "hourly_event_counts_gapfilled",
    "event_transition_matrix",
    "cohort_retention_weekly",
    "ks_drift_click_vs_purchase",
    "mad_outliers_value_by_type",
    "exact_duplicate_groups",
    "simhash_candidate_pairs",
    "ngram_jaccard_pairs",
    "winnow_fingerprint_pairs",
    "duplicate_substring_spans",
    "dsir_importance_weights",
    "bm25_topk_docs",
    "knn_bruteforce_cosine",
    "pagerank_copurchase_parts",
    "correlated_subquery_small_quantities",
    "cohens_kappa_event_raters",
    "fleiss_kappa_doc_raters",
    # round-5 tier: crawl extraction / canonicalization / CDC — all
    # pure-expression pipelines both engines run identically
    "html_extracted_text",
    "normalized_url_groups",
    "cdc_chunked_documents",
    "domain_quota_survivors",
    # round-6: the composed crawl flagship (extract→gate→frontier dedup→
    # quota→C4→CDC→curriculum) — the heaviest pure-expression pipeline
    "crawl_corpus",
    # round-6 (session 2): the Bloom-prefilter decontamination plan (the
    # DuckDB side runs the exact-join formulation — same answer) and the
    # G.711 gate (DuckDB replays the ITU expansion formulas in SQL)
    "bloom_decontaminated_documents",
    "g711_decode_gate",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] if len(args) > 1 else DEFAULT_QUERIES

    from ihop_reddit_spark.session import get_spark_session

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_dir}/{t}.parquet'"
        )

    spark = get_spark_session(
        "engine_compare", config={"spark.ui.enabled": "false"}
    )
    # warm the JVM/session so fixed startup cost doesn't bias query 1
    queries["topn_parts_by_lineitems"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in names:
        if name not in oracles:
            continue
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        duck = time.time() - t0
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        sp = time.time() - t0
        out[name] = {
            "duckdb": round(duck, 2),
            "spark": round(sp, 2),
            "spark_over_duck": round(sp / duck, 2) if duck > 0 else None,
        }
        print(
            f"{name:42s} duckdb {duck:7.2f}s  spark {sp:7.2f}s  "
            f"ratio {sp / duck:5.2f}"
        )
    totals = {
        "duckdb_total": round(sum(v["duckdb"] for v in out.values()), 2),
        "spark_total": round(sum(v["spark"] for v in out.values()), 2),
    }
    print(json.dumps({"sf_dir": sf_dir, "queries": out, **totals}))
    spark.stop()


if __name__ == "__main__":
    main()
