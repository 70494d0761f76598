"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with the `noop` sink (full plan runs,
rows are consumed on executors, nothing is collected to the driver — measures
engine throughput, not driver serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "c2v_prep_contexts",          # flagship pipeline (scan→filter→topN→semi→W1→A2)
    "topn_parts_by_lineitems",    # distributed top-k
    "semi_join_topn_flag_counts", # broadcast semi-join
    "order_lineitem_ship_delay",  # fact-to-fact shuffle join + agg
    "order_thread_documents",     # ordered group-concat (A8)
    "user_event_contexts",        # ordered group-concat (A2)
    "exclude_top_users",          # histogram percent-rank (W1)
    "describe_value_by_event_type",
    "doc_quality_features",       # text feature extraction
    "exact_duplicate_groups",     # dedup tier 1
    "ngram_jaccard_pairs",        # dedup tier 4 (similarity join)
    "knn_bruteforce_cosine",      # similarity search
    "asof_purchase_to_click",     # as-of join (union + window)
    "embedding_near_dup_pairs",   # dedup tier 5 (quantized cosine all-pairs)
    "pmi_terms_by_lang",          # M11 distributed PMI labeling
    "multimodal_frame_samples",   # binary columns + Arrow mapInPandas
    "intruder_task_export",       # E2 annotation export
    "corpus_prep_survivors",      # end-to-end corpus prep (capstone)
    # round-3 additions: the curation tier's heaviest composed pipeline and
    # the sharded sequence-packing path (new default) — measured so the
    # north-star tier has per-round perf evidence, not just correctness
    "curated_training_corpus",    # repetition→decontam→mixture→split→pack
    "packed_sequence_bins",       # sharded two-pass packing rebase
    "incremental_minhash_verified_pairs",  # index-tier dedup + exact verify
    "interval_overlap_window_sessions",    # bucket-banded overlap join
    # round-4 retrieval tier: corpus-scale lexical search + LM scoring
    "inverted_index_terms",       # posting-list build (term-keyed shuffle)
    "bm25_topk_docs",             # probe-query ranked search
    "perplexity_buckets_by_lang", # bigram-LM scoring + CCNet bucketing
    # round-4 semantic/passage dedup + data-selection tier
    "winnow_fingerprint_pairs",   # MOSS winnowing shared-passage pairs
    "semantic_dedup_survivors",   # SemDeDup via derandomized sign-LSH
    "dsir_importance_weights",    # DSIR hashed-ngram importance weights
    "duplicate_substring_spans",  # Lee+ ACL'22 substring-level dedup
    # round-5 additions: C4 page-structure dedup, graph ranking, and the
    # mergeable-sketch rollup
    "c4_sentence_span_dedup",     # C4 three-sentence-span dedup
    "pagerank_copurchase_parts",  # 5-iteration integer PageRank
    "hll_sketch_rollup_users",    # DataSketches partial→rollup
    "simhash_candidate_pairs",    # dedup tier 2 (Arrow signature path)
    # round-6 (session 4) additions: coherence pair stats (the heaviest
    # new aggregate), fuzzy eval-set decontamination, and the
    # frequency-sketch read path
    "umass_pair_stats_by_lang",
    "fuzzy_decontaminated_documents",
    "cm_sketch_user_counts",
    # round-5 (session 5) additions: the crawl-extraction stage, the
    # leakage-safe splitting path, and the real animated-GIF codec
    "html_extracted_text",        # WET extraction (pure-JVM projection)
    "dedup_aware_splits",         # component-keyed split assignment
    "gif_decode_gate",            # LZW decode + composition (1-in-41 sample since r6)
    # round-6 additions: the composed crawl flagship and the baseline
    # JPEG codec gate (1-in-7 sample)
    "crawl_corpus",               # extract→gate→dedup→quota→C4→CDC→stages
    "jpeg_decode_gate",           # Huffman + dequant + IDCT decode gate
    # round-6 (session 2) additions: the AVI/MJPEG container gate
    # (1-in-13 sample), the G.711 telephony-audio gate (1-in-11), and
    # the Bloom-prefilter decontamination plan
    "avi_decode_gate",
    "g711_decode_gate",
    "bloom_decontaminated_documents",
    # round-6 (session 3) addition: the merge-on-read deletion-vector
    # lifecycle (row delete → vectored reads → materialize)
    "manifest_dv_lifecycle_counts",
    # round-11 (session 2) additions: blocked entity resolution with the
    # Jaro-Winkler verify tier, and multi-source BFS hop distances over
    # the co-purchase graph (both data-volume-proportional)
    "jaro_winkler_entity_pairs",
    "bfs_distances_copurchase",
]

#: round-10: the STREAMING tier gets a per-round perf series (r9 verdict
#: item 7) — benched as a SEPARATE section (single run each, cost is
#: micro-batch loop + commit fixed overhead, not data volume) so the
#: headline total stays comparable round-over-round while regressions in
#: the foreachBatch/state-table path still become visible.
STREAMING = [
    "stream_domain_quota",     # stateful quota: manifest state, DV evictions
    "stream_crawl_extraction", # pure-projection stream (same plan as batch)
    "stream_catalog_txn_counts",  # atomic multi-table micro-batches + replay
    # round-14: CDC MERGE whose feed grows a column mid-stream + full
    # two-phase replay across the widen (commit-protocol bound)
    "stream_merge_evolution_counts",
]

#: round-11: the NATIVE-CODEC + schema-evolution tier — also a separate
#: single-run section (per-asset C-library work + metadata commits, not
#: data volume) so the headline total stays comparable while the new
#: system-library paths get a per-round perf series.
NATIVE = [
    "manifest_schema_evolution_counts",  # metadata-only ALTER lifecycle
    "avif_decode_gate",                  # AV1 stills (libavif/dav1d)
    "heic_decode_gate",                  # HEVC stills (libheif/libde265+x265)
    "av1_mp4_decode_gate",               # AV1 video, per-sample re-wrap
    "hevc_mp4_decode_gate",              # HEVC video, per-sample re-wrap
    "svg_decode_gate",                   # librsvg+cairo rasterization
    "image_resize_gate",                 # real decode→resample→PNG
    "audio_resample_real_gate",          # real decode→resample→WAV
    "warc_content_encoding_pages",       # gzip/deflate/br/zstd bodies
    "manifest_clone_divergence_counts",  # shallow clone + divergence + vacuum
    "catalog_txn_consistency_counts",    # atomic multi-table transactions
    # round-14: manifest-tier OPTIMIZE ZORDER (row-grain z rewrite +
    # Morton file-pack maintenance; commit/metadata bound)
    "manifest_zorder_compact_counts",
]

#: The 18 queries benched since round 1 — their subtotal is emitted as
#: ``shared_with_r01`` so the round-over-round signal stays comparable
#: as the headline set grows (VERDICT r3 watch item).
R01_SHARED = [
    "c2v_prep_contexts", "topn_parts_by_lineitems",
    "semi_join_topn_flag_counts", "order_lineitem_ship_delay",
    "order_thread_documents", "user_event_contexts", "exclude_top_users",
    "describe_value_by_event_type", "doc_quality_features",
    "exact_duplicate_groups", "ngram_jaccard_pairs",
    "knn_bruteforce_cosine", "asof_purchase_to_click",
    "embedding_near_dup_pairs", "pmi_terms_by_lang",
    "multimodal_frame_samples", "intruder_task_export",
    "corpus_prep_survivors",
]


def _sentinel_sec() -> float:
    """One pinned single-threaded CPU kernel (DuckDB, data-independent,
    fixed size) timed best-of-2 — the box-speed sentinel (VERDICT r12
    item 2). Every bench artifact carries its pre/post readings so
    cross-round ABSOLUTE comparisons can be renormalized mechanically
    (``tools/bench_compare.py``): when the same fixed kernel reads 1.4×
    slower than another round, the box — not the code — drifted. The
    kernel is CPU-bound and allocation-light, so it measures exactly
    the resource Spark task slots contend for."""
    import duckdb

    con = duckdb.connect()
    con.execute("PRAGMA threads=1")
    q = "SELECT sum(cast(i as hugeint)*i) FROM range(30000000) t(i)"
    con.execute("SELECT sum(i) FROM range(100000) t(i)").fetchall()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(q).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    # session.py accepts '*' for this variable; shuffle.partitions needs an int
    shuffle_parts = cpus if cpus.isdigit() else str(os.cpu_count() or 8)

    sentinel_pre = _sentinel_sec()

    from ihop_reddit_spark.session import get_spark_session

    import __spark_entry__ as entrymod

    spark = get_spark_session(
        "bench",
        config={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": shuffle_parts,
        },
        master=f"local[{cpus}]",
    )
    queries = entrymod.queries()

    # Warm the JVM/codegen AND the Arrow Python-worker pool once — on the
    # smallest sibling SF if present, else the bench dir itself — so the
    # measured runs are engine time, not first-call JIT/worker-fork overhead.
    sibling = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm_dir = sibling if os.path.isdir(sibling) else sf_dir
    for warm_q in ("topn_parts_by_lineitems", "embedding_near_dup_pairs"):
        queries[warm_q](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()

    # best-of-N per query (default 2): one JSON number per query that
    # reflects engine throughput, not scheduler/GC jitter of a single run.
    # FAILURE-ISOLATED: a query that throws records an error string instead
    # of a timing and the suite keeps going — one broken query must never
    # zero out the whole round's perf evidence (round 2 lesson: rc=1, no
    # timings at all).
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(max(repeats, 1)):
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001 - isolate per query
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                break
            best = min(best, time.time() - t0)
            # operators persist multi-consumer intermediates scoped to a
            # query; drop them between EVERY run so each repeat is a cold
            # execution (no flattering cache reuse) and caches don't
            # accumulate across the suite
            spark.catalog.clearCache()
        if name not in errors:
            timings[name] = round(best, 3)
        spark.catalog.clearCache()

    # streaming tier: one measured run each (fixed micro-batch/commit
    # overhead dominates; best-of-N would double a long wall-clock for
    # no extra signal), reported OUTSIDE the headline total
    streaming: dict[str, float] = {}
    for name in STREAMING:
        t0 = time.time()
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001 - isolate per query
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        streaming[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()

    # Re-warm the Arrow Python-worker pool before the single-run native
    # tier (r15, VERDICT r14 item 5 — measurement fix, additions-only):
    # the tier runs once per query, so a worker pool gone cold over the
    # long streaming tier shows up as 4-5 s of fork+import noise on
    # whichever codec gate runs first (r14: gif_decode_gate "regressed"
    # 2x on untouched code; this baseline: warc 25 s cold vs 1.7 s
    # steady). Same warmup queries as the suite preamble, tiny SF.
    for warm_q in ("multimodal_frame_samples", "embedding_near_dup_pairs"):
        try:
            queries[warm_q](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 - warmup must never fail the bench
            pass
    spark.catalog.clearCache()

    native: dict[str, float] = {}
    for name in NATIVE:
        t0 = time.time()
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001 - isolate per query
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        native[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "shared_with_r01": round(
            sum(timings.get(q, 0.0) for q in R01_SHARED), 3
        ),
        # coverage count: if < len(R01_SHARED), a shared query errored or
        # was dropped and the subtotal is NOT comparable to prior rounds
        "shared_with_r01_n": sum(1 for q in R01_SHARED if q in timings),
        "streaming": streaming,
        "streaming_total": round(sum(streaming.values()), 3),
        "native": native,
        "native_total": round(sum(native.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # post-run sentinel BEFORE spark.stop(): it must see the same box
    # conditions the measured queries saw (executors still resident)
    sentinel_post = _sentinel_sec()
    result["sentinel"] = {
        "pre": sentinel_pre,
        "post": sentinel_post,
        "min": min(sentinel_pre, sentinel_post),
        "kernel": "duckdb threads=1 sum(i*i) range(30e6) best-of-2",
    }
    if errors:
        # survivors' total is still reported above; failures are explicit
        result["errors"] = errors
        result["n_failed"] = len(errors)
    line = json.dumps(result)
    # Truncation-proofing (r15, VERDICT r14 item 2: the driver wrapper
    # keeps a bounded TAIL of stdout and twice cut the head off this
    # JSON line, nulling a whole round's perf comparison). Two defenses,
    # both additions-only — the stdout contract (ONE JSON line, same
    # keys, same env handling) is unchanged:
    #  1. a sidecar file the wrapper cannot truncate;
    #  2. spark.stop() BEFORE the print, so the JSON is the last thing
    #     on stdout and a tail capture always ends with the full line.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"
            ),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout remains the channel
    try:
        spark.stop()
    except Exception:  # noqa: BLE001 - the artifact must print regardless
        pass
    print(line, flush=True)


if __name__ == "__main__":
    main()
