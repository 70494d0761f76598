"""Structured Streaming operators: bounded (availableNow) runs must equal
their batch equivalents computed in the same session."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ihop_reddit_spark.functions.event_time import ts_epoch_seconds
from ihop_reddit_spark.streaming.events import (
    user_sessions_stream,
    windowed_event_counts_stream,
)


def _events_batch(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_windowed_counts_equal_batch(spark, sf_dir):
    streamed = windowed_event_counts_stream(spark, sf_dir)
    ev = _events_batch(spark, sf_dir)
    batch = (
        ev.select(ts_epoch_seconds(ev).alias("t"), "event_type")
        .select(
            F.expr("t div 3600 * 3600").alias("window_start_epoch"),
            "event_type",
        )
        .groupBy("window_start_epoch", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = {(r.window_start_epoch, r.event_type): r.cnt for r in streamed.collect()}
    want = {(r.window_start_epoch, r.event_type): r.cnt for r in batch.collect()}
    assert got == want


@pytest.mark.slow
def test_stream_dedup_equals_batch_distinct(spark, sf_dir):
    from ihop_reddit_spark.streaming.events import dedup_events_stream

    streamed = dedup_events_stream(spark, sf_dir)
    batch = _events_batch(spark, sf_dir).select("user_id", "event_type").distinct()
    got = {(r.user_id, r.event_type) for r in streamed.collect()}
    want = {(r.user_id, r.event_type) for r in batch.collect()}
    assert got == want
    assert len(got) == streamed.count()  # exactly one emission per key


@pytest.mark.slow
def test_stream_stream_join_equals_batch_range_join(spark, sf_dir):
    from ihop_reddit_spark.streaming.events import click_purchase_join_stream

    streamed = click_purchase_join_stream(spark, sf_dir)
    raw = _events_batch(spark, sf_dir)
    ev = raw.select(
        "event_id", "user_id", "event_type", ts_epoch_seconds(raw).alias("t")
    )
    p = ev.where("event_type = 'purchase'")
    c = ev.where("event_type = 'click'")
    batch = p.alias("p").join(
        c.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.t") < F.col("p.t"))
        & (F.col("c.t") >= F.col("p.t") - 1800),
    )
    got = {
        (r.purchase_event_id, r.click_event_id, r.user_id, r.gap_s)
        for r in streamed.collect()
    }
    want = {
        (r.pid, r.cid, r.uid, r.pt - r.ct)
        for r in batch.select(
            F.col("p.event_id").alias("pid"),
            F.col("c.event_id").alias("cid"),
            F.col("p.user_id").alias("uid"),
            F.col("p.t").alias("pt"),
            F.col("c.t").alias("ct"),
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_sessions_equal_batch_gaps_and_islands(spark, sf_dir):
    streamed = user_sessions_stream(spark, sf_dir)
    raw = _events_batch(spark, sf_dir)
    batch = raw.select(
        "user_id",
        ts_epoch_seconds(raw).alias("t"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    batch.createOrReplaceTempView("ev_batch")
    islands = spark.sql(
        """
        WITH o AS (
          SELECT user_id, t, v,
                 LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS prev_t
          FROM ev_batch),
        s AS (
          SELECT user_id, t, v,
                 SUM(CASE WHEN prev_t IS NULL OR t - prev_t >= 1800
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY t
                         ROWS UNBOUNDED PRECEDING) AS session_id
          FROM o)
        SELECT user_id, MIN(t) AS session_start_epoch,
               COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS sum_value
        FROM s GROUP BY user_id, session_id
        """
    )
    got = {
        (r.user_id, r.session_start_epoch): (r.n_events, r.sum_value)
        for r in streamed.collect()
    }
    want = {
        (r.user_id, r.session_start_epoch): (r.n_events, r.sum_value)
        for r in islands.collect()
    }
    assert got == want


@pytest.mark.slow
def test_user_running_totals_stateful(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F

    from ihop_reddit_spark.streaming.events import user_running_totals_stream

    out = {r["user_id"]: r for r in user_running_totals_stream(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("qsum_value"),
        )
        .collect()
    }
    assert set(out) == set(batch)
    for uid, row in batch.items():
        assert out[uid]["n_events"] == row["n_events"]
        assert out[uid]["qsum_value"] == row["qsum_value"]


def test_stream_quality_violations_equal_batch(spark, sf_dir):
    from ihop_reddit_spark.streaming.events import quality_violations_stream

    out = {
        r["window_start_epoch"]: r
        for r in quality_violations_stream(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        r["h"]: r
        for r in ev.groupBy(
            ((ts_epoch_seconds(ev) / 3600).cast("long") * 3600).alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("value") <= 0, 1).otherwise(0)).alias("v_val"),
            F.sum(
                F.when(F.get_json_object("props", "$.k").isNull(), 1).otherwise(0)
            ).alias("v_props"),
        )
        .collect()
    }
    assert set(out) == set(batch)
    for h, row in batch.items():
        assert out[h]["n_events"] == row["n_events"]
        assert out[h]["v_value_nonpositive"] == row["v_val"]
        assert out[h]["v_props_missing_k"] == row["v_props"]


@pytest.mark.slow
def test_ranked_parquet_sink_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch ranked sink: output equals the batch top-k, and
    re-running against the same checkpoint is a no-op (exactly-once
    effective semantics — no duplicate or truncated partitions)."""
    from ihop_reddit_spark.operators.windows import top_k_per_group
    from ihop_reddit_spark.streaming.events import ranked_window_parquet_sink

    out = str(tmp_path / "ranked")
    ckpt = str(tmp_path / "ckpt")
    ranked_window_parquet_sink(spark, sf_dir, out, ckpt, k=2)

    got_df = spark.read.parquet(out)
    got = {
        (r.window_start_epoch, r.event_type): (r.cnt, r.rank)
        for r in got_df.collect()
    }

    ev = _events_batch(spark, sf_dir)
    counts = (
        ev.select(ts_epoch_seconds(ev).alias("t"), "event_type")
        .select(
            F.expr("t div 3600 * 3600").alias("window_start_epoch"), "event_type"
        )
        .groupBy("window_start_epoch", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want_df = top_k_per_group(
        counts,
        "window_start_epoch",
        [F.col("cnt").desc(), F.col("event_type").asc()],
        2,
    )
    want = {
        (r.window_start_epoch, r.event_type): (r.cnt, r.rank)
        for r in want_df.collect()
    }
    assert got == want and len(got) > 0

    # replay with the same checkpoint: availableNow sees no new files, the
    # committed output must be byte-identical (no dupes, no truncation)
    ranked_window_parquet_sink(spark, sf_dir, out, ckpt, k=2)
    again = {
        (r.window_start_epoch, r.event_type): (r.cnt, r.rank)
        for r in spark.read.parquet(out).collect()
    }
    assert again == got


@pytest.mark.slow
def test_semantic_dedup_stream_matches_batch_incremental(spark):
    """The streamed survivors must equal the one-shot batch incremental
    result — the per-row drop decision is batch-boundary independent."""
    from pyspark.sql import functions as F

    from ihop_reddit_spark.datapipe.semantic import (
        incremental_semantic_dedup,
        semantic_index_rows,
    )
    from ihop_reddit_spark.streaming.embeddings import semantic_dedup_stream

    sf_dir = "/root/testdata/sf0.001"
    streamed = {
        r["vec_id"] for r in semantic_dedup_stream(spark, sf_dir).collect()
    }
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batch = {
        r["vec_id"]
        for r in incremental_semantic_dedup(
            emb.where(F.col("vec_id") % 2 == 1),
            semantic_index_rows(emb.where(F.col("vec_id") % 2 == 0)),
        ).collect()
    }
    assert streamed == batch and batch


def test_scd2_stream_matches_batch_apply(spark, tmp_path):
    from ihop_reddit_spark.operators.setops import scd2_apply, scd2_init
    from ihop_reddit_spark.streaming.dimensions import scd2_customer_stream

    sf_dir = "/root/testdata/sf0.001"
    got = scd2_customer_stream(
        spark, sf_dir, eff=100, work_dir=str(tmp_path / "scd2")
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    hist = scd2_init(
        cust, ["c_custkey"], ["c_mktsegment", "c_acctbal"], valid_from=0
    )
    delta = cust.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.lit("VIP").alias("c_mktsegment"), "c_acctbal"
    )
    want = scd2_apply(
        hist, delta, ["c_custkey"], ["c_mktsegment", "c_acctbal"], eff=100
    )
    key = lambda r: (r["c_custkey"], r["valid_from"])
    a = sorted(map(tuple, got.collect()), key=lambda t: (t[0], t[3]))
    b = sorted(map(tuple, want.collect()), key=lambda t: (t[0], t[3]))
    assert a == b


def test_eventgen_streaming_datasource(spark, tmp_path):
    from ihop_reddit_spark.sources.zst_datasource import EventGenDataSource

    spark.dataSource.register(EventGenDataSource)
    out = str(tmp_path / "gen")
    batches = []

    def sink(df, bid):
        rows = sorted(tuple(r) for r in df.collect())
        df.write.mode("append").parquet(out)
        # append ONLY after the parquet commit: the monitor loop stops
        # the query once it sees 150 rows here, and appending before
        # the write let q.stop() race the final batch's commit (flaked
        # under full-suite load: 100 of 150 rows landed)
        batches.append(rows)

    import time as _time

    # Python streaming sources don't support availableNow — drive with a
    # tight processing-time trigger and stop once maxRows have landed
    q = (
        spark.readStream.format("eventgen")
        .option("rowsPerBatch", 50)
        .option("maxRows", 150)
        .load()
        .writeStream.foreachBatch(sink)
        .trigger(processingTime="0 seconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    deadline = _time.time() + 60
    while _time.time() < deadline:
        if sum(len(b) for b in batches) >= 150:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    assert len([b for b in batches if b]) >= 3  # multiple micro-batches
    rows = spark.read.parquet(out).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == list(range(150))  # contiguous offsets, no gaps/dupes
    # determinism: re-deriving any row from its index matches
    from ihop_reddit_spark.sources.zst_datasource import _gen_rows

    expect = {t[0]: t for t in _gen_rows(0, 150)}
    for r in rows:
        assert tuple(r) == expect[r["event_id"]]
    assert all(r["event_type"] in
               ("view", "click", "purchase", "refund", "error")
               for r in rows)


def test_histogram_partials_stream_replay_safe(spark, tmp_path):
    """Additive-sketch streaming: batch partials merge to the direct
    histogram, and re-appending a committed batch's rows (at-least-once
    replay) does NOT double-count thanks to the __batch_id dedup."""
    import pyspark.sql.functions as F

    from ihop_reddit_spark.datapipe.sketches import (
        histogram_merge,
        histogram_quantiles,
    )
    from ihop_reddit_spark.streaming.events import (
        histogram_partials_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = histogram_partials_stream(
        spark, sf_dir, str(tmp_path / "partials"), str(tmp_path / "ckpt")
    )
    got = {
        (r["event_type"], r["q_permille"]): r["bucket"]
        for r in out.collect()
    }
    # direct derivation from the raw table
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct_hist = (
        ev.where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 1000).cast("long").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    want = {
        (r["event_type"], r["q_permille"]): r["bucket"]
        for r in histogram_quantiles(
            direct_hist, ["event_type"], [500, 900, 990]
        ).collect()
    }
    assert got == want

    # replay simulation: append a duplicate copy of one committed batch
    partials_path = str(tmp_path / "partials")
    existing = spark.read.parquet(partials_path)
    one_batch = existing.where(
        F.col("__batch_id") == existing.agg(
            F.min("__batch_id")
        ).collect()[0][0]
    )
    one_batch.write.mode("append").parquet(partials_path)
    replayed = (
        spark.read.parquet(partials_path)
        .dropDuplicates(["event_type", "bucket", "__batch_id"])
        .drop("__batch_id")
    )
    merged = histogram_merge(replayed, ["event_type"])
    again = {
        (r["event_type"], r["q_permille"]): r["bucket"]
        for r in histogram_quantiles(
            merged, ["event_type"], [500, 900, 990]
        ).collect()
    }
    assert again == want


def test_stream_crawl_extraction_matches_batch_projection(spark, sf_dir):
    """The crawl-extraction stream (round 6) is the batch projection run
    per micro-batch — identical rows, because the plan has no state and
    no shuffle (append mode, no watermark)."""
    from ihop_reddit_spark.functions.text import html_to_text, link_density
    from ihop_reddit_spark.functions.urls import normalize_url
    from ihop_reddit_spark.plans.query_catalog import (
        QUERIES,
        _crawl_pages,
    )

    streamed = {
        r["doc_id"]: r
        for r in QUERIES["stream_crawl_extraction"](spark, sf_dir).collect()
    }
    batch = (
        _crawl_pages(spark, sf_dir)
        .select(
            "doc_id",
            html_to_text(F.col("html")).alias("clean_text"),
            link_density(F.col("html")).alias("link_density"),
            normalize_url(F.col("url")).alias("canonical_url"),
        )
        .where(F.col("link_density") <= 0.055)
        .collect()
    )
    assert len(batch) == len(streamed) > 0
    for r in batch:
        s = streamed[r["doc_id"]]
        assert (s["clean_text"], s["link_density"], s["canonical_url"]) == (
            r["clean_text"], r["link_density"], r["canonical_url"]
        )


def test_manifest_sink_stream_exactly_once(spark, sf_dir, tmp_path):
    """Micro-batches land as manifest versions; a REPLAYED batch id must
    be a no-op (the foreachBatch at-least-once contract), and the final
    snapshot must equal the batch read."""
    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.events import manifest_sink_stream

    root = manifest_sink_stream(
        spark, sf_dir, str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    batch = _events_batch(spark, sf_dir)
    assert M.read_snapshot(spark, root).count() == batch.count()
    committed = M.committed_stream_batches(root)
    assert committed  # at least one micro-batch landed
    head = M.latest_version(root)

    # simulate the sink's replay path: re-append under an ALREADY
    # COMMITTED batch id through the same guard the sink uses
    bid = next(iter(committed))
    if bid in M.committed_stream_batches(root):
        pass  # the sink's guard: skip — no new version
    else:
        M.manifest_append(batch, root, extra={"stream_batch_id": bid})
    assert M.latest_version(root) == head
    assert M.read_snapshot(spark, root).count() == batch.count()

    # a FRESH batch id does append (the guard is id-based, not blanket)
    M.manifest_append(
        batch.limit(5), root, extra={"stream_batch_id": max(committed) + 1}
    )
    assert M.latest_version(root) == head + 1
    assert max(committed) + 1 in M.committed_stream_batches(root)


def test_dv_delete_stream_exactly_once_and_idempotent(spark, sf_dir, tmp_path):
    """The forget-me stream: delete requests land as deletion vectors
    per micro-batch (no data file rewritten), a replayed batch id skips,
    and a replayed delete is ALSO naturally idempotent — its rows are
    already vectored, so it commits nothing."""
    from pyspark.sql import functions as F

    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.events import dv_delete_stream

    root = dv_delete_stream(
        spark, sf_dir, str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    batch = _events_batch(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    forget = batch.where(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 7 == 0)
    ).select("user_id").distinct()
    want_live = batch.join(forget, "user_id", "left_anti").count()
    assert M.read_snapshot(spark, root).count() == want_live
    # merge-on-read: the seed data files were never rewritten
    assert M.live_files(root) == M.live_files(root, 1)
    assert M.read_snapshot(spark, root, 1).count() == batch.count()
    assert M.committed_stream_batches(root)  # delete batch(es) recorded
    head = M.latest_version(root)

    # replay the SAME delete (fresh batch id, same keys): naturally
    # idempotent — nothing matches, no commit
    v, n = M.manifest_delete_rows(
        spark, root, keys=forget, on="user_id",
        extra={"stream_batch_id": 999},
    )
    assert (v, n) == (head, 0)
    assert M.read_snapshot(spark, root).count() == want_live


@pytest.mark.slow
def test_domain_quota_stream_matches_batch_and_replays(spark, tmp_path):
    """The stateful quota stream: candidates arrive in multiple
    micro-batches (forced orderings that REQUIRE cross-batch eviction),
    yet the final manifest snapshot equals the batch
    ``domain_quota_sample`` on the union — admission is
    content-addressed, never arrival-ordered. Evictions are deletion
    vectors; replaying the whole stream over the same table is a no-op."""
    from ihop_reddit_spark.datapipe.curation import domain_quota_sample
    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.crawl import domain_quota_stream

    # 3 domains x 12 pages; quota 4 → every domain must evict as later
    # batches deliver smaller md5 draws
    rows = [
        (i, f"http://www.site{i % 3}.com/p{i}") for i in range(36)
    ]
    full = spark.createDataFrame(rows, "doc_id long, url string")
    src = str(tmp_path / "cand")
    # deliberately adversarial batching: one file per 12-row slice in
    # doc_id order, so early batches admit rows later draws displace
    for lo in (0, 12, 24):
        full.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 12)
        ).coalesce(1).write.mode("append").parquet(src)
    cand = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    root = domain_quota_stream(
        cand, str(tmp_path / "tbl"), url_col="url", quota=4, salt="tq",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {
        (r["doc_id"], r["url"])
        for r in M.read_snapshot(spark, root).collect()
    }
    want = {
        (r["doc_id"], r["url"])
        for r in domain_quota_sample(full, "url", quota=4, salt="tq").collect()
    }
    assert got == want
    assert len(got) == 12  # 3 domains x quota 4
    # evictions happened as deletion vectors, ATOMIC with the batch's
    # admissions: at least one version doc carries BOTH dv_added and
    # added (the single-commit evict+admit), and every batch landed as
    # exactly one id-carrying commit
    docs = [
        M.read_version_doc(root, v) for v in M.list_versions(root)
    ]
    assert any(d.get("dv_added") and d.get("added") for d in docs)
    assert sorted(
        d["stream_batch_id"] for d in docs if "stream_batch_id" in d
    ) == [0, 1, 2]
    assert all(
        d.get("operation") == "merge" for d in docs if "stream_batch_id" in d
    )
    # the state table is domain-clustered and bloom-indexed: probing one
    # domain's key skips part of the state files (state reads per batch
    # are batch-proportional, not corpus-proportional)
    files = M.live_files(root)
    blooms = M.live_file_blooms(root)
    assert all(blooms.get(f, {}).get("dom") for f in files)
    kept = M._prune_files_eq(spark, files, blooms, {"dom": ["site0.com"]})
    assert 0 < len(kept) < len(files)
    head = M.latest_version(root)

    # full replay over the same state table (fresh checkpoint, same
    # batches): content-addressed admission makes every batch a no-op —
    # recomputed evictions match nothing, recomputed admissions
    # anti-join to empty, and no new version commits
    cand2 = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    domain_quota_stream(
        cand2, str(tmp_path / "tbl"), url_col="url", quota=4, salt="tq",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert M.latest_version(root) == head
    assert {
        (r["doc_id"], r["url"])
        for r in M.read_snapshot(spark, root).collect()
    } == want


@pytest.mark.slow
def test_domain_quota_stream_with_inline_maintenance(spark, tmp_path):
    """maintenance_every folds eviction vectors and bin-packs small
    state files INSIDE the stream loop: the final snapshot still equals
    the batch operator, and the live file count stays bounded instead
    of growing with every micro-batch."""
    from ihop_reddit_spark.datapipe.curation import domain_quota_sample
    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.crawl import domain_quota_stream

    rows = [(i, f"http://www.site{i % 3}.com/p{i}") for i in range(48)]
    full = spark.createDataFrame(rows, "doc_id long, url string")
    src = str(tmp_path / "cand")
    for lo in range(0, 48, 12):
        full.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 12)
        ).coalesce(1).write.mode("append").parquet(src)
    cand = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    root = domain_quota_stream(
        cand, str(tmp_path / "tbl"), url_col="url", quota=4, salt="tq",
        checkpoint_dir=str(tmp_path / "ckpt"), maintenance_every=2,
    )
    got = {
        (r["doc_id"], r["url"])
        for r in M.read_snapshot(spark, root).collect()
    }
    want = {
        (r["doc_id"], r["url"])
        for r in domain_quota_sample(full, "url", quota=4, salt="tq").collect()
    }
    assert got == want
    ops = [
        M.read_version_doc(root, v).get("operation")
        for v in M.list_versions(root)
    ]
    # maintenance actually ran inside the loop
    assert "materialize" in ops or "compact" in ops
    # file count bounded: 4 batches x up-to-3 domain files each would be
    # ~12 without maintenance; packing keeps the live set small
    assert len(M.live_files(root)) <= 6


@pytest.mark.slow
def test_domain_quota_stream_salted_equals_window_path(spark, tmp_path):
    """salted=True routes the per-batch re-rank through the two-phase
    bounded-partial top-k — same final state as the window path and the
    batch operator (mega-domain hardening changes the plan, never the
    survivors)."""
    from ihop_reddit_spark.datapipe.curation import domain_quota_sample
    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.crawl import domain_quota_stream

    rows = [(i, f"http://www.site{i % 2}.com/p{i}") for i in range(30)]
    full = spark.createDataFrame(rows, "doc_id long, url string")
    src = str(tmp_path / "cand")
    for lo in (0, 15):
        full.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 15)
        ).coalesce(1).write.mode("append").parquet(src)
    cand = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    root = domain_quota_stream(
        cand, str(tmp_path / "tbl"), url_col="url", quota=3, salt="sq",
        checkpoint_dir=str(tmp_path / "ckpt"), salted=True, n_salts=4,
    )
    got = {
        (r["doc_id"], r["url"])
        for r in M.read_snapshot(spark, root).collect()
    }
    want = {
        (r["doc_id"], r["url"])
        for r in domain_quota_sample(full, "url", quota=3, salt="sq").collect()
    }
    assert got == want and len(got) == 6


@pytest.mark.slow
def test_domain_quota_stream_redelivered_urls_hold_one_slot(spark, tmp_path):
    """Re-crawled pages are the NORMAL case: a later batch re-delivering
    an already-admitted URL must occupy ONE slot in the re-rank pool,
    not two — batch 2 re-delivers ALL of batch 1 plus new pages, and the
    final state still equals the batch operator on the distinct union
    (a duplicated survivor would wrongly evict the quota-th page and
    leave domains under quota)."""
    from ihop_reddit_spark.datapipe.curation import domain_quota_sample
    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.crawl import domain_quota_stream

    first = [(i, f"http://www.site{i % 2}.com/p{i}") for i in range(10)]
    extra = [(i, f"http://www.site{i % 2}.com/p{i}") for i in range(10, 20)]
    b1 = spark.createDataFrame(first, "doc_id long, url string")
    b2 = spark.createDataFrame(first + extra, "doc_id long, url string")
    src = str(tmp_path / "cand")
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    cand = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    root = domain_quota_stream(
        cand, str(tmp_path / "tbl"), url_col="url", quota=3, salt="rq",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {
        (r["doc_id"], r["url"])
        for r in M.read_snapshot(spark, root).collect()
    }
    full = spark.createDataFrame(first + extra, "doc_id long, url string")
    want = {
        (r["doc_id"], r["url"])
        for r in domain_quota_sample(
            full.dropDuplicates(["url"]), "url", quota=3, salt="rq"
        ).collect()
    }
    assert got == want
    assert len(got) == 6  # 2 domains x quota 3 — never under quota


def test_catalog_txn_stream_atomic_exactly_once(spark, tmp_path):
    """Multi-table streaming sink: each micro-batch is ONE catalog
    transaction (fact + rollup together); a full checkpoint-free replay
    is skipped batch-by-batch as a unit, and the final state equals the
    batch twin computed directly."""
    from ihop_reddit_spark.sources import catalog as C
    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.events import catalog_txn_stream

    data = spark.range(0, 300).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 3).alias("v"),
    )
    src_dir = str(tmp_path / "src")
    data.repartition(3).write.parquet(src_dir)
    fact = str(tmp_path / "fact")
    roll = str(tmp_path / "roll")
    cat = str(tmp_path / "cat")
    M.manifest_init(fact)
    M.manifest_init(roll)
    C.catalog_init(cat, {"fact": fact, "roll": roll})

    def rollup(b):
        return b.groupBy("g").agg(F.sum("v").cast("long").alias("s"))

    def run():
        src = (
            spark.readStream.schema(data.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        catalog_txn_stream(src, cat, "fact", "roll", rollup)

    run()
    n_cat = C.catalog_latest(cat)
    assert n_cat == 3  # one txn per micro-batch
    assert C.catalog_committed_stream_batches(cat) == {0, 1, 2}

    run()  # full replay, no checkpoint: every batch skipped as a unit
    assert C.catalog_latest(cat) == n_cat  # nothing re-committed

    # stream ≡ batch, and fact/rollup agree per group
    got_fact = {
        (r["g"], r["s"])
        for r in C.read_catalog_table(spark, cat, "fact")
        .groupBy("g")
        .agg(F.sum("v").cast("long").alias("s"))
        .collect()
    }
    got_roll = {
        (r["g"], r["s"])
        for r in C.read_catalog_table(spark, cat, "roll")
        .groupBy("g")
        .agg(F.sum("s").cast("long").alias("s"))
        .collect()
    }
    want = {
        (r["g"], r["s"])
        for r in data.groupBy("g")
        .agg(F.sum("v").cast("long").alias("s"))
        .collect()
    }
    assert got_fact == want and got_roll == want


@pytest.mark.slow
def test_merge_into_stream_multi_batch_and_replay(spark, sf_dir, tmp_path):
    """Streaming CDC-apply via the full conditional MERGE: additive
    updates accumulate across REAL micro-batches (3 source files,
    maxFilesPerTrigger=1), forget requests delete atomically with the
    same batch's updates, and a full replay from a fresh checkpoint
    changes nothing (every batch id already committed)."""
    from pyspark.sql import functions as F

    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.events import merge_into_stream

    root = merge_into_stream(
        spark, sf_dir, str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id").isNotNull()
    )
    want = {
        (r["k"], r["v"])
        for r in ev.groupBy(F.col("user_id").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("v"),
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("user_id") % 7 == 0)
                ).cast("int")
            ).alias("f"),
        )
        .where(F.col("f") == 0)
        .select("k", "v")
        .collect()
    }
    got = {
        (r["k"], r["v"])
        for r in M.read_snapshot(spark, root).collect()
    }
    assert got == want
    assert len(M.committed_stream_batches(root)) >= 2  # real multi-batch
    head = M.latest_version(root)
    # full replay, fresh checkpoint: exactly-once, head untouched
    merge_into_stream(
        spark, sf_dir, root, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    assert M.latest_version(root) == head
    assert {
        (r["k"], r["v"])
        for r in M.read_snapshot(spark, root).collect()
    } == want


@pytest.mark.slow
def test_merge_into_stream_partial_resume_fresh_checkpoint(
    spark, sf_dir, tmp_path
):
    """ADVICE r12: exactly-once must survive resuming a PARTIALLY
    completed run with a FRESH checkpoint. The idempotency key is the
    batch's content identity (event_id min/max/count of its slice), so
    a pre-applied file is skipped no matter what batch id a new
    checkpoint assigns it — with raw batch ids, a reordered enumeration
    could re-apply it (the additive update is not idempotent)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.events import merge_into_stream

    # full run once — yields the staged immutable source dir + the
    # closed-form final state
    done = merge_into_stream(
        spark, sf_dir, str(tmp_path / "done"),
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    want = {
        (r["k"], r["v"])
        for r in M.read_snapshot(spark, done).collect()
    }
    src_dir = os.path.join(done, "_cdc_src")  # staged WITH the table
    files = sorted(
        f for f in os.listdir(src_dir) if f.endswith(".parquet")
    )
    assert len(files) >= 2

    # simulate the partial run: seed a second table the way the stream
    # does, apply ONLY the first file's merge, record its FILE key
    part = str(tmp_path / "partial")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select("event_id", "user_id", "event_type")
    )
    M.manifest_init(part)
    M.manifest_append(
        ev.select(F.col("user_id").alias("k"))
        .distinct()
        .withColumn("v", F.lit(0).cast("long"))
        .repartition(4),
        part,
    )
    # first NON-EMPTY slice (the deterministic mod-carve may leave a
    # hash-collided partition empty; empty batches are skipped whole)
    b0 = key0 = None
    for f in files:
        cand = spark.read.parquet(os.path.join(src_dir, f))
        ident = cand.agg(
            F.min("event_id"), F.max("event_id"), F.count(F.lit(1))
        ).collect()[0]
        if ident[2] > 0:
            b0 = cand
            key0 = f"slice:{ident[0]}:{ident[1]}:{ident[2]}"
            break
    assert b0 is not None
    src0 = b0.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("user_id") % 7 == 0)
            ).cast("int")
        ).alias("forget"),
    )
    M.manifest_merge_into(
        spark, part, src0, "k",
        matched_delete_condition="s.forget = 1",
        matched_update={"v": F.expr("t.v + s.n")},
        extra={"stream_batch_id": key0},
    )
    mid_head = M.latest_version(part)

    # resume with a FRESH checkpoint: the table-local staged source is
    # reused (same carve regardless of what n a resume would pass), the
    # applied file must be skipped, the remaining files applied once
    shutil.copytree(src_dir, os.path.join(part, "_cdc_src"))
    merge_into_stream(
        spark, sf_dir, part, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    got = {
        (r["k"], r["v"])
        for r in M.read_snapshot(spark, part).collect()
    }
    assert got == want
    # and the pre-applied file's merge did not land twice
    keys = M.committed_stream_batches(part)
    assert key0 in keys
    assert all(str(k).startswith("slice:") for k in keys)
    assert M.latest_version(part) > mid_head


@pytest.mark.slow
def test_merge_into_stream_carve_one_bucket_per_file(
    spark, sf_dir, tmp_path
):
    """ADVICE r13: the staged CDC source is carved with partitionBy,
    so every slice file holds exactly ONE bucket's rows and every
    non-empty bucket gets its own file — a bare hash repartition on
    the bucket expression could collide several buckets into one
    partition and leave others empty, silently degrading the
    multi-batch contract."""
    import os

    from pyspark.sql import functions as F

    from ihop_reddit_spark.streaming.events import merge_into_stream

    root = merge_into_stream(
        spark, sf_dir, str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"), n_source_files=3,
    )
    src_dir = os.path.join(root, "_cdc_src")
    files = sorted(
        f for f in os.listdir(src_dir) if f.endswith(".parquet")
    )
    assert len(files) >= 2
    seen_buckets = set()
    total = 0
    for f in files:
        pdf = spark.read.parquet(os.path.join(src_dir, f))
        rows = pdf.count()
        assert rows > 0  # no empty slices survive staging
        total += rows
        buckets = {
            r[0]
            for r in pdf.select(
                (F.col("event_id") % 3).cast("int")
            ).distinct().collect()
        }
        assert len(buckets) == 1  # one bucket per file
        seen_buckets |= buckets
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id").isNotNull()
    )
    assert total == ev.count()  # carve is a partition of the events
    assert seen_buckets == {0, 1, 2}


@pytest.mark.slow
def test_merge_into_stream_honors_legacy_int_batch_ids(
    spark, sf_dir, tmp_path
):
    """ADVICE r13: a pre-content-key table committed POSITIONAL int
    batch ids; resuming it must skip those batches instead of
    double-applying the additive update. With every positional id
    pre-committed, the stream must be a complete no-op regardless of
    file enumeration order."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ihop_reddit_spark.sources import manifest as M
    from ihop_reddit_spark.streaming.events import merge_into_stream

    done = merge_into_stream(
        spark, sf_dir, str(tmp_path / "donor"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    src_dir = os.path.join(done, "_cdc_src")
    n_files = len(
        [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select("event_id", "user_id", "event_type")
    )
    legacy = str(tmp_path / "legacy")
    M.manifest_init(legacy)
    seed = (
        ev.select(F.col("user_id").alias("k"))
        .distinct()
        .withColumn("v", F.lit(0).cast("long"))
    )
    M.manifest_append(seed.repartition(4), legacy)
    # the legacy scheme: every batch already committed under its int id
    M.manifest_append(
        seed.limit(0), legacy,
        extra={"stream_batch_ids": list(range(n_files))},
    )
    baseline = {
        (r["k"], r["v"])
        for r in M.read_snapshot(spark, legacy).collect()
    }
    head = M.latest_version(legacy)

    shutil.copytree(src_dir, os.path.join(legacy, "_cdc_src"))
    merge_into_stream(
        spark, sf_dir, legacy, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    assert M.latest_version(legacy) == head  # nothing re-applied
    assert {
        (r["k"], r["v"])
        for r in M.read_snapshot(spark, legacy).collect()
    } == baseline
