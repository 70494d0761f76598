"""Structured Streaming surface over the events table (SURVEY §2.12).

The reference is strictly monthly batch; these are the engine's streaming
mappings of its time semantics (P5 range predicates → watermark + event-time
filter; A1 top-N → windowed counts; A8 thread assembly → session windows).

Each operator exists in two forms with IDENTICAL semantics:

* ``*_stream`` — a Structured Streaming query (readStream → watermark →
  windowed agg). For bounded verification it runs with
  ``trigger(availableNow=True)`` into a memory sink and returns the final
  table — proving the streaming plan computes the same answer as batch.
* the batch equivalent is the SQL oracle in the query catalog (tumbling
  window = epoch div; session window = gaps-and-islands), so the driver's
  DuckDB gate covers the streaming operators too.

At production scale the same code pointed at a Kafka/file source with a real
trigger is incremental: state-store-backed windowed aggs, watermark-bounded
state eviction.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.event_time import ts_epoch_seconds, ts_event_time


def _event_stream(
    spark: SparkSession, sf_dir: str, stream_dir: str | None = None
) -> DataFrame:
    """File-source stream of the events table with a proper event-time col.

    The file source only accepts directories; the testdata table is a single
    parquet file, so expose it through a symlink inside a temp dir (zero
    copy). Real deployments point this at the landing directory / Kafka.

    ``stream_dir`` pins the source directory; checkpointed queries MUST pass
    a stable one — the checkpoint records source paths, so a fresh temp dir
    on restart would not match the committed offsets.

    readStream needs a declared schema; take it from a batch footer read of
    the same file so the stream follows whatever the parquet actually stores
    (LONG nanoseconds vs timestamp[us] — see ``functions/event_time.py``)
    instead of hard-coding one generation's encoding.
    """
    import os
    import tempfile

    if stream_dir is None:
        stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    else:
        os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = spark.readStream.schema(schema).parquet(stream_dir)
    return raw.withColumn("event_time", ts_event_time(raw))


def _run_to_memory(
    windowed: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    """Execute a bounded streaming query to completion (availableNow) into a
    memory sink; return the materialized result."""
    sink = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        windowed.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def windowed_event_counts_stream(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window counts per event_type (streaming A1).

    Batch-equivalent: ``floor(epoch/3600)*3600`` bucket counts — the SQL
    oracle in the catalog. Watermark bounds state at production scale.
    """
    ev = _event_stream(spark, sf_dir)
    windowed = (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "cnt",
        )
    )
    return _run_to_memory(windowed, spark)


def user_sessions_stream(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per user (streaming A8 analog): events within ``gap``
    of each other merge into one session.

    Batch-equivalent: gaps-and-islands (lag + cumulative new-session flags) —
    the SQL oracle. ``session_window`` keeps per-user open-session state,
    evicted past the watermark.
    """
    ev = _event_stream(spark, sf_dir)
    sessions = (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias(
                "session_start_epoch"
            ),
            "n_events",
            "sum_value",
        )
    )
    return _run_to_memory(sessions, spark)


def user_running_totals_stream(
    spark: SparkSession,
    sf_dir: str,
) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    ``applyInPandasWithState`` (the arbitrary-state API — what session/window
    aggs can't express: hand-managed per-key state with timeouts).

    State = (n_events, qsum_value) where qsum is the int64 sum of
    floor(value·10⁴) — exact, order-independent, oracle-comparable (the batch
    SQL oracle computes the same quantized sum). Each micro-batch folds its
    Arrow batches into the state and emits the updated totals; at production
    scale the same code with a processing-time timeout evicts idle users.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = _event_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        n, qsum = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            qsum += int(np.floor(pdf["value"].to_numpy() * 10000.0).sum())
        state.update((n, qsum))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "qsum_value": [qsum]}
        )

    totals = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, qsum_value long",
        stateStructType="n long, qsum long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        totals.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode sink may hold one row per key per micro-batch; the LATEST
    # emission is the one with the highest n_events (event counts are
    # monotone even when value sums are not — negative values must not
    # tempt a max(qsum))
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr("max_by(qsum_value, n_events)").alias("qsum_value"),
        )
    )


def dedup_events_stream(
    spark: SparkSession,
    sf_dir: str,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup (the streaming face of dedup tier 1): keep the
    first arrival per ``keys``, state bounded by the event-time watermark.

    This is how a training-data pipeline dedups a live ingest feed:
    ``dropDuplicates`` over the dedup key holds one state entry per key and
    emits only first-seen rows; the watermark evicts state for keys whose
    event time has passed, so state is bounded by (keys active within the
    watermark horizon), not the full history. WHICH physical row survives
    is arrival-order dependent, so the returned projection is the KEY SET
    only — deterministic and hash-gateable (batch oracle:
    ``SELECT DISTINCT keys FROM events``); downstream consumers that need
    payload columns pick a deterministic witness per key (min event_id) as
    ``exact_duplicates`` does in batch.
    """
    ev = _event_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("event_time", watermark)
        .dropDuplicates(list(keys))
        .select(*keys)
    )
    return _run_to_memory(deduped, spark, output_mode="append")


def click_purchase_join_stream(
    spark: SparkSession,
    sf_dir: str,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: every (purchase, preceding click)
    pair per user within ``lookback`` — the streaming face of the batch
    ``range_join`` (J3+P5).

    Both sides are independent streams with their own event-time watermark;
    the join condition carries the time-range constraint
    (``click < purchase <= click + lookback``), which is what lets the state
    store evict buffered rows: a click older than
    ``watermark + lookback`` can never match a future purchase, so per-key
    state is bounded by the lookback horizon, not the stream history. The
    join co-partitions both streams on ``user_id`` (one shuffle each side);
    no broadcast — both sides are unbounded.

    Batch oracle: plain self-join of events on second-floored epochs (the
    stream's event_time is second-truncated — ``ts_event_time`` — so second
    precision is the shared clock).
    """
    clicks = (
        _event_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("c_user"),
            F.col("event_time").alias("click_time"),
        )
        .withWatermark("click_time", watermark)
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("event_time").alias("purchase_time"),
        )
        .withWatermark("purchase_time", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""
            p_user = c_user
            AND click_time < purchase_time
            AND click_time >= purchase_time - INTERVAL {lookback}
            """
        ),
        "inner",
    ).select(
        "purchase_event_id",
        "click_event_id",
        F.col("p_user").alias("user_id"),
        (
            F.unix_timestamp("purchase_time") - F.unix_timestamp("click_time")
        ).alias("gap_s"),
    )
    return _run_to_memory(joined, spark, output_mode="append")


def windowed_top_event_types_stream(
    spark: SparkSession,
    sf_dir: str,
    k: int = 2,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming A1 top-N: per event-time window, the k most frequent event
    types (count desc, type asc).

    Streaming DataFrames don't support rank windows, so the plan is the
    standard two-stage shape: the STREAMING stage maintains watermarked
    windowed counts (all state bounded by the watermark); the per-window
    top-k rank runs at the SINK EDGE over the emitted counts — at
    production scale that edge is foreachBatch writing ranked parquet per
    trigger, here the bounded availableNow result table.
    """
    from ..operators.windows import top_k_per_group

    ev = _event_stream(spark, sf_dir)
    counts = (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "cnt",
        )
    )
    emitted = _run_to_memory(counts, spark)
    out = top_k_per_group(
        emitted,
        "window_start_epoch",
        [F.col("cnt").desc(), F.col("event_type").asc()],
        k,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


def enriched_event_counts_stream(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a STATIC
    dimension (per-type aggregate weights computed batch-side) before the
    windowed aggregation — the standard "enrich the feed with reference
    data" pattern.

    A static side needs no watermark and keeps no join state: Spark
    re-plans it per micro-batch (broadcast at dim size), so the stream
    side never shuffles for the join. Batch oracle: identical join + group
    in SQL.
    """
    static_dim = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("type_total"))
    )
    ev = _event_stream(spark, sf_dir)
    windowed = (
        ev.join(F.broadcast(static_dim), "event_type")
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("type_total").alias("type_total"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "cnt",
            "type_total",
        )
    )
    return _run_to_memory(windowed, spark)


def windowed_approx_users_stream(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
    rsd: float = 0.05,
) -> DataFrame:
    """Streaming HLL: approx distinct users per event-time window — the
    streaming twin of the batch ``approx_distinct_users_by_type`` gate.
    Sketch state is constant per window (vs exact distinct's
    per-key-per-window state — THE scale difference for high-cardinality
    keys on unbounded streams). The bounded run joins the batch-exact
    counts and emits a tolerance boolean — |approx − exact| ≤
    max(15%·exact, 5) — so the driver hash-gates the sketch's accuracy,
    not its raw value. The absolute floor covers small windows, where
    HLL's ±1–3 noise (measured: max 3 at sf0.01) exceeds any relative
    band; the relative bound governs real window populations.
    """
    ev = _event_stream(spark, sf_dir)
    windowed = (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration))
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "approx_users",
        )
    )
    streamed = _run_to_memory(windowed, spark)

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = (
        batch.select(
            ((ts_epoch_seconds(batch) / 3600).cast("long") * 3600).alias(
                "window_start_epoch"
            ),
            "user_id",
        )
        .groupBy("window_start_epoch")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return streamed.join(exact, "window_start_epoch").select(
        "window_start_epoch",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(0.15 * F.col("exact_users"), F.lit(5.0))
        ).alias("within_tol"),
    )


def ranked_window_parquet_sink(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_dir: str,
    k: int = 2,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
) -> None:
    """The production sink edge for streaming top-N: ``foreachBatch``
    writing per-window ranked parquet with EXACTLY-ONCE file semantics.

    The streaming stage maintains watermarked windowed counts (state
    bounded by the watermark); each micro-batch ranks the emitted counts
    (the rank is a per-window top-k over batch-local rows — no unbounded
    state) and overwrites ONLY the window partitions present in the batch
    (dynamic partitionOverwriteMode). Idempotence is what upgrades
    Structured Streaming's at-least-once ``foreachBatch`` contract to
    exactly-once effective semantics: a replayed batch after a failure
    rewrites the same partitions with the same deterministic rows, and the
    checkpoint guarantees a committed batch is never re-emitted with less
    data. Readers see whole partitions atomically by window_start_epoch.
    """
    from ..operators.windows import top_k_per_group

    # source dir derived from the checkpoint: restarts resume against the
    # SAME committed source paths (a fresh temp dir would break replay)
    ev = _event_stream(spark, sf_dir, stream_dir=f"{checkpoint_dir}_src")
    counts = (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "cnt",
        )
    )

    def write_ranked(batch_df: DataFrame, batch_id: int) -> None:
        ranked = top_k_per_group(
            batch_df,
            "window_start_epoch",
            [F.col("cnt").desc(), F.col("event_type").asc()],
            k,
        ).withColumn("rank", F.col("rank").cast("long"))
        session = batch_df.sparkSession
        prev = session.conf.get("spark.sql.sources.partitionOverwriteMode")
        session.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                ranked.write.mode("overwrite")
                .partitionBy("window_start_epoch")
                .parquet(out_path)
            )
        finally:
            session.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    q = (
        counts.writeStream.foreachBatch(write_ranked)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sliding_event_counts_stream(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding event-time windows: each event lands in duration/slide
    overlapping buckets (state bounded by watermark + window length).

    Batch-equivalent for the oracle: every event contributes one row per
    covering window start (an unnest over the k covering starts).
    """
    ev = _event_stream(spark, sf_dir)
    windowed = (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration, slide), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "cnt",
        )
    )
    return _run_to_memory(windowed, spark)


def quality_violations_stream(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming data-quality monitor: per-window violation counts for the
    same rule style as ``datapipe/quality.constraint_report``, continuously
    over the ingest stream (alert when a window's violation rate spikes —
    the online half of the batch promotion gate).

    Conditional sums ride the one windowed aggregation — adding rules adds
    expressions, not state; watermark bounds state size. Wide one-row-per-
    window output keeps the streaming sink schema static.
    """
    ev = _event_stream(spark, sf_dir)
    windowed = (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("value") <= 0, 1).otherwise(0)
            ).cast("long").alias("v_value_nonpositive"),
            F.sum(
                F.when(
                    F.get_json_object("props", "$.k").isNull(), 1
                ).otherwise(0)
            ).cast("long").alias("v_props_missing_k"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "n_events",
            "v_value_nonpositive",
            "v_props_missing_k",
        )
    )
    return _run_to_memory(windowed, spark)


def histogram_partials_stream(
    spark: SparkSession,
    sf_dir: str,
    partials_path: str,
    checkpoint_dir: str,
    *,
    quantize: int = 1000,
    quantiles_permille: list[int] | None = None,
) -> DataFrame:
    """Streaming build of the MERGEABLE histogram sketch table
    (``datapipe/sketches.py``): each micro-batch appends its own
    support-bounded partial (``event_type, bucket, n, __batch_id``) via
    ``foreachBatch``; the read side merges all partials and answers
    quantiles — never a second scan of the raw stream.

    Replay safety for an ADDITIVE sketch (unlike HLL's idempotent
    register-max, summing a replayed batch would double-count): rows
    carry ``__batch_id``, and the merge first collapses exact duplicate
    ``(batch, keys, bucket)`` rows, so an at-least-once re-emission of a
    committed batch merges to the same totals. Returns the merged
    per-event-type quantile frame (q ∈ ``quantiles_permille``).
    """
    import os

    from ..datapipe.sketches import (
        histogram_merge,
        histogram_partials,
        histogram_quantiles,
    )

    qs = quantiles_permille or [500, 900, 990]
    ev = _event_stream(spark, sf_dir, stream_dir=f"{checkpoint_dir}_src")

    def write_partial(batch_df: DataFrame, batch_id: int) -> None:
        part = histogram_partials(
            batch_df, ["event_type"], "value", quantize=quantize
        ).withColumn("__batch_id", F.lit(batch_id).cast("long"))
        part.write.mode("append").parquet(partials_path)

    q = (
        ev.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(partials_path):
        raise RuntimeError("stream produced no partials")
    partials = (
        spark.read.parquet(partials_path)
        .dropDuplicates(["event_type", "bucket", "__batch_id"])
        .drop("__batch_id")
    )
    merged = histogram_merge(partials, ["event_type"])
    return histogram_quantiles(
        merged, ["event_type"], qs, quantize=quantize
    )


def manifest_sink_stream(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    *,
    checkpoint_dir: str | None = None,
) -> str:
    """Stream the events source into a VERSIONED MANIFEST TABLE: each
    micro-batch commits one manifest version via foreachBatch, with the
    stream batch id recorded in the commit doc — a replayed batch (the
    foreachBatch at-least-once contract) finds its id in
    :func:`~ihop_reddit_spark.sources.manifest.committed_stream_batches`
    and skips, making the sink effectively exactly-once (the same
    transactional pattern as the ranked parquet sink, now with snapshot
    isolation and time travel on the landing table for free: downstream
    incremental consumers read ``read_changes`` between their own runs).

    Returns ``table_path`` (the table is initialized here if absent).
    """
    import os

    from ..sources import manifest as M

    if not os.path.isdir(os.path.join(table_path, "_manifest")):
        M.manifest_init(table_path)

    ev = _event_stream(
        spark,
        sf_dir,
        stream_dir=None if checkpoint_dir is None else f"{checkpoint_dir}_src",
    ).drop("event_time")

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in M.committed_stream_batches(table_path):
            return  # replayed batch — already committed, exactly-once
        M.manifest_append(
            batch_df, table_path, extra={"stream_batch_id": int(batch_id)}
        )

    writer = ev.writeStream.foreachBatch(append_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return table_path


def dv_delete_stream(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    *,
    checkpoint_dir: str | None = None,
) -> str:
    """The GDPR forget-me STREAM: delete requests arrive as data (here:
    the user ids of 'purchase' events with ``user_id % 7 == 0``) and
    each micro-batch lands as a DELETION VECTOR on the manifest table —
    no data file rewritten, the key set distributed end to end
    (``manifest_delete_rows(keys=...)`` semi-join, never a driver
    IN-list), the stream batch id recorded in the vector commit.

    Exactly-once twice over: a replayed batch id is skipped via
    :func:`~ihop_reddit_spark.sources.manifest.committed_stream_batches`,
    and a replayed delete is ALSO naturally idempotent — its rows are
    already vectored, so it matches nothing and commits nothing.

    The table is seeded with the full events slice (batch append) if
    absent. Returns ``table_path``."""
    import os

    from ..sources import manifest as M
    from ..sources.reddit import read_parquet_tables

    if not os.path.isdir(os.path.join(table_path, "_manifest")):
        M.manifest_init(table_path)
        seed = read_parquet_tables(spark, sf_dir, ["events"])[
            "events"
        ].select("event_id", "user_id", "event_type")
        M.manifest_append(seed.repartition(4), table_path)

    requests = (
        _event_stream(
            spark,
            sf_dir,
            stream_dir=(
                None if checkpoint_dir is None else f"{checkpoint_dir}_src"
            ),
        )
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("user_id") % 7 == 0)
        )
        .select("user_id")
    )

    def delete_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in M.committed_stream_batches(table_path):
            return  # replayed batch — already committed
        M.manifest_delete_rows(
            batch_df.sparkSession,
            table_path,
            keys=batch_df.distinct(),
            on="user_id",
            extra={"stream_batch_id": int(batch_id)},
        )

    writer = requests.writeStream.foreachBatch(delete_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return table_path


def catalog_txn_stream(
    src: DataFrame,
    cat: str,
    fact_table: str,
    rollup_table: str,
    rollup_fn,
) -> None:
    """Exactly-once MULTI-TABLE streaming sink: each micro-batch lands
    the raw batch in ``fact_table`` AND ``rollup_fn(batch)`` in
    ``rollup_table`` as ONE atomic catalog transaction
    (:mod:`ihop_reddit_spark.sources.catalog`), with the stream batch
    id recorded in the catalog doc itself.

    This is the guarantee a per-table transactional sink cannot give:
    with two independent table logs, a crash between the two appends
    leaves the fact half visible and the rollup half missing, and the
    replayed batch must reason about each table separately. Here the
    catalog doc is the single atomic point — a replay finds its id in
    :func:`~ihop_reddit_spark.sources.catalog.
    catalog_committed_stream_batches` and skips the WHOLE transaction,
    or finds nothing and re-runs the WHOLE transaction; the torn state
    cannot be observed (a die-after-doc batch is completed by the next
    reader's roll-forward).

    Per-batch cost: staging writes for both tables + one catalog doc +
    two table docs (roll-forward) — commit work is O(1) in table size,
    the same fixed-cost discipline as the single-table manifest sink.
    """
    from ..sources import catalog as C

    def txn_batch(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in C.catalog_committed_stream_batches(cat):
            return  # replayed batch — the guard covers BOTH tables
        t = C.CatalogTransaction(cat)
        t.append(fact_table, batch_df)
        t.append(rollup_table, rollup_fn(batch_df))
        t.commit(extra={"stream_batch_id": int(batch_id)})

    q = (
        src.writeStream.foreachBatch(txn_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _stage_slices(df: DataFrame, src_dir: str, bucket_expr, n: int) -> None:
    """Stage ``df`` as deterministic slice files under ``src_dir`` for a
    file-per-micro-batch CDC source, one bucket per file.

    partitionBy (not a bare hash repartition): ``repartition(n,
    bucket_expr)`` HASH-partitions the bucket VALUE, so several buckets
    can collide into one task while others stay empty — fewer than n
    non-empty slices, silently weakening the multi-batch contract
    (ADVICE r13). partitionBy guarantees every non-empty bucket lands
    in its own directory whatever the task placement; the single
    repartition keeps it one Spark job. Bucket dirs are then FLATTENED
    to ``slice-<bucket>-<i>.parquet`` files (partitionBy already
    excludes the bucket column from the data, so the flat files carry
    exactly ``df``'s schema). Stage-then-rename: a crash mid-staging
    must not leave a partial dir a rerun would mistake for the
    complete source.
    """
    import os
    import shutil

    tmp = f"{src_dir}.staging"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        df.withColumn("__bucket", bucket_expr.cast("int"))
        .repartition(n, "__bucket")
        .write.partitionBy("__bucket")
        .parquet(tmp)
    )
    flat = f"{src_dir}.flat"
    shutil.rmtree(flat, ignore_errors=True)
    os.makedirs(flat)
    n_slices = 0
    for d in sorted(os.listdir(tmp)):
        if not d.startswith("__bucket="):
            continue
        b = int(d.split("=", 1)[1])
        for i, fn in enumerate(
            sorted(
                f
                for f in os.listdir(os.path.join(tmp, d))
                if f.endswith(".parquet")
            )
        ):
            os.rename(
                os.path.join(tmp, d, fn),
                os.path.join(flat, f"slice-{b:05d}-{i}.parquet"),
            )
            n_slices += 1
    shutil.rmtree(tmp, ignore_errors=True)
    assert n_slices >= 2, (
        f"CDC source staged only {n_slices} non-empty slice(s) — "
        "multi-batch sequencing requires at least 2"
    )
    os.rename(flat, src_dir)


def merge_into_stream(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    *,
    checkpoint_dir: str | None = None,
    n_source_files: int = 3,
) -> str:
    """Streaming CDC-APPLY: each micro-batch merges into a manifest
    state table through the full conditional MERGE
    (:func:`~ihop_reddit_spark.sources.manifest.manifest_merge_into`) —
    forget requests (purchase events of ``user_id % 7 == 0`` users, the
    repo's GDPR shape) land as the matched-DELETE clause, everything
    else as an additive matched-UPDATE (``v = t.v + s.n``), both halves
    of every batch in ONE atomic merge-on-read commit with the stream
    batch id recorded in it.

    Exactly-once: a replayed batch is skipped whole via
    :func:`~ihop_reddit_spark.sources.manifest.committed_stream_batches`,
    keyed on the batch's CONTENT identity (the event_id min/max/count
    of its deterministically-carved slice — stable across checkpoints
    and across re-staged source dirs, so
    resuming a partially-completed run with a fresh checkpoint that
    re-enumerates the files in a different order stays safe, where the
    raw batch id would not be) — and there is no window where the
    batch's deletes landed but its updates did not, because they are
    one commit. The CDC algebra is
    deliberately batch-order-independent (additive updates; permanent
    tombstones — no insert clause resurrects a forgotten user), so the
    final state has a closed form over the raw events regardless of
    how the source carves micro-batches.

    The events slice is staged ONCE, with the table (``_cdc_src``), as
    ``n_source_files`` parquet files read with ``maxFilesPerTrigger=1``
    — real multi-batch sequencing, not a single-batch degenerate; the
    carve binds at first staging, so resumes with a different
    ``n_source_files`` reuse the original slices rather than re-carving
    under keys that match nothing. Returns ``table_path``."""
    import os

    from ..sources import manifest as M
    from ..sources.reddit import read_parquet_tables

    ev = (
        read_parquet_tables(spark, sf_dir, ["events"])["events"]
        .where(F.col("user_id").isNotNull())
        .select("event_id", "user_id", "event_type")
    )
    if not os.path.isdir(os.path.join(table_path, "_manifest")):
        M.manifest_init(table_path)
        seed = (
            ev.select(F.col("user_id").alias("k"))
            .distinct()
            .withColumn("v", F.lit(0).cast("long"))
        )
        M.manifest_append(seed.repartition(4), table_path)

    # the staged source lives with the TABLE, not the checkpoint: a
    # resume — fresh checkpoint or not, and whatever n_source_files it
    # passes — finds the dir and reuses the original carve, so the
    # content-identity keys below always compare like with like. (A
    # checkpoint-derived path would re-stage under a fresh checkpoint,
    # and a different n would carve different slices whose keys match
    # nothing — re-applying committed events.) n_source_files therefore
    # binds only at FIRST staging.
    src_dir = os.path.join(table_path, "_cdc_src")
    if not os.path.isdir(src_dir):
        # ONE Spark job on the DETERMINISTIC bucket expression
        # event_id % n (the old shape re-scanned the events table once
        # per file). NOT repartitionByRange — its sampled boundaries
        # vary run to run, and identical re-carves (e.g. a copied
        # table) must produce byte-identical slices so the content-
        # identity keys below recognize already-applied batches.
        _stage_slices(
            ev, src_dir, F.col("event_id") % n_source_files,
            n_source_files,
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # The idempotency key is derived from the batch's CONTENT
        # identity, not the stream batch id: the batch-id→file mapping
        # is pinned only by the streaming checkpoint, so resuming a
        # PARTIALLY-completed run with a fresh checkpoint may enumerate
        # the source files in a different order — a never-applied file
        # could then be skipped under an already-committed id while an
        # applied file re-applies under a new id, and the additive
        # ``v = t.v + s.n`` update is not idempotent. The staged source
        # files are DISJOINT deterministic slices of the events table,
        # so (min, max, count) of event_id identifies a batch uniquely
        # (disjoint non-empty sets cannot share a minimum) regardless
        # of enumeration order — and identically across re-staged
        # source dirs. One cheap extra agg per micro-batch;
        # ``inputFiles()`` is empty on streaming batch frames, so file
        # names cannot serve as the key.
        ident = batch_df.agg(
            F.min("event_id"), F.max("event_id"), F.count(F.lit(1))
        ).collect()[0]
        if ident[2] == 0:
            return  # empty batch: no clause could fire
        key = f"slice:{ident[0]}:{ident[1]}:{ident[2]}"
        committed = M.committed_stream_batches(table_path)
        if key in committed:
            return  # replayed batch — both clauses already landed
        # legacy tables (pre-content-key) committed POSITIONAL int
        # batch ids; honor those too so resuming such a table under
        # its original checkpoint doesn't re-apply every batch
        # (ADVICE r13). Positional ids are only pinned by that
        # checkpoint — a FRESH-checkpoint resume of a legacy table
        # remains unsafe and the table should be rebuilt. New-scheme
        # tables commit string keys only, so the int can never
        # spuriously match.
        if int(batch_id) in committed:
            return
        src = batch_df.groupBy(
            F.col("user_id").alias("k")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("user_id") % 7 == 0)
                ).cast("int")
            ).alias("forget"),
        )
        M.manifest_merge_into(
            batch_df.sparkSession,
            table_path,
            src,
            "k",
            matched_delete_condition="s.forget = 1",
            matched_update={"v": F.expr("t.v + s.n")},
            extra={"stream_batch_id": key},
        )

    writer = stream.writeStream.foreachBatch(merge_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return table_path


def merge_evolution_stream(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    *,
    checkpoint_dir: str | None = None,
) -> tuple[str, int]:
    """Streaming CDC-APPLY whose feed GROWS A COLUMN mid-stream — the
    real-world schema-change case the batch MERGE gate
    (``merge_schema_evolution_counts``) covers, composed with
    :func:`~ihop_reddit_spark.sources.manifest.manifest_merge_into`'s
    ``with_schema_evolution`` (VERDICT r13 item 7).

    Target seed (v1): every customer key ``k`` with ``v = 2k``. Two
    stream phases, each a real multi-batch ``availableNow`` run over
    table-local staged slices (one bucket per file, ``k % 2``):

    * **Phase 1 — narrow schema** ``(k, v)``: keys ``k % 3 == 1``
      update ``v = 3k`` (plain matched-UPDATE, no evolution).
    * **Phase 2 — wide schema** ``(k, v, seg)``: keys ``k % 5 == 2``
      update ``v = 7k``; NEW keys ``k + 9_000_000`` (``k % 13 == 3``)
      INSERT carrying ``seg`` — ``with_schema_evolution=True`` widens
      the target in the same atomic commit as the first insert-bearing
      batch. Matched updates never touch ``seg`` (INSERT-scope
      evolution), so pre-existing rows read NULL through the widened
      schema.

    Exactly-once ACROSS the widen: idempotency keys are the batch's
    content identity prefixed with the phase tag
    (``evo1:``/``evo2:`` + k min/max/count), so a full replay — fresh
    checkpoints, wider table schema — skips every batch whole and the
    head version is untouched. Updates are value-assignments (not
    additive), so the key prefix also guards against the two phases'
    overlapping key ranges colliding.

    Returns ``(table_path, head_after_phase1)`` — the phase-1 head lets
    callers pin the PRE-widen column count for the evolution check.
    """
    import os

    from ..sources import manifest as M
    from ..sources.reddit import read_parquet_tables

    cust = (
        read_parquet_tables(spark, sf_dir, ["customer"])["customer"]
        .select(F.col("c_custkey").alias("k"))
    )
    if not os.path.isdir(os.path.join(table_path, "_manifest")):
        M.manifest_init(table_path)
        M.manifest_append(
            cust.withColumn("v", (F.col("k") * 2).cast("long"))
            .repartition(2),
            table_path,
        )

    phase1_src = cust.where(F.col("k") % 3 == 1).select(
        "k", (F.col("k") * 3).cast("long").alias("v")
    )
    phase2_src = (
        cust.where(F.col("k") % 5 == 2)
        .select(
            "k",
            (F.col("k") * 7).cast("long").alias("v"),
            F.lit("w").alias("seg"),
        )
        .unionByName(
            cust.where(F.col("k") % 13 == 3).select(
                (F.col("k") + 9_000_000).alias("k"),
                ((F.col("k") + 9_000_000) * 7).cast("long").alias("v"),
                F.lit("n").alias("seg"),
            )
        )
    )

    def run_phase(src_df: DataFrame, tag: str, merge_kwargs: dict) -> None:
        src_dir = os.path.join(table_path, f"_evo_src_{tag}")
        if not os.path.isdir(src_dir):
            _stage_slices(src_df, src_dir, F.col("k") % 2, 2)

        def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
            ident = batch_df.agg(
                F.min("k"), F.max("k"), F.count(F.lit(1))
            ).collect()[0]
            if ident[2] == 0:
                return
            key = f"{tag}:{ident[0]}:{ident[1]}:{ident[2]}"
            if key in M.committed_stream_batches(table_path):
                return  # replayed batch — schema widen included
            M.manifest_merge_into(
                batch_df.sparkSession,
                table_path,
                batch_df,
                "k",
                extra={"stream_batch_id": key},
                **merge_kwargs,
            )

        stream = (
            spark.readStream.schema(src_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        writer = stream.writeStream.foreachBatch(merge_batch).trigger(
            availableNow=True
        )
        if checkpoint_dir is not None:
            writer = writer.option(
                "checkpointLocation", os.path.join(checkpoint_dir, tag)
            )
        q = writer.start()
        q.awaitTermination()

    run_phase(
        phase1_src, "evo1",
        {"matched_update": {"v": F.expr("s.v")}},
    )
    head_after_phase1 = M.latest_version(table_path)
    run_phase(
        phase2_src, "evo2",
        {
            "matched_update": {"v": F.expr("s.v")},
            "not_matched_insert": True,
            "with_schema_evolution": True,
        },
    )
    return table_path, head_after_phase1
