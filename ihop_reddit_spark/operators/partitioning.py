"""Scan-parallelism fan-out for compute-heavy narrow chains.

A narrow chain (project/filter/explode, broadcast join — no exchange)
runs at SCAN parallelism: one task per input split. Parquet splits at
row-group boundaries, so a small table written as one file with one row
group serializes EVERY per-row expression upstream of the first shuffle
onto a single core, however many the box has. At real scale inputs
arrive as many files/row groups and the probe below says "enough splits"
— the fan-out is an under-parallel-scan rescue, not a tuning constant
(guide §2.5 input skew: "one huge unsplittable file — repartition
immediately after the read").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Cheap upper-ish estimate of the frame's scan parallelism from its
    backing files — analysis-only (``inputFiles`` collects scan leaves;
    no physical planning, unlike ``df.rdd``, which re-plans the whole
    subtree and measured ~0.5s per probe on composed inputs).

    Returns None when the frame is not file-backed (in-memory sources,
    empty leaf list) — callers fall back to the precise probe. Files
    whose size cannot be read count as one split each (conservative:
    prefer fanning out)."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 - non-file-backed plans
        return None
    if not files:
        return None
    max_bytes = int(
        df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728"
        )
    )
    est = 0
    for uri in files:
        path = uri[5:] if uri.startswith("file:") else uri
        try:
            size = os.path.getsize(path)
        except OSError:
            size = 0  # remote/unreadable: count the file as one split
        est += max(1, -(-size // max_bytes))  # ceil
    return est


def fan_out_if_narrow(
    df: DataFrame, *key_cols: str, heavy: bool = False
) -> DataFrame:
    """Repartition ``df`` toward ``defaultParallelism`` — hashed on
    ``key_cols`` so downstream per-key operators can reuse the exchange
    — ONLY when its scan parallelism is below the core count. No-op for
    streaming frames (``.rdd``/``inputFiles`` are illegal there;
    micro-batch frames pass through foreachBatch as batch frames and DO
    get the fan-out).

    Width (r15, VERDICT r14 item 6): a LIGHT downstream chain (regex
    projections, banding joins) gains little from a full-core fan-out
    of a tiny frame but pays the full task-scheduling cost — measured
    ~0.5 s each on simhash/crawl at bench scale — so the default width
    is capped at ``max(est_splits * 4, 8)``. Per-row-COMPUTE-heavy
    consumers (per-gram md5, Arrow codec stages) pass ``heavy=True``
    and fan out to every core: for them the idle-core cost dominates
    any scheduling overhead at any input size. Both variants are
    no-ops at real scale (many splits → est ≥ cores before the cap
    matters).

    Probe order: file-based estimate first (analysis-only), the precise
    ``.rdd`` partition count only for non-file-backed frames. A
    few-files frame that already sits behind its own exchange gets a
    redundant (cheap, small-data) fan-out — that case only arises at
    small scale, where the extra exchange is noise; at real scale many
    splits make the probe a no-op before any repartition fires.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    est = _estimated_scan_partitions(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est >= target:
        return df
    width = target if heavy else min(target, max(est * 4, 8))
    return df.repartition(width, *key_cols) if key_cols else df.repartition(
        width
    )
