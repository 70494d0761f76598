"""Scan-parallelism fan-out for compute-heavy narrow chains.

A narrow chain (project/filter/explode, no exchange) runs at SCAN
parallelism — one task per input split. Parquet splits at row-group
boundaries, so a small table written as one file with one row group
serializes EVERY per-row expression upstream of the first shuffle onto
a single core, however many the box has. At real scale inputs arrive as
many files/row groups and the condition below is false — the fan-out is
an under-parallel-scan rescue, not a tuning constant (guide §2.5 input
skew: "one huge unsplittable file — repartition immediately after the
read").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_if_narrow(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` — hashed on
    ``key_cols`` so downstream per-key operators can reuse the exchange
    — ONLY when its current plan would run on fewer partitions than the
    cluster has cores. No-op for streaming frames (``.rdd`` is illegal
    there; micro-batch frames pass through foreachBatch as batch frames
    and DO get the fan-out).

    The partition probe plans the frame but runs no job; callers sit on
    cheap-to-plan scans/projections.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(
        target
    )
