"""Streaming dimension maintenance: SCD2 history kept current by a
stream of dimension change batches.

``foreachBatch`` + :func:`operators.setops.scd2_apply` — each micro-batch
closes/opens versions against the latest history SNAPSHOT and writes the
next snapshot (immutable version chain, same snapshot→snapshot discipline
as the batch operator; at scale, each version write is bounded by
dynamic-partition-overwrite on a key-bucket layout rather than a full
rewrite — the batch twin ``sources/io.overwrite_partitions`` is the
mechanism). Replayed deltas are no-ops by construction (a delta equal to
the current version closes nothing), so at-least-once delivery from the
stream is safe — the same idempotence contract as the exactly-once
ranked parquet sink, achieved in the MERGE itself instead of the sink.

Reference parity: the reference re-imports whole months when source data
changes (``dvc.yaml`` one-dump-per-month stages) — it has no notion of
incremental dimension history; this is engine extension surface beside
operators/setops.py's batch SCD2.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.setops import scd2_apply, scd2_init


def _customer_stream(
    spark: SparkSession, sf_dir: str, stream_dir: str | None = None
) -> DataFrame:
    if stream_dir is None:
        stream_dir = tempfile.mkdtemp(prefix="customer_stream_")
    link = os.path.join(stream_dir, "customer.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/customer.parquet"), link)
    schema = spark.read.parquet(f"{sf_dir}/customer.parquet").schema
    return spark.readStream.schema(schema).parquet(stream_dir)


def scd2_customer_stream(
    spark: SparkSession,
    sf_dir: str,
    eff: int = 100,
    work_dir: str | None = None,
) -> DataFrame:
    """Bounded verification run: seed the history from the customer
    snapshot, stream the segment-change delta (every 10th key → 'VIP' at
    ``eff``) as micro-batches, return the final history — identical to
    what the batch ``scd2_apply`` produces on the same delta.
    """
    work_dir = work_dir or tempfile.mkdtemp(prefix="scd2_stream_")
    keys, tracked = ["c_custkey"], ["c_mktsegment", "c_acctbal"]
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    hist0 = scd2_init(cust, keys, tracked, valid_from=0)
    versions = [os.path.join(work_dir, "hist_v0")]
    hist0.write.mode("overwrite").parquet(versions[0])

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.where(F.col("c_custkey") % 10 == 0).select(
            "c_custkey",
            F.lit("VIP").alias("c_mktsegment"),
            "c_acctbal",
        )
        hist = spark.read.parquet(versions[-1])
        nxt = scd2_apply(hist, delta, keys, tracked, eff=eff)
        path = os.path.join(work_dir, f"hist_v{batch_id + 1}")
        nxt.write.mode("overwrite").parquet(path)
        versions.append(path)

    q = (
        _customer_stream(spark, sf_dir)
        .writeStream.foreachBatch(process_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(versions[-1])
