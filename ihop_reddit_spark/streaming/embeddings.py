"""Structured Streaming surface over the embeddings table: streaming
semantic dedup against an archived sign-LSH index.

The streaming twin of ``datapipe/semantic.incremental_semantic_dedup`` —
the shape a production ingest pipeline runs: new embedding batches arrive
on a stream, each micro-batch is deduped against the historical archive
inside ``foreachBatch``, survivors append to the sink (and, in production,
to the index itself to roll the window forward).

Correctness contract: the per-row drop decision depends only on (row,
archive) — never on which micro-batch the row landed in — so the streamed
result is identical to the one-shot batch incremental query and the same
DuckDB oracle covers both (the catalog registers this under
``stream_semantic_dedup_survivors`` with the incremental oracle SQL).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe.semantic import incremental_semantic_dedup, semantic_index_rows


def _embedding_stream(
    spark: SparkSession, sf_dir: str, stream_dir: str | None = None
) -> DataFrame:
    """File-source stream of the embeddings table (same symlink-into-a-dir
    device as ``streaming/events._event_stream`` — the file source only
    accepts directories)."""
    if stream_dir is None:
        stream_dir = tempfile.mkdtemp(prefix="embeddings_stream_")
    else:
        os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "embeddings.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/embeddings.parquet"), link)
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    return spark.readStream.schema(schema).parquet(stream_dir)


def semantic_dedup_stream(
    spark: SparkSession,
    sf_dir: str,
    cosine_threshold: float = 0.4,
    out_dir: str | None = None,
) -> DataFrame:
    """Bounded verification run: stream the odd-id embeddings as "today's
    batches" against the even-id archive; return the surviving
    (vec_id, label) rows.

    Each micro-batch runs the full incremental plan: row-local sign-LSH
    bucketing of the batch, bucket-local join against the (static) archive
    index, exact quantized-cosine verify on candidates, broadcast
    anti-join of the drop set. State: NONE kept by the stream itself — the
    archive is the state, which is what bounds memory at any stream
    length (the watermarkless shape a dedup-against-history pipeline
    wants; contrast ``dedup_events_stream`` whose within-stream dedup
    carries watermark-bounded state).
    """
    archive = semantic_index_rows(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
            F.col("vec_id") % 2 == 0
        )
    ).persist()
    out_dir = out_dir or os.path.join(
        tempfile.mkdtemp(prefix="semantic_stream_"),
        f"survivors_{uuid.uuid4().hex[:8]}",
    )

    def process_batch(batch_df: DataFrame, _batch_id: int) -> None:
        new = batch_df.where(F.col("vec_id") % 2 == 1)
        survivors = incremental_semantic_dedup(
            new, archive, cosine_threshold=cosine_threshold
        ).select("vec_id", "label")
        survivors.write.mode("append").parquet(out_dir)

    q = (
        _embedding_stream(spark, sf_dir)
        .writeStream.foreachBatch(process_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    archive.unpersist()
    return spark.read.parquet(out_dir)
