"""Streaming twin of the crawl-extraction tier (round 6 — completes the
batch+stream pattern every other tier has).

The extraction stages are PURE projections (html_to_text, link_density,
normalize_url — zero shuffle, zero state), so they stream trivially:
the same Catalyst expressions run per micro-batch in append mode with
no watermark and no state store. At production scale this is the WET
worker: a file/Kafka source of fetched pages, a projection, a sink —
backpressure and exactly-once come from the source/sink contract, not
from the operator, which is why the batch plan and the stream plan are
the SAME plan.

Stateful stages (frontier dedup, domain quota) deliberately stay out of
the projection twin: a global content-addressed quota is a batch
invariant; its streaming form is the compaction/foreachBatch pattern the
exactly-once ranked sink already demonstrates (streaming/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table (same symlink-dir device
    as events._event_stream — the file source wants a directory)."""
    import os
    import tempfile

    stream_dir = tempfile.mkdtemp(prefix="docs_stream_")
    link = os.path.join(stream_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/documents.parquet"), link)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return spark.readStream.schema(schema).parquet(stream_dir)
