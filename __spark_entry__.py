"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship community2vec-prep pipeline (SURVEY §7
minimum slice) on sf0.001. ``queries()``/``oracle_sql()`` expose the engine's
operator surface (SURVEY §2 + north-star extensions) for the DuckDB
differential gate; definitions live in
``ihop_reddit_spark/plans/query_catalog.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ihop_reddit_spark.plans import query_catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> None:
    """Session invariants the catalog relies on (UTC epoch semantics — also
    what makes a TIMESTAMP_NTZ read of events.ts equal DuckDB's naive
    epoch(); nanosAsLong kept for legacy TIMESTAMP(NANOS) data — the actual
    storage dispatch lives in ihop_reddit_spark/functions/event_time.py), plus
    runtime-settable execution config a vanilla session lacks: AQE (runtime
    shuffle-partition coalescing + skew-join splitting — the 100 TB default)
    and a parallelism-sized initial shuffle-partition count instead of the
    static 200, which at small SF means 200 near-empty tasks per exchange.
    Arrow speeds the executor→driver pandas hand-off at the presentation
    edge. None of these change results — only physical execution."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # Replace only the untouched vanilla default (200): a session that chose
    # its own shuffle parallelism (session factory, bench) keeps it —
    # measured: overriding bench's cores-sized value with 2x cores cost ~20%
    # on the shuffle-heavy similarity joins at sf0.1.
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    return query_catalog.QUERIES["c2v_prep_contexts"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in query_catalog.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omissions get a rows-only check."""
    return dict(query_catalog.ORACLE_SQL)
