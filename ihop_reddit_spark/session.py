"""SparkSession factory — parity with the reference's session/config harness.

Reference: ``ihop/utils.py:47-108`` (``DEFAULT_SPARK_CONFIG`` +
``get_spark_session(name, config)``) builds a local session with 4G
driver/executor defaults and a config-dict override.

This engine's factory differs deliberately (Spark-first, 100 TB design):

* Arrow enabled for every Python<->JVM exchange (the reference moves data with
  un-Arrow'd ``toPandas``/``toLocalIterator``, SURVEY §4).
* AQE on: runtime coalescing of shuffle partitions + skew-join handling, so the
  same code survives a 1000-executor cluster without hand-tuned partition
  counts.
* Session timezone pinned UTC — epoch-seconds semantics everywhere (the
  reference stores Unix epoch ints, ``ihop/import_data.py:27-29``), and it makes
  results reproducible against UTC-naive engines (DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied to every session; callers override via the ``config`` dict.
DEFAULT_CONFIG: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet TIMESTAMP(NANOS) (e.g. pandas-written event streams) has no
    # Spark timestamp type; read it as LONG nanoseconds and convert with
    # integer `div` (never double division — ns since epoch exceeds 2^53).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Keep per-file splits bounded so huge inputs parallelize; at 100 TB this
    # is the knob that decides task count per scan.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Don't let tiny local runs fan out 200 shuffle partitions; AQE coalesces
    # down, but the initial number still bounds task-launch overhead locally.
    "spark.sql.shuffle.partitions": str(max(os.cpu_count() or 8, 8)),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark_session(
    name: str = "ihop_reddit_spark",
    config: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``) when
    no cluster master is configured — on a real cluster, leave it None and let
    spark-submit decide.
    """
    builder = SparkSession.builder.appName(name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    merged = dict(DEFAULT_CONFIG)
    if config:
        merged.update(config)
    for key, value in merged.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def stop_spark_session(spark: SparkSession) -> None:
    spark.stop()
