"""Sinks (SURVEY §2.1, S5-S7) + scale-oriented write helpers.

The reference writes flat parquet dirs and bzip2 CSV (``ihop/import_data.py:
668-692``). At 100 TB the layout IS the query plan: month-partitioned parquet
gives dynamic partition pruning for free, and bucketing by a join key removes
the shuffle from every subsequent join on that key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """S5 — parquet sink (``ihop/import_data.py:692``), optionally partitioned
    (e.g. by month — the reference partitions by FILE NAMING, one job per
    month, ``dvc.yaml:32-41``; directory partitioning makes pruning automatic).
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """ORC sink — same layout semantics as :func:`write_parquet` (directory
    partitioning ⇒ partition pruning; columnar + predicate pushdown via ORC
    stripe/row-group statistics). For interop with Hive/Trino warehouses
    where ORC is the table format; parquet remains the engine default.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC scan — vectorized read with pushdown/pruning like parquet."""
    return spark.read.orc(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """JSON-lines sink — the interchange twin of ``sources/reddit.read_jsonl``
    (the reference's native ingest format, ``ihop/import_data.py:300-311``).
    One JSON object per line, optionally gzip/bzip2-compressed and
    directory-partitioned; for handing curated corpora to non-columnar
    consumers (tokenizer trainers, external loaders). Parquet remains the
    analytics default — JSONL trades scan efficiency for universality.
    """
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table — co-locates join/agg keys so later joins on
    ``bucket_cols`` are shuffle-free (both sides read pre-hashed buckets).
    Requires saveAsTable (bucket metadata lives in the catalog).
    """
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def write_compressed_csv(
    df: DataFrame, path: str, compression: str = "bzip2", mode: str = "overwrite"
) -> None:
    """S6 — compressed CSV sink for the community2vec hand-off
    (``ihop/import_data.py:674-676``). Kept for format parity; prefer parquet.
    """
    df.write.mode(mode).option("compression", compression).csv(path)


def write_single_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """S7 — single-file CSV for small outputs (vocab tables, metrics).

    Reference does ``toPandas().to_csv`` (``ihop/import_data.py:668``);
    ``coalesce(1)`` keeps it distributed-write shaped. Guard: only call this
    on bounded results (top-N tables, ≤~1M rows).
    """
    df.coalesce(1).write.mode(mode).option("header", str(header).lower()).csv(path)


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a parquet dataset via the pyarrow
    filesystem API — generic over local/S3/HDFS (pass-through of whatever
    filesystem ``pyarrow.dataset`` infers from the path/URI)."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    fs = dataset.filesystem
    infos = fs.get_file_info(list(dataset.files))
    return len(infos), sum(i.size for i in infos)


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    compression: str = "zstd",
) -> int:
    """Small-files compaction — the maintenance op every long-lived dataset
    needs: streaming sinks, incremental batches, and dynamic-partition
    overwrites all accrete files far below the scan-efficient size, and at
    100 TB the file count (driver memory for listings, task-launch
    overhead, metadata RPCs) degrades every reader.

    Sizes the output from the CURRENT on-disk bytes: n_out =
    ceil(total_bytes / target_file_bytes), then rewrites through
    ``repartition(n_out)`` — a full shuffle, chosen over ``coalesce``
    deliberately: coalesce merges whole input partitions and inherits
    their skew, so one giant file can survive compaction; repartition
    rebalances by row and its cost IS the rewrite cost.

    Writes to ``out_path`` (swap is the caller's transaction: rename /
    catalog repoint / table-format commit). Returns n_out.
    """
    import math

    _, total_bytes = parquet_file_stats(path)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    (
        spark.read.parquet(path)
        .repartition(n_out)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(out_path)
    )
    return n_out


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    compression: str = "zstd",
) -> None:
    """Idempotent partition backfill — the batch twin of the streaming
    ``ranked_window_parquet_sink``: rewrite ONLY the partitions present in
    ``df`` (dynamic partitionOverwriteMode), leaving every other partition
    untouched. Re-running the same backfill converges to the same files,
    which is what makes retry-on-failure safe without a table format.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .option("compression", compression)
            .partitionBy(*partition_by)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def observed_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column] | None = None,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> dict:
    """Parquet write + pipeline telemetry in ONE pass: attach
    ``df.observe`` aggregate metrics (default: row count) so the sink job
    itself reports what it wrote — no second scan to count rows, which at
    100 TB is the difference between free observability and doubling the
    job. Returns the observed metrics dict.

    Metrics are Spark ``Observation`` aggregates (count/sum/min/max/...)
    computed incrementally by the tasks that write — exactly the numbers
    a production pipeline logs per run (rows written, value totals, null
    counts) and the batch analogue of streaming query progress.
    """
    from pyspark.sql import Observation

    if metrics is None:
        metrics = {"rows_written": F.count(F.lit(1))}
    obs = Observation()
    named = [c.alias(n) for n, c in metrics.items()]
    observed = df.observe(obs, *named)
    writer = observed.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return dict(obs.get)


def targeted_delete(
    spark,
    path: str,
    delete_keys: DataFrame,
    key_col: str,
    partition_col: str,
    *,
    compression: str = "zstd",
) -> dict:
    """Row-level deletion from a partitioned parquet table with
    partition-pruned rewrites — the GDPR/right-to-be-forgotten
    maintenance op at 100 TB altitude: only partitions that actually
    CONTAIN a deleted key are read and rewritten; the rest of the table
    is untouched bytes.

    Requires the table to be directory-partitioned on ``partition_col``
    and ``delete_keys`` to carry BOTH columns (key + its partition value
    — the deletion request knows where its rows live; if it doesn't,
    derive the partition with one broadcast semi-join against the key
    column first). Plan: (1) the affected-partition set is
    ``delete_keys``-sized; (2) the read of those partitions prunes at
    the directory level (``PartitionFilters``); (3) the anti-join's
    delete side is broadcast; (4) dynamic partition overwrite rewrites
    only the affected directories, idempotently (re-running the same
    delete converges).

    Returns ``{"partitions_rewritten": n, "partitions_removed": n,
    "rows_deleted": n}`` — the audit record a deletion pipeline logs.
    Partitions whose listed keys matched no rows are neither rewritten
    nor counted (file mtimes stay untouched on retries).

    Durability: survivors are MATERIALIZED to a hidden temp dir under
    the table root before any overwrite begins, and the overwrite reads
    from the temp files — never from the partitions being replaced. A
    mere ``persist()`` is best-effort: lose a cached block mid-overwrite
    (executor failure, memory pressure) and Spark would recompute the
    survivors from half-deleted source files, silently losing rows that
    were never targeted. Dot-prefixed dirs are invisible to parquet
    readers, so a crash between write and cleanup leaves the table
    readable and the retry idempotent.
    """
    import uuid

    from pyspark.sql import functions as F

    parts = [
        r[0]
        for r in delete_keys.select(partition_col).distinct().collect()
    ]
    if not parts:
        return {
            "partitions_rewritten": 0,
            "partitions_removed": 0,
            "rows_deleted": 0,
        }
    affected = spark.read.parquet(path).where(
        F.col(partition_col).isin(parts)
    )
    # join on the (key, partition) PAIR — the declared deletion scope.
    # A key-only join would let unrelated keys in the batch widen each
    # other's deletion to partitions never requested.
    pairs = delete_keys.select(key_col, partition_col).distinct()
    kept = affected.join(
        F.broadcast(pairs), [key_col, partition_col], "left_anti"
    )
    per_part_before = {
        r[0]: r[1]
        for r in affected.groupBy(partition_col).count().collect()
    }
    # lineage break: write ALL surviving rows of the affected partitions
    # to the temp dir in one pass, then count + overwrite from the temp
    # READ — the source partitions are only ever read before this point
    tmp = f"{path}/.__delete_tmp_{uuid.uuid4().hex}"
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    tmp_hpath = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = tmp_hpath.getFileSystem(hconf)
    try:
        kept.write.mode("overwrite").option(
            "compression", compression
        ).parquet(tmp)
        kept_t = spark.read.parquet(tmp)
        per_part_after = {
            r[0]: r[1]
            for r in kept_t.groupBy(partition_col).count().collect()
        }
        changed = sorted(
            p
            for p, n in per_part_before.items()
            if per_part_after.get(p, 0) != n
        )
        rewritten = [p for p in changed if per_part_after.get(p, 0) > 0]
        emptied = [p for p in changed if per_part_after.get(p, 0) == 0]
        if rewritten:
            overwrite_partitions(
                kept_t.where(F.col(partition_col).isin(rewritten)),
                path,
                [partition_col],
                compression=compression,
            )
    finally:
        fs.delete(tmp_hpath, True)
    # dynamic overwrite only touches partitions PRESENT in the written
    # frame — a partition whose every row was deleted must be removed
    # explicitly or its old files would survive the delete. Directory
    # names use Spark's OWN partition-path encoding (escapePathName +
    # __HIVE_DEFAULT_PARTITION__ for null, 'true'/'false' for bools) —
    # a python str() path would silently miss URL-escaped values, and a
    # silent miss here means "deleted" rows survive on disk.
    if emptied:
        esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        for p in sorted(emptied, key=str):
            if p is None:
                sval = "__HIVE_DEFAULT_PARTITION__"
            elif p is True or p is False:
                sval = "true" if p else "false"
            else:
                sval = esc.escapePathName(str(p))
            hpath = jvm.org.apache.hadoop.fs.Path(
                f"{path}/{esc.escapePathName(partition_col)}={sval}"
            )
            pfs = hpath.getFileSystem(hconf)
            if not pfs.exists(hpath) or not pfs.delete(hpath, True):
                raise RuntimeError(
                    f"targeted_delete: failed to remove emptied "
                    f"partition directory {hpath} — rows reported "
                    f"deleted would survive on disk"
                )
    return {
        "partitions_rewritten": len(rewritten),
        "partitions_removed": len(emptied),
        "rows_deleted": sum(per_part_before.values())
        - sum(per_part_after.values()),
    }
