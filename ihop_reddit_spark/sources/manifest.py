"""Versioned parquet tables: a manifest/commit-log layout for
incremental pipelines — snapshot isolation, time travel, changes-since
reads, file-targeted deletes, and compaction, with no table-format
dependency (Delta/Iceberg are not in this sandbox; the layout mirrors
their public commit-log design at the altitude this engine needs).

Why the engine needs it: the incremental tiers (MinHash/winnowing/IVF
index appends, streaming sinks) all assume "process only what arrived
since the last run". That requires a STORAGE contract, not just
operators: a reader must see a consistent file set while writers append
(snapshot isolation), and the next pipeline run must enumerate exactly
the new files (changes-since). A directory of bare parquet files gives
neither — listing races with writes and carries no version history.

Layout (all paths relative to the table root):

* ``_manifest/v{N:08d}.json`` — one commit doc per version: parent,
  operation, the table schema, files ``added`` and ``removed``. Version
  order IS lexical filename order.
* ``data/b{N:08d}/part-*.parquet`` — immutable data files, one batch
  directory per committing version; no file is ever rewritten in place.

Commit protocol: the doc is staged as a hidden temp file then published
with ``os.link`` (atomic create-if-absent on POSIX) — two racing
writers cannot both claim version N; the loser gets
``ConcurrentCommitError`` and retries on the new head. On an object
store the same protocol maps to a conditional PUT; it is isolated in
``_commit_version`` on purpose.

Scale shape: manifests enumerate FILES, not rows — the driver holds a
file list (thousands of entries at 100 TB with sane file sizes, guarded
by ``max_manifest_files``); all row work is distributed parquet scans
over exactly the live file set, so snapshot reads prune to the version's
files and changes-since readers never rescan the archive (the same
never-reshuffle contract as the incremental dedup indexes).

Reference parity note: the reference repo (UMassCDS/IHOP-Reddit) writes
bare parquet snapshots (`ihop/import_data.py` end of pipeline); this
module belongs to the training-data-pipeline tier the brief adds on top.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — reread the head."""


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifest")


def _version_doc_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version:08d}.json")


def list_versions(path: str) -> list[int]:
    """All committed versions, ascending."""
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        raise FileNotFoundError(f"no manifest table at {path}")
    return sorted(
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    )


def latest_version(path: str) -> int:
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"manifest dir at {path} has no versions")
    return versions[-1]


def read_version_doc(path: str, version: int) -> dict:
    with open(_version_doc_path(path, version)) as fh:
        return json.load(fh)


def _commit_version(path: str, doc: dict) -> int:
    """Atomically publish ``doc`` as version ``doc['version']``.

    os.link is create-if-absent on POSIX — the one concurrency primitive
    the protocol needs (conditional PUT on an object store)."""
    version = doc["version"]
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-v{version:08d}-{os.getpid()}.json")
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    try:
        os.link(tmp, _version_doc_path(path, version))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"version {version} at {path} was committed by another writer"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def manifest_init(path: str) -> int:
    """Create an empty table (version 0, no schema yet)."""
    if os.path.isdir(_manifest_dir(path)) and list_versions(path):
        raise FileExistsError(f"manifest table already exists at {path}")
    return _commit_version(
        path,
        {
            "version": 0,
            "parent": None,
            "operation": "init",
            "schema": None,
            "added": [],
            "removed": [],
        },
    )


def live_files(path: str, version: int | None = None) -> list[str]:
    """The data files visible at ``version`` (default: head), in commit
    order — replayed from the version docs (added ∪ … − removed)."""
    if version is None:
        version = latest_version(path)
    live: list[str] = []
    for v in list_versions(path):
        if v > version:
            break
        doc = read_version_doc(path, v)
        removed = set(doc["removed"])
        live = [f for f in live if f not in removed] + doc["added"]
    return live


def _schema_of(path: str, version: int | None = None) -> T.StructType | None:
    if version is None:
        version = latest_version(path)
    for v in reversed([x for x in list_versions(path) if x <= version]):
        doc = read_version_doc(path, v)
        if doc["schema"] is not None:
            return T.StructType.fromJson(doc["schema"])
    return None


def _stage_batch(df: DataFrame, path: str, version: int) -> list[str]:
    """Write ``df`` as the (immutable) batch directory for ``version``;
    return the written part files as root-relative paths."""
    rel = f"data/b{version:08d}"
    out = os.path.join(path, rel)
    if os.path.exists(out):
        # a crashed writer left a stage for a version that never
        # committed — safe to clear, nothing references it
        shutil.rmtree(out)
    df.write.parquet(out)
    return sorted(
        f"{rel}/{f}" for f in os.listdir(out) if f.endswith(".parquet")
    )


def _file_column_stats(fp: str) -> dict:
    """Per-column [min, max] for one parquet file, read from the FOOTER
    metadata only (pyarrow — no data scan): the per-file pendant to
    parquet's row-group stats, lifted into the manifest so snapshot
    readers can skip whole files. Only JSON-safe comparable primitives
    (ints, floats, strings) are recorded; columns with missing or
    non-comparable stats are simply absent — readers treat absence as
    "cannot prune", never as "empty"."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fp).metadata
    stats: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            s = col.statistics
            if s is None or not s.has_min_max:
                continue
            lo, hi = s.min, s.max
            if isinstance(lo, bytes) or isinstance(hi, bytes):
                continue
            if not isinstance(lo, (int, float, str)):
                continue
            name = col.path_in_schema
            if name in stats:
                stats[name] = [min(stats[name][0], lo), max(stats[name][1], hi)]
            else:
                stats[name] = [lo, hi]
    return stats


def live_file_stats(path: str, version: int | None = None) -> dict:
    """rel-path → {col: [min, max]} for the live files at ``version``,
    replayed from the version docs (older docs may predate stats — those
    files map to {} and are never pruned)."""
    if version is None:
        version = latest_version(path)
    out: dict[str, dict] = {}
    for v in list_versions(path):
        if v > version:
            break
        doc = read_version_doc(path, v)
        for f in doc["removed"]:
            out.pop(f, None)
        file_stats = doc.get("stats", {})
        for f in doc["added"]:
            out[f] = file_stats.get(f, {})
    return out


def _prune_files(
    files: list[str], stats: dict, prune: dict | None
) -> list[str]:
    """Keep each file whose recorded [min, max] intersects every bound in
    ``prune`` ({col: (lo, hi)}, either end None). Missing stats keep the
    file — pruning is an I/O optimization, NEVER a filter: callers still
    apply the real predicate, so a conservative keep costs a scan, while
    an aggressive drop would cost correctness."""
    if not prune:
        return files
    kept = []
    for f in files:
        s = stats.get(f, {})
        keep = True
        for col, (lo, hi) in prune.items():
            if col not in s:
                continue
            fmin, fmax = s[col]
            if lo is not None and fmax < lo:
                keep = False
                break
            if hi is not None and fmin > hi:
                keep = False
                break
        if keep:
            kept.append(f)
    return kept


def _check_schema(
    df: DataFrame, path: str, *, allow_additive: bool = False
) -> None:
    stored = _schema_of(path)
    if stored is None:
        return
    got = [(f.name, f.dataType) for f in df.schema.fields]
    want = [(f.name, f.dataType) for f in stored.fields]
    if got == want:
        return
    if allow_additive and set(want).issubset(got):
        # additive evolution: every existing column present with its
        # exact type; new columns join the table schema, and older files
        # read them as NULL (read_snapshot pins the version's schema)
        return
    raise ValueError(
        f"append schema {got} does not match table schema {want};"
        " pass allow_additive=True to add columns, or migrate explicitly"
    )


def committed_stream_batches(path: str) -> set[int]:
    """Stream batch ids already committed to this table — the replay
    guard for the foreachBatch sink (a retried micro-batch finds its id
    here and skips; see ``streaming.events.manifest_sink_stream``)."""
    out = set()
    for v in list_versions(path):
        doc = read_version_doc(path, v)
        if "stream_batch_id" in doc:
            out.add(doc["stream_batch_id"])
    return out


def manifest_append(
    df: DataFrame,
    path: str,
    *,
    max_manifest_files: int = 1_000_000,
    extra: dict | None = None,
    allow_additive: bool = False,
) -> int:
    """Append ``df`` as a new version. Old files are never touched;
    concurrent appenders race on the version doc, never on data.
    ``extra`` merges additional JSON-safe fields into the commit doc
    (e.g. ``stream_batch_id`` for exactly-once streaming appends).
    ``allow_additive`` permits NEW columns (existing ones must keep
    their exact name+type); older files read the new columns as NULL
    and time travel surfaces each version's own schema."""
    head = latest_version(path)
    _check_schema(df, path, allow_additive=allow_additive)
    version = head + 1
    added = _stage_batch(df, path, version)
    n_live = len(live_files(path, head)) + len(added)
    if n_live > max_manifest_files:
        raise ValueError(
            f"table would reach {n_live} files > max_manifest_files="
            f"{max_manifest_files}; compact before appending"
        )
    return _commit_version(
        path,
        {
            "version": version,
            "parent": head,
            "operation": "append",
            "schema": df.schema.jsonValue(),
            "added": added,
            "removed": [],
            "stats": {
                f: _file_column_stats(os.path.join(path, f)) for f in added
            },
            **(extra or {}),
        },
    )


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    *,
    prune: dict | None = None,
) -> DataFrame:
    """The table as of ``version`` (default: head) — time travel. An
    empty table yields an empty frame with the recorded schema.

    ``prune`` ({col: (lo, hi)}) skips files whose manifest-recorded
    [min, max] cannot intersect the bounds — footer-stat file skipping,
    the manifest-level pendant to parquet row-group pruning. It is an
    I/O optimization only: the caller still applies the real predicate,
    and files without stats are always scanned."""
    files = live_files(path, version)
    schema = _schema_of(path, version)
    if not files:
        if schema is None:
            raise ValueError(
                f"table at {path} is empty and has no recorded schema"
            )
        return spark.createDataFrame([], schema)
    if prune:
        files = _prune_files(files, live_file_stats(path, version), prune)
        if not files:
            return spark.createDataFrame([], schema)
    # pin the VERSION's schema on the scan: after additive evolution,
    # files written before a column existed read it as NULL, and time
    # travel to an old version surfaces that version's (narrower) schema
    reader = spark.read if schema is None else spark.read.schema(schema)
    return reader.parquet(*(os.path.join(path, f) for f in files))


def read_changes(
    spark: SparkSession,
    path: str,
    since_version: int,
    version: int | None = None,
) -> DataFrame:
    """Rows that became live in ``(since_version, version]`` — the
    incremental-processing grain: exactly the files appended in the
    range and still live at its end, no archive rescan ever."""
    if version is None:
        version = latest_version(path)
    if since_version > version:
        raise ValueError(f"since_version {since_version} > version {version}")
    added: list[str] = []
    for v in list_versions(path):
        if v <= since_version or v > version:
            continue
        doc = read_version_doc(path, v)
        removed = set(doc["removed"])
        added = [f for f in added if f not in removed] + doc["added"]
    if not added:
        schema = _schema_of(path, version)
        if schema is None:
            raise ValueError(f"no schema recorded at {path} yet")
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*(os.path.join(path, f) for f in added))


def manifest_delete_where(
    spark: SparkSession, path: str, condition
) -> tuple[int, int]:
    """File-targeted delete (the GDPR grain): ONE scan finds the files
    containing matching rows; only those files' survivors are rewritten
    into the new version — untouched files stay byte-identical (the same
    contract as ``sources.io.targeted_delete``, now with version history
    so the pre-delete snapshot remains auditable until vacuum).

    Returns (new_version, n_files_rewritten).
    """
    head = latest_version(path)
    files = live_files(path, head)
    if not files:
        return head, 0
    snap = spark.read.parquet(*(os.path.join(path, f) for f in files))
    hit_files = [
        r["f"]
        for r in snap.where(condition)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    if not hit_files:
        return head, 0
    # normalize the scheme-qualified input_file_name back to rel paths
    hit_rel = sorted(
        f for f in files if any(h.endswith("/" + f) for h in hit_files)
    )
    # keep every row where the condition is not TRUE — a NULL-evaluating
    # predicate must keep the row, not silently drop it
    survivors = spark.read.parquet(
        *(os.path.join(path, f) for f in hit_rel)
    ).where(~F.coalesce(condition, F.lit(False)))
    version = head + 1
    added = (
        _stage_batch(survivors, path, version)
        if survivors.limit(1).count()
        else []
    )
    _commit_version(
        path,
        {
            "version": version,
            "parent": head,
            "operation": "delete",
            "schema": snap.schema.jsonValue(),
            "added": added,
            "removed": hit_rel,
            "stats": {
                f: _file_column_stats(os.path.join(path, f)) for f in added
            },
        },
    )
    return version, len(hit_rel)


def manifest_compact(
    spark: SparkSession,
    path: str,
    *,
    target_files: int = 1,
    cluster_by: list[str] | None = None,
    zorder_bits: int = 10,
) -> int:
    """Rewrite the live file set into ``target_files`` files — data
    identical (snapshot reads hash the same before and after,
    oracle-pinned), file count bounded. Old versions still time-travel
    to the pre-compaction layout until vacuumed.

    ``cluster_by`` additionally CLUSTERS the rewrite so the manifest's
    footer min/max stats get tight per-file ranges (file skipping bites
    after compaction, not just on range-partitioned appends): one column
    → range-partition + sort; two columns → Morton/z-order interleave
    (``sources.layout.zvalue`` — bounded rectangles in both dims), the
    classic layout for two-column prune workloads. Still a data no-op.
    """
    head = latest_version(path)
    files = live_files(path, head)
    if len(files) <= target_files and not cluster_by:
        return head
    snap = read_snapshot(spark, path, head)
    if cluster_by:
        if len(cluster_by) == 1:
            clustered = snap.repartitionByRange(
                target_files, cluster_by[0]
            ).sortWithinPartitions(cluster_by[0])
        elif len(cluster_by) == 2:
            from .layout import zvalue

            z = zvalue(
                F.col(cluster_by[0]), F.col(cluster_by[1]), zorder_bits
            )
            clustered = (
                snap.withColumn("__z", z)
                .repartitionByRange(target_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            raise ValueError("cluster_by supports 1 or 2 columns")
    else:
        clustered = snap.coalesce(target_files)
    version = head + 1
    added = _stage_batch(clustered, path, version)
    return _commit_version(
        path,
        {
            "version": version,
            "parent": head,
            "operation": "compact",
            "schema": snap.schema.jsonValue(),
            "added": added,
            "removed": files,
            "stats": {
                f: _file_column_stats(os.path.join(path, f)) for f in added
            },
        },
    )


def manifest_vacuum(path: str, *, keep_from_version: int) -> int:
    """Physically delete data files referenced ONLY by versions older
    than ``keep_from_version`` (after this, time travel below the
    horizon fails loudly — their version docs are dropped too). The
    oldest retained version doc is rewritten as a CHECKPOINT carrying
    its full live file set, so replay never needs the dropped chain.
    Returns the number of files deleted."""
    versions = list_versions(path)
    keep_versions = [v for v in versions if v >= keep_from_version]
    if not keep_versions:
        raise ValueError(
            f"keep_from_version {keep_from_version} retains no versions"
        )
    base = keep_versions[0]
    retained: set[str] = set()
    for v in keep_versions:
        retained.update(live_files(path, v))
    ever: set[str] = set()
    for v in versions:
        ever.update(read_version_doc(path, v)["added"])

    # checkpoint the base BEFORE dropping its ancestors: its doc becomes
    # self-contained (full live set, no parent), so later docs still
    # apply incrementally on top. Maintenance op → os.replace, not the
    # create-if-absent commit path.
    base_schema = _schema_of(path, base)
    base_doc = {
        "version": base,
        "parent": None,
        "operation": "checkpoint",
        "schema": None if base_schema is None else base_schema.jsonValue(),
        "added": live_files(path, base),
        "removed": [],
        "stats": live_file_stats(path, base),
    }
    tmp = os.path.join(_manifest_dir(path), f".ckpt-{os.getpid()}.json")
    with open(tmp, "w") as fh:
        json.dump(base_doc, fh, indent=1, sort_keys=True)
    os.replace(tmp, _version_doc_path(path, base))

    doomed = sorted(ever - retained)
    for f in doomed:
        fp = os.path.join(path, f)
        if os.path.exists(fp):
            os.unlink(fp)
    for v in versions:
        if v < keep_from_version:
            os.unlink(_version_doc_path(path, v))
    return len(doomed)
