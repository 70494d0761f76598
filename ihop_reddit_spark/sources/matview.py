"""Incrementally-maintained materialized aggregates over manifest tables.

The Databricks/Delta "materialized view with incremental refresh" shape
(reference has no analog — this is the platform tier a 100 TB pipeline
schedules instead of re-running its rollup queries): a view table holds
``GROUP BY keys → additive aggregates`` over a source manifest table,
and ``matview_refresh`` advances it by reading ONLY the source's
row-level change feed since the last refresh — cost ∝ changed rows,
never ∝ source size — then applying the per-group deltas as one atomic
conditional MERGE (update touched groups, insert new groups, delete
groups whose count reaches zero).

Correctness rests on two contracts already gated elsewhere:

* :func:`~ihop_reddit_spark.sources.manifest.read_change_feed` replays
  every insert/delete row-exactly with NET semantics (a row inserted
  and deleted within the range appears as neither), so folding
  ``+1/-1`` / ``+x/-x`` per group gives exactly the aggregate delta;
* :func:`~ihop_reddit_spark.sources.manifest.manifest_merge_into`
  lands all three clause outputs in ONE version doc, and that same doc
  carries the new ``refreshed through`` source version — a crash
  leaves either the old view (refresh re-runs whole) or the new view
  (refresh is a no-op), never a torn one.

Only ADDITIVE aggregates are supported (``count``, ``sum`` over exact
integer/decimal columns): they are the ones a delta stream can maintain
under deletes. ``min``/``max`` are deliberately refused — a deleted
extremum cannot be repaired from deltas without re-scanning the group,
which is a rebuild, not a refresh (run :func:`matview_create` again).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import manifest as M

_SPEC_KEY = "matview"
_SUPPORTED = ("count", "sum")


def _spec_of(view_root: str) -> dict:
    """The view's spec + refresh watermark from the NEWEST version doc
    that carries one (every build/refresh commit re-records it)."""
    for v in reversed(M.list_versions(view_root)):
        doc = M.read_version_doc(view_root, v)
        if _SPEC_KEY in doc:
            return doc[_SPEC_KEY]
    raise ValueError(
        f"{view_root} carries no materialized-view spec — "
        "not created by matview_create?"
    )


def _agg_exprs(aggs: dict) -> list:
    out = []
    for col, (kind, src) in aggs.items():
        if kind == "count":
            out.append(F.count(F.lit(1)).cast("long").alias(col))
        else:
            out.append(F.sum(src).cast("long").alias(col))
    return out


def matview_create(
    spark: SparkSession,
    src_root: str,
    view_root: str,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
) -> int:
    """Full build: materialize ``SELECT keys, aggs FROM src GROUP BY
    keys`` at the source's current head into a fresh manifest table at
    ``view_root`` and record the spec + watermark in the commit doc.
    ``aggs`` maps output column → ("count", None) | ("sum", src_col).
    Exactly one aggregate must be a ``count`` — it is the group
    liveness witness the refresh's delete clause keys on. Returns the
    view's head version."""
    import os

    kinds = [k for k, _ in aggs.values()]
    bad = [k for k in kinds if k not in _SUPPORTED]
    if bad:
        raise ValueError(
            f"unsupported aggregate kind(s) {bad}: only additive"
            f" {list(_SUPPORTED)} can be maintained from a delta feed"
            " (min/max need a group re-scan — rebuild instead)"
        )
    if kinds.count("count") != 1:
        raise ValueError(
            "exactly one aggregate must be a count — it witnesses"
            " group liveness for the refresh's delete clause"
        )
    src_head = M.latest_version(src_root)
    snap = M.read_snapshot(spark, src_root, src_head)
    view = snap.groupBy(*keys).agg(*_agg_exprs(aggs))
    M.manifest_init(view_root)
    M.manifest_append(
        view.repartition(max(1, min(4, spark.sparkContext.defaultParallelism))),
        view_root,
        extra={
            _SPEC_KEY: {
                "src": os.path.abspath(src_root),
                "keys": list(keys),
                "aggs": {c: [k, s] for c, (k, s) in aggs.items()},
                "through": src_head,
            }
        },
    )
    return M.latest_version(view_root)


def matview_refresh(spark: SparkSession, view_root: str) -> tuple[int, int]:
    """Incremental refresh: fold the source change feed in
    ``(through, src_head]`` into per-group deltas and apply them as one
    atomic MERGE. Idempotent — when the source has not advanced, or a
    re-run finds the watermark already at head, nothing commits.
    Returns ``(view_head, n_delta_groups)``."""
    spec = _spec_of(view_root)
    if spec.get("kind") == "join":
        raise ValueError(
            f"{view_root} is a join view — use matview_join_refresh"
        )
    src_root, keys = spec["src"], spec["keys"]
    aggs = {c: tuple(v) for c, v in spec["aggs"].items()}
    through = spec["through"]
    src_head = M.latest_version(src_root)
    if src_head <= through:
        return M.latest_version(view_root), 0
    cnt_col = next(c for c, (k, _) in aggs.items() if k == "count")

    feed = M.read_change_feed(spark, src_root, through, src_head)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta_exprs = []
    for col, (kind, src) in aggs.items():
        term = sign if kind == "count" else sign * F.col(src)
        delta_exprs.append(F.sum(term).cast("long").alias(col))
    delta = (
        feed.groupBy(*keys)
        .agg(*delta_exprs)
        # all-zero delta groups (e.g. an update rewrote a row with the
        # same aggregate contribution) would rewrite their view rows
        # for nothing — drop them
        .where(
            " OR ".join(f"{c} <> 0" for c in aggs)
        )
    )
    new_spec = {**spec, "through": src_head}
    n_groups = delta.count()
    if n_groups == 0:
        # source advanced with no net row change (compaction, z-order,
        # empty commits): advance the watermark with a data-less commit
        view_schema = M.read_snapshot(spark, view_root).schema
        M.manifest_append(
            spark.createDataFrame([], view_schema),
            view_root,
            extra={_SPEC_KEY: new_spec},
        )
        return M.latest_version(view_root), 0
    M.manifest_merge_into(
        spark,
        view_root,
        delta,
        keys,
        # a group whose count reaches zero has no live source rows —
        # it leaves the view (evaluated FIRST, like a CDC tombstone)
        matched_delete_condition=f"t.{cnt_col} + s.{cnt_col} = 0",
        matched_update={
            c: F.expr(f"t.{c} + s.{c}") for c in aggs
        },
        not_matched_insert=True,
        extra={_SPEC_KEY: new_spec},
    )
    return M.latest_version(view_root), n_groups


# ---------------------------------------------------------------------------
# Aggregate-over-JOIN views (two-table incremental view maintenance).
# The delta algebra is the textbook IVM identity: with A_new = A_old+ΔA,
#   J_new − J_old = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
# — exact, no overlap term (the ΔA⋈ΔB cross term is inside ΔA⋈B_new).
# Each feed row carries a ±1 sign; joined delta rows keep their side's
# sign, per-group folds give the aggregate delta, and the same MERGE
# apply/watermark protocol as the single-table view finishes the job.
# Cost ∝ |ΔA| + |ΔB| joined against ONE snapshot each (bloom/stat
# pruning applies) — never a recompute of the full join.
# ---------------------------------------------------------------------------


def matview_join_create(
    spark: SparkSession,
    src_a: str,
    src_b: str,
    view_root: str,
    join_key: list[str] | str,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
) -> int:
    """Full build of ``SELECT keys, aggs FROM A JOIN B USING join_key
    GROUP BY keys`` at both sources' current heads. Non-join columns of
    the two sources must not collide (qualified views are a rebuild
    concern, not a refresh one). Same additive-aggregate rules as
    :func:`matview_create`."""
    import os

    jk = [join_key] if isinstance(join_key, str) else list(join_key)
    kinds = [k for k, _ in aggs.values()]
    bad = [k for k in kinds if k not in _SUPPORTED]
    if bad:
        raise ValueError(
            f"unsupported aggregate kind(s) {bad}: only additive"
            f" {list(_SUPPORTED)} can be maintained from delta feeds"
        )
    if kinds.count("count") != 1:
        raise ValueError(
            "exactly one aggregate must be a count — it witnesses"
            " group liveness for the refresh's delete clause"
        )
    ha, hb = M.latest_version(src_a), M.latest_version(src_b)
    a = M.read_snapshot(spark, src_a, ha)
    b = M.read_snapshot(spark, src_b, hb)
    clash = (set(a.columns) & set(b.columns)) - set(jk)
    if clash:
        raise ValueError(
            f"non-join columns collide across sources: {sorted(clash)}"
        )
    view = a.join(b, jk).groupBy(*keys).agg(*_agg_exprs(aggs))
    M.manifest_init(view_root)
    M.manifest_append(
        view.repartition(
            max(1, min(4, spark.sparkContext.defaultParallelism))
        ),
        view_root,
        extra={
            _SPEC_KEY: {
                "kind": "join",
                "src_a": os.path.abspath(src_a),
                "src_b": os.path.abspath(src_b),
                "join_key": jk,
                "keys": list(keys),
                "aggs": {c: [k, s] for c, (k, s) in aggs.items()},
                "through_a": ha,
                "through_b": hb,
            }
        },
    )
    return M.latest_version(view_root)


def _signed_feed(spark, root: str, since: int, until: int) -> DataFrame:
    feed = M.read_change_feed(spark, root, since, until)
    return feed.withColumn(
        "__sign",
        F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        ),
    ).drop("_change_type")


def matview_join_refresh(
    spark: SparkSession, view_root: str
) -> tuple[int, int]:
    """Incremental refresh of a join view:
    ``ΔJ = ΔA ⋈ B@head_b  ∪  A@through_a ⋈ ΔB`` folded per group and
    applied as one atomic MERGE carrying both new watermarks.
    Idempotent when neither source advanced. Returns
    ``(view_head, n_delta_groups)``."""
    spec = _spec_of(view_root)
    if spec.get("kind") != "join":
        raise ValueError(
            f"{view_root} is a single-table view — use matview_refresh"
        )
    src_a, src_b = spec["src_a"], spec["src_b"]
    jk, keys = spec["join_key"], spec["keys"]
    aggs = {c: tuple(v) for c, v in spec["aggs"].items()}
    ta, tb = spec["through_a"], spec["through_b"]
    ha, hb = M.latest_version(src_a), M.latest_version(src_b)
    if ha <= ta and hb <= tb:
        return M.latest_version(view_root), 0
    cnt_col = next(c for c, (k, _) in aggs.items() if k == "count")

    parts = []
    if ha > ta:
        # ΔA against B at its NEW head
        parts.append(
            _signed_feed(spark, src_a, ta, ha).join(
                M.read_snapshot(spark, src_b, hb), jk
            )
        )
    if hb > tb:
        # A at its OLD watermark against ΔB
        parts.append(
            M.read_snapshot(spark, src_a, ta).join(
                _signed_feed(spark, src_b, tb, hb), jk
            )
        )
    joined = parts[0]
    for p in parts[1:]:
        joined = joined.unionByName(p)

    delta_exprs = []
    for col, (kind, src) in aggs.items():
        term = (
            F.col("__sign")
            if kind == "count"
            else F.col("__sign") * F.col(src)
        )
        delta_exprs.append(F.sum(term).cast("long").alias(col))
    delta = (
        joined.groupBy(*keys)
        .agg(*delta_exprs)
        .where(" OR ".join(f"{c} <> 0" for c in aggs))
    )
    new_spec = {**spec, "through_a": ha, "through_b": hb}
    n_groups = delta.count()
    if n_groups == 0:
        view_schema = M.read_snapshot(spark, view_root).schema
        M.manifest_append(
            spark.createDataFrame([], view_schema),
            view_root,
            extra={_SPEC_KEY: new_spec},
        )
        return M.latest_version(view_root), 0
    M.manifest_merge_into(
        spark,
        view_root,
        delta,
        keys,
        matched_delete_condition=f"t.{cnt_col} + s.{cnt_col} = 0",
        matched_update={c: F.expr(f"t.{c} + s.{c}") for c in aggs},
        not_matched_insert=True,
        extra={_SPEC_KEY: new_spec},
    )
    return M.latest_version(view_root), n_groups
