"""Join operators (SURVEY §2.3, J1-J3 + range-join generalization).

Scale notes baked into each operator:

* Membership filters against small derived tables (top-N vocabularies) are
  LEFT SEMI joins with an explicit ``broadcast`` hint — no shuffle of the big
  side, no duplicate-row inflation, and Catalyst rewrites them to a broadcast
  hash semi-join.
* The big fact-to-fact equi-join shuffles both sides by the join key; AQE
  handles skew (skewJoin) and coalesces post-shuffle partitions. At 100 TB,
  pre-bucketing both tables on the join key removes this shuffle entirely —
  see ``sources/io.py:write_bucketed``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .projections import rename_with_prefix, with_difference, with_prefixed_id


def semi_join_filter(
    df: DataFrame,
    keep: DataFrame,
    on: str | list[str] | Column,
    broadcast_keep: bool = True,
) -> DataFrame:
    """J1/J2 — keep rows of ``df`` whose key appears in ``keep`` (left semi).

    Reference: ``ihop/import_data.py:63-72`` (``filter_top_n``: keep comments
    whose subreddit is in the top-N table) and ``:293-297`` (keep non-top
    users). The reference relies on auto-broadcast; we hint explicitly so the
    plan is broadcast-semi even when stats are missing (e.g. post-shuffle).
    """
    right = F.broadcast(keep) if broadcast_keep else keep
    return df.join(right, on, "left_semi")


def anti_join_filter(
    df: DataFrame,
    remove: DataFrame,
    on: str | list[str] | Column,
    broadcast_remove: bool = True,
) -> DataFrame:
    """Complement of :func:`semi_join_filter` (left anti).

    Not in the reference's surface (it re-derives the keep-set instead,
    ``ihop/import_data.py:280-297``) but the direct expression of "exclude
    these keys" — one broadcast anti-join instead of an extra aggregation.
    """
    right = F.broadcast(remove) if broadcast_remove else remove
    return df.join(right, on, "left_anti")


def join_submissions_and_comments(
    submissions: DataFrame,
    comments: DataFrame,
    submission_id_col: str = "id",
    comment_link_col: str = "link_id",
    submission_ts_col: str = "created_utc",
    comment_ts_col: str = "created_utc",
    comment_prefix: str = "comments_",
    fullname_prefix: str = "t3_",
    time_delta_col: str = "time_to_comment_in_seconds",
) -> DataFrame:
    """J3+P6+P7+P8 — thread join: submissions × their comments + time delta.

    Reference: ``ihop/import_data.py:369-419`` (prefix comment columns, build
    ``fullname_id = 't3_' + id``, inner join on ``fullname_id == link_id``,
    derive ``time_to_comment_in_seconds``). Fact-to-fact shuffle join; both
    sides hash-partition on the thread id, which is also the natural bucketing
    key for materialized thread tables.
    """
    subs = with_prefixed_id(submissions, submission_id_col, fullname_prefix, "fullname_id")
    renamed = rename_with_prefix(comments, comments.columns, comment_prefix)
    joined = subs.join(
        renamed,
        subs["fullname_id"] == renamed[f"{comment_prefix}{comment_link_col}"],
        "inner",
    )
    return with_difference(
        joined,
        f"{comment_prefix}{comment_ts_col}",
        submission_ts_col,
        time_delta_col,
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_cond: Column,
    delta: Column,
    lower=None,
    upper=None,
) -> DataFrame:
    """Generalized time-window join (J3+P5 as one condition).

    The reference expresses "comments within T of submission" as join-then-
    filter; Catalyst pushes the range predicate into the join anyway, but
    declaring it in the join condition keeps the intent explicit and lets the
    planner consider it for partition pruning. Bounds are exclusive, matching
    P5 (``ihop/import_data.py:343-366``).
    """
    cond = equi_cond
    if lower is not None:
        cond = cond & (delta > F.lit(lower))
    if upper is not None:
        cond = cond & (delta < F.lit(upper))
    return left.join(right, cond, "inner")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
    force_shuffle: bool = True,
) -> DataFrame:
    """Skew-mitigating equi-join: salt the big side, replicate the small side.

    The AQE skew-join rescue only splits partitions it SEES as skewed at
    shuffle time and only for sort-merge joins; a join whose key is
    intrinsically low-cardinality (e.g. events × per-event-type dimension)
    concentrates each hot key in ONE task regardless. Salting fixes the
    partitioning itself:

    * left rows get ``__salt = pmod(xxhash64(all join keys, uid), n)`` —
      derived, not ``rand()``, so replays/retries are deterministic;
    * the right side is exploded ×``n_salts`` (it must be the SMALL side —
      replication cost is ``n_salts × |right|``);
    * the join key becomes ``(keys…, __salt)``, so each formerly-hot key now
      spreads over ``n_salts`` tasks.

    Output equals the unsalted join bit-for-bit (every left row still meets
    every right row of its key exactly once). Supported ``how``: inner /
    left / left_semi / left_anti — right-side-preserving joins would
    duplicate unmatched right rows ×``n_salts`` and are rejected.

    ``force_shuffle`` hints ``shuffle_hash`` on the replicated side: if
    Catalyst auto-broadcasts the right side the salt is dead weight, and a
    shuffled hash join on (keys, salt) is the balanced plan this operator
    exists to produce. Complements :func:`aggregates.grouped_concat_salted`
    (two-phase agg) — this is the join-shaped skew tool.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    for df in (left, right):
        if "__salt" in df.columns:
            raise ValueError("__salt column name is reserved")
    # monotonically_increasing_id decorrelates the salt from the key hash so
    # rows of ONE hot key still spread; it never affects the join result.
    salted_left = left.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*keys, F.monotonically_increasing_id()), F.lit(n_salts)
        ).cast("int"),
    )
    replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    if force_shuffle:
        replicated = replicated.hint("shuffle_hash")
    out = salted_left.join(replicated, keys + ["__salt"], how)
    keep = [c for c in out.columns if c != "__salt"]
    return out.select(keep)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    right_prefix: str = "asof_",
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gets the closest right row for the same
    key(s) — ``direction="backward"`` (default) the latest right with
    ``right_ts <= left_ts``, ``direction="forward"`` the earliest right
    with ``right_ts >= left_ts``; unmatched rows keep NULLs.

    Not in the reference (SURVEY §2.3 "not present" row) — added because
    time-aligned enrichment is a staple the J3+P5 pattern only approximates.

    Spark-first plan: instead of a range join (which explodes to |L|×|R| per
    key before filtering), tag both sides, UNION them, and run ONE window
    pass per key ordered by (ts, side): ``last(right_payload, ignorenulls)``
    over an unbounded-preceding frame carries the latest right row forward
    onto each left row. Cost = one shuffle on the key + an in-partition sort
    — the same plan shape DuckDB/Pandas use for ASOF, fully distributed.
    Right rows sort BEFORE left rows at equal ts, so the match is inclusive.
    At equal (key, ts) on the right, the row sorting last wins — pre-dedup
    the right side for full determinism. Heavily skewed keys: pre-split hot
    keys (window skew is not AQE-rescued).

    ``tolerance``: max allowed gap (``left_ts - right_ts`` backward,
    ``right_ts - left_ts`` forward); staler matches null out (pandas
    ``merge_asof`` semantics).

    Forward is the SAME one-window plan run over descending timestamps:
    in a descending frame, "preceding" rows are the later-or-equal ones,
    so the carried-forward last right payload is the earliest
    ``right_ts >= left_ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    rpayload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rpayload.alias("__r"),
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    from pyspark.sql import Window

    u = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType)).unionByName(l)
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    if tolerance is not None:
        gap = (
            F.col("__ts") - F.col("__m.__rts")
            if direction == "backward"
            else F.col("__m.__rts") - F.col("__ts")
        )
        matched = matched.withColumn(
            "__m", F.when(gap <= F.lit(tolerance), F.col("__m"))
        )
    out = matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__m.__rts").alias(f"{right_prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in right_cols],
    )
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bucket_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Interval × interval overlap join via bucket banding — the scale path
    for a join Spark has no native strategy for: without a selective equi
    key, ``a.start <= b.end AND b.start <= a.end`` plans as a
    nested-loop/cartesian and explodes at any real volume.

    Each interval explodes into the coarse time buckets it covers
    (``sequence(start div W, end div W)``); the join becomes an EQUI join
    on (keys..., bucket) — hash-partitioned, AQE-skew-splittable — then the
    exact overlap predicate filters survivors. Duplicate candidates from
    multi-bucket overlaps are eliminated WITHOUT a distinct: a pair is kept
    only in the bucket where their overlap starts
    (``greatest(l_start, r_start) div W``), which both sides provably
    cover. Choose ``bucket_width`` near the typical interval length: cost
    is (interval_len/W + 1) candidate rows per interval vs |bucket
    population|² pair work within a bucket.

    Bounds are INCLUSIVE integer columns (epoch seconds/micros — use
    ``functions/event_time`` accessors upstream). Returns matched pairs
    with all columns of both inputs; name-collision management is the
    caller's (prefix-rename upstream).
    """
    ls, le = left_bounds
    rs, re_ = right_bounds
    w = int(bucket_width)
    lb = left.withColumn(
        "__lb", F.expr(f"explode(sequence({ls} div {w}, {le} div {w}))")
    )
    rb = right.withColumn(
        "__rb", F.expr(f"explode(sequence({rs} div {w}, {re_} div {w}))")
    )
    cond = F.col("__lb") == F.col("__rb")
    for k in keys or []:
        cond = cond & (lb[k] == rb[k])
    out = (
        lb.join(rb.drop(*(keys or [])), cond)
        .where(
            (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))
        )
        # overlap-start bucket: the unique bucket both intervals cover
        .where(
            F.col("__lb")
            == F.expr(f"greatest({ls}, {rs}) div {w}")
        )
    )
    return out.drop("__lb", "__rb")
