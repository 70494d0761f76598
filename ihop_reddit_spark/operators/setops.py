"""Set operations (SURVEY §2.7, U1-U2).

The reference does these driver-side in pandas (``app.py:626-628``) or on
Python dict key-sets (``ihop/clustering.py:163-169``); here they are
distributed DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def union_dedup(left: DataFrame, right: DataFrame) -> DataFrame:
    """U1 — union by name + exact dedup (``pd.concat(...).drop_duplicates()``
    at ``app.py:626-628``). ``dropDuplicates`` is a hash aggregate on all
    columns — one shuffle; prefer key-scoped dedup when a key exists.
    """
    return left.unionByName(right).dropDuplicates()


def key_alignment(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    fill: dict | None = None,
) -> DataFrame:
    """U2 — align two keyed tables on the intersection (inner) or union
    (full_outer) of their key sets, with missing-side fill values.

    Reference: cluster-comparison universes ``keys() & keys()`` / ``|`` with
    missing cluster id −1 (``ihop/clustering.py:40-42, 163-175``).
    """
    joined = left.join(right, key, how)
    if fill:
        joined = joined.na.fill(fill)
    return joined


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Content-addressed Bernoulli sample: keep a row iff the first 8 hex
    digits of ``md5(salt ∥ key)`` fall below ``floor(fraction · 16^8)``.

    The complement of :func:`stratified_sample`'s RNG sampling: selection is
    a pure function of row CONTENT, so the sample is identical across
    engines, runs, partitionings, and cluster sizes — the property a
    training-data pipeline needs for reproducible held-out splits. At scale
    it is a narrow filter (no shuffle, no seed-plumbing, no sampleBy
    stats job); granularity is 16^-8 ≈ 4e-10 of ``fraction``. Different
    ``salt`` values draw independent samples from the same keys (e.g.
    train/validation splits that stay disjoint under re-runs).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction == 0.0:
        return df.where(F.lit(False))
    threshold = int(fraction * 16**8)
    if threshold >= 16**8:
        return df
    digest = F.md5(
        F.concat_ws("\x1e", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    )
    return df.where(F.substring(digest, 1, 8) < F.lit(format(threshold, "08x")))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 100,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``df.sampleBy`` — E2's stratified
    sampling surface, ``ihop/annotation_task_export.py:106-190``, made an
    explicit operator).

    Deterministic for a fixed seed AND fixed partitioning of the input —
    reproducible within Spark, NOT across engines (exports that must be
    cross-engine-stable use content-addressed md5 choice instead, see
    ``ml/exports.py``). Strata missing from ``fractions`` are dropped
    (sampleBy semantics).
    """
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    broadcast_delta: bool = True,
) -> DataFrame:
    """Apply a change batch to a snapshot: delta rows win on key collision,
    base rows without a delta survive unchanged (MERGE ... WHEN MATCHED THEN
    UPDATE WHEN NOT MATCHED THEN INSERT, as a pure transformation — the
    engine's tables are immutable parquet snapshots, so "merge" produces the
    next snapshot rather than mutating in place).

    Plan: one left-anti join of base against the delta key set + a union.
    Deltas are small relative to the snapshot in steady state — broadcast by
    default, so the 100 TB base never shuffles; pass ``broadcast_delta=False``
    for backfill-sized deltas (falls back to a key-partitioned shuffle join,
    AQE-handled).
    """
    delta_keys = delta.select(*keys)
    if broadcast_delta:
        delta_keys = F.broadcast(delta_keys)
    keep = base.join(delta_keys, keys, "left_anti")
    return keep.select(*base.columns).unionByName(delta.select(*base.columns))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two snapshot versions: one row per key that was
    ``added``, ``removed``, or ``changed`` (any compare col differs,
    null-safe); unchanged keys are dropped. The audit/CDC primitive for
    dataset versioning — "what did this rebuild change?".

    Plan: one full-outer shuffle join on the key (both sides hash-partition;
    skew on key is data-model skew, not plan skew). Comparison is null-safe
    ``<=>`` so NULL→value and value→NULL count as changes.
    """
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_n"),
    )
    j = o.join(n, keys, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*keys, "change")
    )


#: Open-ended validity sentinel for SCD2 rows (epoch seconds, year ~2286).
#: A sentinel rather than NULL keeps range predicates sargable
#: (``valid_from <= t AND t < valid_to``) and cross-engine hash-stable.
SCD2_OPEN_END = 9_999_999_999


def scd2_init(
    snapshot: DataFrame,
    keys: list[str],
    tracked: list[str],
    *,
    valid_from: int = 0,
) -> DataFrame:
    """Seed a type-2 slowly-changing-dimension history from a snapshot:
    every key gets one open row valid from ``valid_from``."""
    return snapshot.select(
        *keys,
        *tracked,
        F.lit(valid_from).cast("long").alias("valid_from"),
        F.lit(SCD2_OPEN_END).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    history: DataFrame,
    delta: DataFrame,
    keys: list[str],
    tracked: list[str],
    eff: int,
    *,
    broadcast_delta: bool = True,
) -> DataFrame:
    """Apply a change batch to an SCD2 history table (Kimball type-2):

    * key exists and any tracked column differs (null-safe) → the open row
      is CLOSED at ``eff`` and a new open row is inserted;
    * key exists and all tracked columns match → no-op;
    * brand-new key → inserted as an open row from ``eff``;
    * closed (historical) rows pass through untouched.

    Like :func:`merge_upsert`, this is a pure snapshot→snapshot
    transformation. Plan: the delta is broadcast (dimension deltas are
    small in steady state) into one inner probe + two anti probes against
    the current slice — the 100 TB history never shuffles. Pass
    ``broadcast_delta=False`` for backfill-sized deltas.

    ``history`` must carry ``valid_from``/``valid_to``/``is_current``
    (see :func:`scd2_init`); ``delta`` carries ``keys + tracked``.

    Duplicate keys WITHIN one delta batch are resolved deterministically
    to the per-key ``max(struct(tracked))`` row before the probe —
    without this, each duplicate would join the open row and emit its
    own replacement, silently corrupting the one-open-row-per-key
    invariant. (Tracked columns must therefore be orderable types,
    which SCD2 scalars are.)
    """
    if not tracked:
        # an SCD2 with no tracked columns has nothing to version; the
        # change predicate below would be vacuous (differs stays None)
        raise ValueError("scd2_apply requires at least one tracked column")
    d = (
        delta.select(*keys, *tracked)
        .groupBy(*keys)
        .agg(
            F.max(F.struct(*[F.col(c) for c in tracked])).alias("__t")
        )
        .select(*keys, *[F.col(f"__t.{c}").alias(c) for c in tracked])
    )
    d_plain = d  # un-hinted frame for probes where d is the LEFT side
    if broadcast_delta:
        d = F.broadcast(d)
    cur = history.where(F.col("is_current"))
    closed_hist = history.where(~F.col("is_current"))

    dd = d.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__d_{c}") for c in tracked],
    )
    probe = cur.join(dd, keys, "inner")
    differs = None
    for c in tracked:
        ne = ~F.col(c).eqNullSafe(F.col(f"__d_{c}"))
        differs = ne if differs is None else (differs | ne)
    changed = probe.where(differs)

    closed_now = changed.select(
        *keys,
        *tracked,
        F.col("valid_from"),
        F.lit(eff).cast("long").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    replacements = changed.select(
        *keys,
        *[F.col(f"__d_{c}").alias(c) for c in tracked],
        F.lit(eff).cast("long").alias("valid_from"),
        F.lit(SCD2_OPEN_END).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changed_keys = changed.select(*keys)
    if broadcast_delta:
        changed_keys = F.broadcast(changed_keys)
    untouched_cur = cur.join(changed_keys, keys, "left_anti")

    # New-key detection stays delta-sized on BOTH sides: the delta keys
    # that found a current row (probe output ≤ |delta|) are the existing
    # set — never materialize/broadcast the history's own key set.
    matched_keys = probe.select(*keys)
    if broadcast_delta:
        matched_keys = F.broadcast(matched_keys)
    # insert from the DEDUPED delta — the raw frame could still carry
    # duplicate new keys, which would each insert an open row
    new_inserts = (
        d_plain.join(matched_keys, keys, "left_anti")
        .select(
            *keys,
            *tracked,
            F.lit(eff).cast("long").alias("valid_from"),
            F.lit(SCD2_OPEN_END).cast("long").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    cols = [*keys, *tracked, "valid_from", "valid_to", "is_current"]
    out = closed_hist.select(*cols)
    for part in (untouched_cur, closed_now, replacements, new_inserts):
        out = out.unionByName(part.select(*cols))
    return out


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    id_col: str,
    k: int,
    salt: str = "wspg",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, ``k`` rows per group —
    algorithm A-ES (Efraimidis & Spirakis): each row draws an
    exponential key ``E/w`` (``E ~ Exp(1)``) and the ``k`` smallest keys
    per group form a sample ∝ weight without replacement.

    Derandomized exactly like dsir_resample: the uniform is the md5 of
    ``(salt, id)`` — the sample is a pure function of (data, salt) and
    reproducible on any engine. Keys are compared in the log domain
    (``ln(−ln u) − ln w``, same ordering, relative resolution) rounded
    to 4 decimals with an id tie-break, the engine's standard guard
    against cross-libm ulp drift.

    Plan: one row-local key projection + one per-group window (single
    shuffle on the group key). No global sort.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1e", F.lit(salt), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    skey = F.round(
        F.log(-F.log(u)) - F.log(F.col(weight_col).cast("double")), 4
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("skey").asc(), F.col(id_col).asc()
    )
    return (
        # weight <= 0 (or NULL) means probability 0 — exclude BEFORE the
        # window: ln(w) is NULL there and NULLs would sort FIRST under the
        # ascending key, inverting the sampling semantics
        df.where(F.col(weight_col) > 0)
        .withColumn("skey", skey)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    fact_time: Column,
    *,
    time_alias: str = "__t",
) -> DataFrame:
    """Point-in-time dimension lookup: join each fact row to the SCD2
    version that was valid AT ITS OWN event time
    (``valid_from <= t < valid_to``) — the leakage-free way to enrich
    facts with dimension attributes (an as-of enrichment against history,
    not today's snapshot).

    Plan: one equi-join shuffle pair on the key; the temporal predicate
    is a post-join filter. Validity intervals partition time per key, so
    each fact matches at most one version — fan-in is versions-per-key
    (small by construction), never a range explosion.
    """
    f = facts.withColumn(time_alias, fact_time)
    j = f.join(history, keys, "inner")
    return (
        j.where(
            (F.col("valid_from") <= F.col(time_alias))
            & (F.col(time_alias) < F.col("valid_to"))
        )
        .drop(time_alias)
    )
