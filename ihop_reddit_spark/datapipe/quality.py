"""Declarative data-quality checks (deequ/dbt-test-style): violation counts
per named rule in one pass, plus referential-integrity checks.

A training-data pipeline gates every ingest and rebuild on these (schema
drift, null regressions, key uniqueness, FK orphans); the reference has no
equivalent — its quality notion is per-document text scoring
(``functions/text.quality_score``), which this complements at the table
level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    violations: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """One row per rule: (rule, violations, n_rows, violation_rate).

    ``violations`` maps rule name → boolean Column that is TRUE for a
    violating row (row-local predicates: nulls, ranges, regex, cross-column
    invariants). ``unique_keys`` maps rule name → key column list whose
    duplicate count (n_rows − n_distinct) is the violation count.

    Plan: a single aggregate over the table — every row-local rule is a
    conditional sum inside ONE map-side-partial aggregation, so the cost of
    checking 50 rules equals the cost of checking one table scan. Distinct
    key rules ride the same aggregate as count_distinct (Catalyst expands;
    still one pass over the scan). The result is rule-count-sized; the
    unpivot to rows is a zero-shuffle Expand.
    """
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"__v_{name}")
        for name, cond in violations.items()
    ]
    for name, keys in (unique_keys or {}).items():
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(*[F.col(k) for k in keys])
            ).cast("long").alias(f"__v_{name}")
        )
    aggs.append(F.count(F.lit(1)).cast("long").alias("__n"))
    wide = df.agg(*aggs)
    names = list(violations.keys()) + list((unique_keys or {}).keys())
    stack_args = ", ".join(f"'{n}', __v_{n}" for n in names)
    long = wide.select(
        F.expr(f"stack({len(names)}, {stack_args}) as (rule, violations)"),
        F.col("__n").alias("n_rows"),
    )
    return long.select(
        "rule",
        "violations",
        "n_rows",
        (F.col("violations").cast("double") / F.col("n_rows")).alias(
            "violation_rate"
        ),
    )


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    fk: list[str],
    pk: list[str] | None = None,
    rule: str = "fk_orphans",
    broadcast_parent: bool = True,
) -> DataFrame:
    """FK orphan check: child rows whose key has no parent — one row
    (rule, violations, n_rows, violation_rate).

    Plan: broadcast left-anti join against the **distinct parent key set**
    (dimension-sized) — the child fact table never shuffles. For
    fact-fact integrity pass ``broadcast_parent=False`` so the parent
    key set shuffles and AQE picks the join (a fact-sized forced
    broadcast aborts at the 8 GiB exchange limit).
    """
    pk = pk or fk
    keys = parent.select(
        *[F.col(p).alias(f) for p, f in zip(pk, fk)]
    ).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = child.join(keys, fk, "left_anti")
    n = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    v = orphans.agg(F.count(F.lit(1)).cast("long").alias("violations"))
    return (
        v.crossJoin(n)
        .select(
            F.lit(rule).alias("rule"),
            "violations",
            "n_rows",
            (F.col("violations").cast("double") / F.col("n_rows")).alias(
                "violation_rate"
            ),
        )
    )


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Partition-skew diagnostic for a prospective join/agg key: the top-N
    heaviest key values with their share of all rows and the skew ratio
    vs a perfectly uniform key (share × distinct-key count).

    This is the table you read BEFORE keying a 100 TB shuffle: a key whose
    top value holds 30% of rows serializes 30% of the data into one task —
    the number that says "salt this join" (``operators/joins.salted_join``)
    or "pick another partitioning". One shuffle on the key builds the
    per-key counts; everything downstream (totals, ranking) runs on the
    key-cardinality-sized frame, broadcast back — never a second pass over
    the data.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    ranked = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "cnt",
            (F.col("cnt").cast("double") / F.col("__total")).alias("share"),
            (
                F.col("cnt").cast("double") * F.col("__n_keys") / F.col("__total")
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(top_n)
    )
    return ranked


def heavy_hitters_gate(
    df: DataFrame,
    key_col: str,
    support: float = 0.2,
) -> DataFrame:
    """Single-pass approximate heavy hitters (``DataFrame.stat.freqItems``,
    Karp-Shenker-Papadimitriou) checked against its algorithmic guarantee:
    the candidate set CONTAINS every key with true share ≥ support
    (supersets allowed — that is the contract; false positives are pruned
    by one exact count pass over the candidate list only).

    Returns one row: (n_true_heavy, all_heavy_found). At 100 TB the sketch
    pass is constant memory per partition vs the exact groupBy's shuffle of
    the full key set — the gate proves the cheap path is trustworthy on
    driver data.
    """
    candidates = set(
        df.stat.freqItems([key_col], support).first()[0] or []
    )
    exact = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(
            F.broadcast(df.agg(F.count(F.lit(1)).alias("__total")))
        )
        .where(F.col("cnt").cast("double") / F.col("__total") >= support)
    )
    true_heavy = [r[key_col] for r in exact.select(key_col).collect()]
    found = all(k in candidates for k in true_heavy)
    spark = df.sparkSession
    return spark.range(1).select(
        F.lit(len(true_heavy)).cast("long").alias("n_true_heavy"),
        F.lit(bool(found)).alias("all_heavy_found"),
    )


def table_fingerprint(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive content fingerprint for dataset integrity checks
    (migration/copy/compaction verification): one row
    (n_rows, xor_hash, sum_hash) that any engine reproduces from the same
    data regardless of row order or partitioning.

    Per row: md5 over the unit-separator-joined canonical strings of
    ``cols`` (sorted names; NULL → chr(0)), first 15 hex digits as int64.
    Reduced by COUNT, BIT_XOR (permutation-invariant, no overflow), and a
    modular sum (mod 1e9+7; second independent accumulator so a pair of
    rows whose hashes XOR-cancel still shifts the sum). Restrict ``cols``
    to integer/string columns — float-to-string rendering is not
    cross-engine stable.
    """
    use = sorted(cols or df.columns)
    canon = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in use
            ],
        )
    )
    h = F.conv(F.substring(canon, 1, 15), 16, 10).cast("long")
    p = 1_000_000_007
    return df.select(h.alias("__h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(__h)").alias("xor_hash"),
        (
            F.sum(F.pmod(F.col("__h"), F.lit(p)).cast("decimal(38,0)"))
            % F.lit(p)
        )
        .cast("long")
        .alias("sum_hash"),
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile — (column, n_nulls, n_distinct, min_value,
    max_value) with values rendered as strings so one narrow schema covers
    every column type. The ingest-time companion to
    :func:`constraint_report`: constraints check what you EXPECT, the
    profile shows what arrived.

    One pass: a single wide aggregate computes every column's stats
    simultaneously (Catalyst evaluates all aggregates in one
    HashAggregate over one scan), then a literal unpivot to long form —
    adding columns adds expressions, never passes. Exact distinct counts
    keep the result oracle-comparable; at 100 TB swap
    ``approx_count_distinct`` in via ``approx=True`` (constant memory,
    no exactness contract).
    """
    use = cols or df.columns
    aggs = []
    for c in use:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__nn_{c}"),
            F.count_distinct(col).alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in use
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select("p.*")
