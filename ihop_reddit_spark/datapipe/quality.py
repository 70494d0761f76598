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
) -> DataFrame:
    """FK orphan check: child rows whose key has no parent — one row
    (rule, violations, n_rows, violation_rate).

    Plan: broadcast left-anti join against the **distinct parent key set**
    (dimension-sized) — the child fact table never shuffles. For fact-fact
    integrity pass a pre-aggregated parent key frame and let AQE pick the
    join.
    """
    pk = pk or fk
    keys = parent.select(
        *[F.col(p).alias(f) for p, f in zip(pk, fk)]
    ).distinct()
    orphans = child.join(F.broadcast(keys), fk, "left_anti")
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
