"""Multi-dimensional data layout: Morton (z-order) interleaving + a
z-clustered parquet writer.

Sorting a 100 TB table by one column gives file-level min/max pruning on
that column only; queries filtering the OTHER dimension scan everything.
Interleaving the bits of two key columns into one z-value and range-
partitioning + sorting on it bounds every file to a small hyper-rectangle in
BOTH dimensions, so parquet row-group/file statistics prune selective
filters on either column (the Delta OPTIMIZE ZORDER / Iceberg sort-order
technique). The z-value is pure Catalyst bit arithmetic — portable and
oracle-checkable; the layout win is asserted by measuring per-file min/max
spans in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton code of two non-negative ints already reduced to ``bits`` bits
    (caller normalizes, e.g. ``col % 1024`` or a rank/width bucket): x's bit
    i lands at even position 2i, y's at odd 2i+1. A fold of shift/and/or
    expressions — whole-stage-codegen'd, no UDF.
    """
    z = F.lit(0).cast("long")
    xs, ys = x.cast("long"), y.cast("long")
    for i in range(bits):
        xbit = F.shiftleft(
            F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i
        )
        ybit = F.shiftleft(
            F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = z.bitwiseOR(xbit).bitwiseOR(ybit)
    return z


def morton_sql(x: str, y: str, bits: int = 10) -> str:
    """The equivalent ANSI-SQL expression (bit ops are portable), for
    differential oracles and for engines applying the same layout."""
    terms = []
    for i in range(bits):
        # fully parenthesized — engines disagree on <<, &, | precedence
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    num_files: int,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on z(x, y): range-partition on the
    z-value (balanced via Spark's range sampling) and sort within each
    partition, so each output file covers a contiguous z-range ⇒ a bounded
    rectangle in (x, y). Readers need nothing special — parquet min/max
    stats on the ORIGINAL columns do the pruning.
    """
    z = zvalue(x, y, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
