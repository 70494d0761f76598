"""Vector column expressions over ``array<float>`` embeddings.

Used by similarity search (M6 / north-star ANN) and the analogy evaluator
(M3). Two arithmetic modes:

* ``*_dec`` — EXACT decimal arithmetic: each float is cast to a fixed-scale
  decimal, products/sums are exact, and only the final scalar is cast back to
  double. Bit-identical on any engine / any partitioning → safe for the
  duckdb oracle and for reproducible thresholds.
* plain double (``dot``) — fastest JVM path for production ranking where
  last-ulp determinism doesn't matter.

All are higher-order functions (``zip_with``/``aggregate``) — JVM-side, no
Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Scale chosen so float32 in (-100, 100) casts without overflow and products
#: stay inside decimal(38,_) through the fold: (12,8)*(12,8) → (25,16); the
#: running sum is accumulated at decimal(38,16).
_ELEM_DEC = "decimal(12,8)"
_ACC_DEC = "decimal(38,16)"

#: Power-of-two quantization scale for the integer-exact path. Scaling a
#: float by 2^24 is EXACT (no rounding at all), and floor() of an exact
#: dyadic is engine-independent — unlike decimal casts, whose half-up vs
#: half-even rounding can differ across engines on tie values. With |v| < 128
#: and dim ≤ 2048: |q| < 2^31, |q·q| < 2^62/dim — fits int64.
QUANT_SCALE = 1 << 24


def quantize(a: Column, scale: int = QUANT_SCALE) -> Column:
    """array<float> → array<bigint>: ``floor(v * 2^24)`` per element (exact)."""
    return F.transform(a, lambda x: F.floor(x.cast("double") * F.lit(float(scale))))


def dot_q(a: Column, b: Column, scale: int = QUANT_SCALE) -> Column:
    """Integer-exact dot product of quantized vectors → double.

    Deterministic across engines AND partitionings (int64 sum is exact), so
    it is the oracle-comparable similarity kernel. Relative quantization
    error ~2^-24 — negligible for ranking.
    """
    qa, qb = quantize(a, scale), quantize(b, scale)
    total = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.lit(float(scale) * float(scale))


def cosine_q(a: Column, b: Column, scale: int = QUANT_SCALE) -> Column:
    """Deterministic cosine from integer-exact dot/norms (see :func:`dot_q`)."""
    return dot_q(a, b, scale) / (
        F.sqrt(dot_q(a, a, scale)) * F.sqrt(dot_q(b, b, scale))
    )


def raw_dot(qa: Column, qb: Column) -> Column:
    """int64 dot product of two PRE-quantized arrays (see :func:`quantize`).

    Hot-path kernel: quantization and norms are computed once per row before
    a pairwise join, so each pair costs exactly one fold — not three folds
    plus re-quantization (6× less work than ``cosine_q`` per pair).
    """
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def raw_norm(qa: Column) -> Column:
    """double sqrt of the int64 self-dot of a pre-quantized array."""
    return F.sqrt(raw_dot(qa, qa).cast("double"))


def dot_dec(a: Column, b: Column) -> Column:
    """Exact decimal dot product → double."""
    products = F.zip_with(a, b, lambda x, y: x.cast(_ELEM_DEC) * y.cast(_ELEM_DEC))
    total = F.aggregate(
        products,
        F.lit(0).cast(_ACC_DEC),
        lambda acc, x: acc + x.cast(_ACC_DEC),
    )
    return total.cast("double")


def norm_dec(a: Column) -> Column:
    """Exact decimal sum-of-squares → double sqrt (L2 norm)."""
    return F.sqrt(dot_dec(a, a))


def cosine_dec(a: Column, b: Column) -> Column:
    """Deterministic cosine similarity: exact decimal dot/norms, double
    division at the end (identical IEEE ops on identical inputs)."""
    return dot_dec(a, b) / (norm_dec(a) * norm_dec(b))


def dot(a: Column, b: Column) -> Column:
    """Double dot product — fast path (order-dependent in the last ulps)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def l2_normalize(a: Column) -> Column:
    """Scale to unit norm (double). Normalized vectors turn cosine ranking
    into dot-product ranking — do this ONCE at ingest, not per query."""
    n = F.sqrt(dot(a, a))
    return F.transform(a, lambda x: x.cast("double") / n)


def vec_add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x.cast("double") + y.cast("double"))


def vec_sub(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))


def quantize_int8(a: Column) -> Column:
    """Compress a float embedding to struct(scale DOUBLE, q ARRAY<TINYINT>).

    Max-abs symmetric int8 quantization — the storage format for embedding
    columns at corpus scale (4×/8× smaller than float32/float64 parquet,
    and still prunable/filterable). Pure higher-order expressions; round to
    nearest with ties away from zero (Spark ``round`` on DOUBLE).
    """
    absmax = F.aggregate(
        a, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(
        a, lambda x: F.round(x.cast("double") / scale).cast("tinyint")
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(packed: Column) -> Column:
    """Inverse of :func:`quantize_int8`: ARRAY<DOUBLE> ≈ original (abs error
    ≤ scale/2 = absmax/254 per element)."""
    return F.transform(
        packed["q"], lambda x: x.cast("double") * packed["scale"]
    )
