"""PMI / Popescul-Ungar cluster labeling (M11), fully distributed.

Reference: ``notebooks/pointwise_mutual_info_cluster_labels.ipynb`` cells 7,
12-14 — per-cluster term-frequency vector sums (A9) pulled to the driver and
scored with numpy ``log2(P(t|c) / P(t))``. Here the whole computation is four
Spark aggregations + two joins, so it scales past driver memory:

* token counts per (class, term) — shuffle on (class, term), map-side combine
* class totals — tiny, broadcast back
* term totals — the vocabulary aggregate, shuffle on term
* grand total — scalar, crossJoin(broadcast)

``lift`` = P(t|c)/P(t) = (n_tc·N)/(n_c·n_t) is kept as one double division of
exact int64 products (counts < 2²⁶ keep products < 2⁵³ — exact), so results
are bit-identical across engines; ``pmi = log2(lift)`` is derived at the edge
(log2 is the only step that can differ by an ulp across libms, so the oracle
gate runs on ``lift``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.windows import top_k_per_group


def pmi_term_labels(
    df: DataFrame,
    class_col: str,
    text_col: str,
    sep: str = " ",
    min_count: int = 5,
    top_k: int | None = 10,
    with_pmi: bool = False,
) -> DataFrame:
    """Top PMI-lift terms per class: (class, term, n_tc, n_c, n_t, lift[, pmi], rank)."""
    toks = df.select(
        F.col(class_col),
        F.explode(F.split(F.lower(F.col(text_col)), sep)).alias("term"),
    )
    n_tc = toks.groupBy(class_col, "term").agg(F.count(F.lit(1)).alias("n_tc"))
    n_c = toks.groupBy(class_col).agg(F.count(F.lit(1)).alias("n_c"))
    n_t = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_t"))
    total = toks.select(F.count(F.lit(1)).alias("n_total"))
    scored = (
        n_tc.join(F.broadcast(n_c), class_col)
        .join(n_t, "term")
        .crossJoin(F.broadcast(total))
        .where(F.col("n_tc") >= min_count)
        .select(
            class_col,
            "term",
            "n_tc",
            "n_c",
            "n_t",
            (
                (F.col("n_tc") * F.col("n_total")).cast("double")
                / (F.col("n_c") * F.col("n_t"))
            ).alias("lift"),
        )
    )
    if with_pmi:
        scored = scored.withColumn("pmi", F.log2(F.col("lift")))
    if top_k is None:
        return scored
    out = top_k_per_group(
        scored, class_col, [F.col("lift").desc(), F.col("term").asc()], top_k
    )
    return out.withColumn("rank", F.col("rank").cast("long"))
