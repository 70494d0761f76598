"""Cluster-comparison metrics (SURVEY §2.10, M9-M10).

Reference: ``ihop/clustering.py:96-350`` computes contingency / MI / entropy /
VOI / ARI / NMI / homogeneity driver-side in numpy+sklearn over dict
labelings. Here the pipeline is Spark end-to-end until the final k×k table:

1. Align the two labelings (U2 join — intersection or union universe with
   missing=−1, ``ihop/clustering.py:40-42, 163-175``).
2. Distributed contingency ``groupBy(c1, c2)`` (+ optional weight).
3. All information-theoretic metrics as aggregations over the long-form
   contingency (``F.log2`` aggs) — the table itself never needs to be dense
   or driver-sized; the only driver step is the final scalar collect.
4. Greedy maximum matching (M10) on the collected k×k table — inherently
   sequential, k≈hundreds, driver by design.

Log base 2 throughout, matching the reference's VOI
(``ihop/clustering.py:139-146``); ratio metrics (NMI, homogeneity,
completeness, V-measure) are base-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.setops import key_alignment

MISSING_CLUSTER = -1


def align_labelings(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_label: str = "c1",
    right_label: str = "c2",
    universe: str = "intersection",
) -> DataFrame:
    """(key, c1, c2) over the intersection or union of the two key sets;
    union fills missing labels with −1 (reference semantics)."""
    how = {"intersection": "inner", "union": "full_outer"}[universe]
    out = key_alignment(
        left.select(key, left_label),
        right.select(key, right_label),
        key,
        how,
        fill={left_label: MISSING_CLUSTER, right_label: MISSING_CLUSTER},
    )
    return out


def comparison_metrics(
    aligned: DataFrame,
    left_label: str = "c1",
    right_label: str = "c2",
    weight_col: str | None = None,
) -> dict[str, float]:
    """One pass over the long-form contingency → every comparison metric.

    Returns mutual_info, entropy_left/right, voi, nmi (arithmetic mean
    normalization, sklearn default), homogeneity, completeness, v_measure,
    rand_index, adjusted_rand_index. Weighted variants (reference's weighted
    VOI) via ``weight_col``; pair-counting metrics (rand/ARI) are only
    defined for unit weights and use raw counts regardless.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    cont = (
        aligned.groupBy(left_label, right_label)
        .agg(F.sum(w).alias("n_ij"), F.count(F.lit(1)).alias("cnt_ij"))
        .cache()
    )
    total = cont.agg(
        F.sum("n_ij").alias("N"), F.sum("cnt_ij").alias("CNT")
    ).first()
    n_total, cnt_total = float(total["N"]), float(total["CNT"])

    row_m = cont.groupBy(left_label).agg(
        F.sum("n_ij").alias("a_i"), F.sum("cnt_ij").alias("ca_i")
    )
    col_m = cont.groupBy(right_label).agg(
        F.sum("n_ij").alias("b_j"), F.sum("cnt_ij").alias("cb_j")
    )

    def entropy(marg: DataFrame, col: str) -> float:
        p = F.col(col) / F.lit(n_total)
        val = marg.agg(F.sum(-p * F.log2(p)).alias("h")).first()["h"]
        return float(val or 0.0)

    h_left = entropy(row_m, "a_i")
    h_right = entropy(col_m, "b_j")

    joined = cont.join(row_m, left_label).join(col_m, right_label)
    p_ij = F.col("n_ij") / F.lit(n_total)
    mi_val = joined.agg(
        F.sum(
            p_ij
            * F.log2(
                F.lit(n_total) * F.col("n_ij") / (F.col("a_i") * F.col("b_j"))
            )
        ).alias("mi")
    ).first()["mi"]
    mi = float(mi_val or 0.0)

    # pair-counting metrics from raw counts (unit-weight semantics)
    def comb2(c):
        return c * (c - 1) / 2.0

    sum_ij = cont.agg(F.sum(comb2(F.col("cnt_ij"))).alias("x")).first()["x"] or 0.0
    sum_a = row_m.agg(F.sum(comb2(F.col("ca_i"))).alias("x")).first()["x"] or 0.0
    sum_b = col_m.agg(F.sum(comb2(F.col("cb_j"))).alias("x")).first()["x"] or 0.0
    total_pairs = cnt_total * (cnt_total - 1) / 2.0
    cont.unpersist()

    rand = (
        (total_pairs + 2 * sum_ij - sum_a - sum_b) / total_pairs
        if total_pairs
        else 1.0
    )
    expected = (sum_a * sum_b) / total_pairs if total_pairs else 0.0
    max_index = 0.5 * (sum_a + sum_b)
    ari = (
        (sum_ij - expected) / (max_index - expected)
        if (max_index - expected)
        else 1.0
    )

    mean_h = (h_left + h_right) / 2.0
    homogeneity = mi / h_left if h_left else 1.0
    completeness = mi / h_right if h_right else 1.0
    v_measure = (
        2 * homogeneity * completeness / (homogeneity + completeness)
        if (homogeneity + completeness)
        else 0.0
    )
    return {
        "mutual_info": mi,
        "entropy_left": h_left,
        "entropy_right": h_right,
        "voi": h_left + h_right - 2 * mi,
        "nmi": mi / mean_h if mean_h else 1.0,
        "homogeneity": homogeneity,
        "completeness": completeness,
        "v_measure": v_measure,
        "rand_index": rand,
        "adjusted_rand_index": ari,
    }


def greedy_max_match(contingency_rows: list[tuple]) -> dict:
    """M10 — greedy argmax pairing of clusters from (c1, c2, n) rows
    (``ihop/clustering.py:318-350``): repeatedly take the largest remaining
    cell, pair its row/col, until one side is exhausted. Driver-side by
    design (k×k, sequential)."""
    remaining = sorted(contingency_rows, key=lambda r: (-r[2], r[0], r[1]))
    used_left: set = set()
    used_right: set = set()
    pairs = []
    for c1, c2, n in remaining:
        if c1 in used_left or c2 in used_right:
            continue
        pairs.append((c1, c2, n))
        used_left.add(c1)
        used_right.add(c2)
    all_left = {r[0] for r in contingency_rows}
    all_right = {r[1] for r in contingency_rows}
    return {
        "pairs": pairs,
        "unpaired_left": sorted(all_left - used_left),
        "unpaired_right": sorted(all_right - used_right),
    }
