"""Annotation-task exports (E1/E2), Spark-native and deterministic.

Reference: ``ihop/annotation_task_export.py`` — pandas group-bys on the
driver. Re-expressed as distributed plans:

* E1 coherence task (``:26-61``): one row per cluster with its members
  joined into a single ordered string — A2-pattern ``sort_array(collect_list
  (struct))`` + ``concat_ws``.
* E2 intruder task (``:106-190``): per cluster the top-k members by
  popularity plus ONE out-of-cluster "intruder" whose popularity lies within
  ±1 global σ of the cluster's mean popularity (eligibility per ``:64-85``:
  group mean, GLOBAL sample std). The reference samples the intruder and
  shuffles rows with ``random``; here both choices are deterministic hashes
  (md5 of cluster‖item) so the export is reproducible and oracle-comparable
  — seedable randomness done as content-addressed choice, the pattern that
  also survives re-runs at 100 TB (no driver RNG state).

Scale notes: cluster stats are tiny (one row per cluster) and broadcast;
candidate generation is a broadcast join of the stats onto the item table,
never a cross join of items × items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.windows import top_k_per_group


def coherence_export(
    df: DataFrame,
    cluster_col: str,
    item_col: str,
    popularity_col: str,
) -> DataFrame:
    """E1 — one row per cluster: members joined by popularity desc, item asc."""
    entry = F.struct(
        (-F.col(popularity_col)).alias("neg_pop"), F.col(item_col).alias("item")
    )
    grouped = df.groupBy(cluster_col).agg(
        F.array_sort(F.collect_list(entry)).alias("__entries"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return grouped.select(
        cluster_col,
        F.concat_ws(
            " ", F.transform(F.col("__entries"), lambda e: e["item"])
        ).alias("items_concat"),
        "n_items",
    )


def intruder_export(
    df: DataFrame,
    cluster_col: str,
    item_col: str,
    popularity_col: str,
    top_k: int = 5,
) -> DataFrame:
    """E2 — per cluster: top-k members + one deterministic eligible intruder.

    Output: (cluster, item, popularity, is_intruder, slot) where ``slot`` is
    a deterministic in-task shuffle position (md5 order) and the intruder is
    the md5-argmin eligible out-of-cluster item. Clusters with no eligible
    intruder emit only their top-k rows.
    """
    members = top_k_per_group(
        df,
        cluster_col,
        [F.col(popularity_col).desc(), F.col(item_col).asc()],
        top_k,
    ).select(cluster_col, item_col, popularity_col)

    # eligibility window: per-cluster mean popularity ± one GLOBAL sample std
    n = F.count(F.lit(1))
    sx = F.sum(popularity_col).cast("double")
    sxx = F.sum(F.col(popularity_col) * F.col(popularity_col)).cast("double")
    global_std = df.select(
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("__std")
    )
    cluster_means = df.groupBy(cluster_col).agg(
        (F.sum(popularity_col).cast("double") / F.count(F.lit(1))).alias("__mean")
    )
    bounds = cluster_means.crossJoin(F.broadcast(global_std)).select(
        F.col(cluster_col).alias("__target"),
        (F.col("__mean") - F.col("__std")).alias("__lo"),
        (F.col("__mean") + F.col("__std")).alias("__hi"),
    )
    candidates = (
        df.join(
            F.broadcast(bounds),
            (F.col(cluster_col) != F.col("__target"))
            & (F.col(popularity_col) >= F.col("__lo"))
            & (F.col(popularity_col) <= F.col("__hi")),
        )
        .select(
            F.col("__target"),
            F.col(item_col),
            F.col(popularity_col),
            F.md5(
                F.concat_ws("\x1f", F.col("__target"), F.col(item_col))
            ).alias("__pick"),
        )
    )
    w = Window.partitionBy("__target").orderBy("__pick", item_col)
    intruders = (
        candidates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__target").alias(cluster_col),
            item_col,
            popularity_col,
            F.lit(1).alias("is_intruder"),
        )
    )
    task = members.withColumn("is_intruder", F.lit(0)).unionByName(intruders)
    slot_w = Window.partitionBy(cluster_col).orderBy(
        F.md5(F.concat_ws("\x1e", F.col(cluster_col), F.col(item_col))), item_col
    )
    return task.withColumn("slot", F.row_number().over(slot_w).cast("long"))
