"""Similarity search over embedding columns (M6 at scale; north-star ANN).

Tiering:

* :func:`brute_force_knn` — exact top-k. The query side is broadcast; the
  corpus is scanned once; per-query top-k via windowed row_number. Cost is
  |Q|×|C| — the correct baseline, and the verifier for the approximate tiers.
* :func:`ivf_knn` — IVF: KMeans-partition the corpus, probe the ``nprobe``
  nearest centroids per query. Scan cost drops to ~nprobe/k_centroids of the
  corpus; recall is tunable. All joins are broadcast (centroids are tiny).
* :func:`lsh_knn` — MLlib ``BucketedRandomProjectionLSH`` approxNearestNeighbors
  wrapper (per single query; use ivf for batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, quantize, raw_dot, raw_norm
from ..operators.windows import top_k_per_group


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    deterministic: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    ``deterministic=True`` uses the integer-quantized cosine (bit-stable
    across engines/partitionings — oracle-comparable); False uses the fast
    double path. Self-matches (same id) are excluded. Ties break by neighbor
    id.

    Plan shape: quantization + norms are one narrow projection PER ROW on
    each side before the join, so the |Q|×|C| pairwise stage does exactly one
    array fold per pair; queries are broadcast (no corpus shuffle). The
    per-query top-k is a window over query_id — |Q| groups of |C| rows.
    """
    if deterministic:
        q = queries.select(
            F.col(id_col).alias(query_id_col),
            quantize(F.col(vec_col)).alias("__qv"),
        ).withColumn("__qnorm", raw_norm(F.col("__qv")))
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            quantize(F.col(vec_col)).alias("__cv"),
        ).withColumn("__cnorm", raw_norm(F.col("__cv")))
        sim = raw_dot(F.col("__qv"), F.col("__cv")).cast("double") / (
            F.col("__qnorm") * F.col("__cnorm")
        )
    else:
        q = queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
        sim = cosine(F.col("__qv"), F.col("__cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id", sim.alias("cosine"))
    )
    return top_k_per_group(
        scored,
        query_id_col,
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
    )


def build_ivf_index(
    corpus: DataFrame,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Fit KMeans centroids and assign each corpus vector to its cell.

    Returns (assigned_corpus, kmeans_model). The assignment adds a
    ``centroid_id`` column — at scale, WRITE the corpus partitioned by
    ``centroid_id`` so probes prune at the file level.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.withColumn("__features", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__features", predictionCol="centroid_id")
    model = km.fit(feat)
    assigned = model.transform(feat).drop("__features")
    return assigned, model


def ivf_knn(
    assigned_corpus: DataFrame,
    model,
    queries: DataFrame,
    k: int,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score queries only against the ``nprobe`` nearest
    centroid cells. Centroid table is driver-built (tiny) and broadcast.
    """
    import numpy as np

    centers = model.clusterCenters()
    norms = [c / (np.linalg.norm(c) or 1.0) for c in centers]

    def nearest_cells(vec):
        v = np.asarray(vec, dtype=float)
        v = v / (np.linalg.norm(v) or 1.0)
        sims = [float(v @ c) for c in norms]
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], i))
        return order[:nprobe]

    spark = assigned_corpus.sparkSession
    qrows = queries.select(id_col, vec_col).collect()  # queries are the small side
    probe_rows = [
        (row[id_col], row[vec_col], cell)
        for row in qrows
        for cell in nearest_cells(row[vec_col])
    ]
    probes = spark.createDataFrame(
        probe_rows, f"{query_id_col} long, __qvec array<float>, centroid_id int"
    )
    scored = (
        F.broadcast(probes)
        .join(assigned_corpus, "centroid_id")
        .where(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
        )
    )
    return top_k_per_group(
        scored,
        query_id_col,
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
    )


def lsh_knn(
    corpus: DataFrame,
    query_vec,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
):
    """Single-query ANN via BucketedRandomProjectionLSH (Euclidean proxy —
    on L2-normalized vectors Euclidean rank order == cosine rank order)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feat = corpus.withColumn("__features", array_to_vector(F.col(vec_col)))
    lsh = BucketedRandomProjectionLSH(
        inputCol="__features",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feat)
    return model.approxNearestNeighbors(feat, Vectors.dense(query_vec), k).select(
        id_col, "distCol"
    )
