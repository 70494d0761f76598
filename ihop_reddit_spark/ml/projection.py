"""2-D projection for cluster visualization (M7).

Reference: ``ihop/visualizations.py:80-115`` — sklearn TSNE (init=pca,
metric=cosine, seed=77) on the ≤10k-point embedding matrix, driver-side by
design. This module provides:

* :func:`pca_project` — the Spark-NATIVE projection: ``pyspark.ml.feature.PCA``
  on the distributed embedding table. Fully scalable (one pass for the
  covariance, one for the transform); the axes the reference's TSNE uses for
  initialization. Output is scalar coordinate columns (``x``, ``y``, …) with
  component sign canonicalized (largest-|loading| entry forced positive), so
  the result is deterministic and driver-gateable; eigen-solver values are
  still floating-point, so catalog coverage stays rows+schema (no SQL oracle
  computes an eigendecomposition).
* :func:`tsne_project` — the reference-literal TSNE, driver-side behind an
  import-try (sklearn is not in this container; the function raises a marked
  NotImplementedError there). Size-guarded like every driver drop in this
  engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TSNE_DEFAULTS = {"init": "pca", "metric": "cosine", "random_state": 77}

MAX_DRIVER_POINTS = 50_000


#: column names for the first projection axes; higher dims get ``c{i}``
_AXIS_NAMES = ("x", "y", "z")


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int = 2,
) -> DataFrame:
    """Distributed PCA to ``dims`` components: (id, x, y, ...).

    Scalar coordinate columns (not an array) so downstream pandas/oracle
    canonicalization can sort them, and per-component sign canonicalized:
    PCA is only determined up to a sign flip per eigenvector, so each
    component is flipped (if needed) to make its largest-|loading| entry
    positive. The loading matrix is k×dim on the driver — tiny.
    """
    import numpy as np
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = df.select(
        id_col, array_to_vector(F.col(vec_col)).alias("__features")
    )
    model = PCA(k=dims, inputCol="__features", outputCol="__proj").fit(feat)
    pc = model.pc.toArray()  # (n_features, dims) loadings, driver-local
    signs = []
    for j in range(pc.shape[1]):
        lead = pc[int(np.argmax(np.abs(pc[:, j]))), j]
        signs.append(-1.0 if lead < 0 else 1.0)
    proj = model.transform(feat).select(
        id_col, vector_to_array(F.col("__proj")).alias("__p")
    )
    names = [
        _AXIS_NAMES[j] if j < len(_AXIS_NAMES) else f"c{j}"
        for j in range(dims)
    ]
    return proj.select(
        id_col,
        *[
            (F.col("__p")[j] * F.lit(signs[j])).alias(names[j])
            for j in range(dims)
        ],
    )


def tsne_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **tsne_kwargs,
):
    """Reference-literal TSNE (driver-side, sklearn), size-guarded.

    Returns a pandas DataFrame (id, tsne_x, tsne_y) like the reference's
    CSV artifact (``dvc.yaml:61-71``).
    """
    n = df.count()
    if n > MAX_DRIVER_POINTS:
        raise ValueError(
            f"tsne_project is a driver-side op for <= {MAX_DRIVER_POINTS} "
            f"points (got {n}); project with pca_project or pre-sample"
        )
    try:
        from sklearn.manifold import TSNE  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - env without sklearn
        # STUB in this container: sklearn is not installed. The distributed
        # path (pca_project) is the first-class operator.
        raise NotImplementedError(
            "tsne_project requires scikit-learn; use pca_project instead"
        ) from exc
    import numpy as np

    pdf = df.select(id_col, vec_col).toPandas()
    mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    params = {**TSNE_DEFAULTS, **tsne_kwargs}
    coords = TSNE(n_components=2, **params).fit_transform(mat)
    pdf["tsne_x"], pdf["tsne_y"] = coords[:, 0], coords[:, 1]
    return pdf.drop(columns=[vec_col])
