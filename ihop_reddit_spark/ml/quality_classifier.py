"""Linear text classifier over hashed n-gram features (fasttext-style).

The quality-filter pattern of the GPT-3 / LLaMA data pipelines: train a
cheap linear classifier (positives = curated/target slice, negatives = the
raw crawl) and score the whole corpus with it. The engine's shape:

* features: MLlib ``HashingTF`` over unigram AND bigram token arrays
  (``NGram``), assembled into one sparse vector — the fasttext bag-of-
  n-grams featurization, fully distributed, no Python in the hot path;
* model: ``LogisticRegression`` (L-BFGS — deterministic for a fixed data
  layout; no sampling anywhere in the pipeline);
* split: content-addressed md5 sampling (``operators/setops.
  deterministic_sample``) — train/test membership is a pure function of
  the row key, so the holdout is reproducible on any engine/cluster and
  the catalog gate's row counts are SQL-expressible.

The reference has no supervised surface (SURVEY §2 is unsupervised
end-to-end); this extends the ML tier with the one classifier a curation
pipeline actually ships. Scale: featurization is row-local; LR training
is MLlib's distributed L-BFGS (gradient aggregates per iteration); scoring
is a broadcast of the coefficient vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Salt for the content-addressed train/test split — part of the gate's
#: oracle contract (the SQL mirrors md5(salt ␞ doc_id) < threshold).
SPLIT_SALT = "qcls"
TRAIN_FRACTION = 0.8


def _token_arrays(df: DataFrame, text_col: str) -> DataFrame:
    """Add ``__toks`` (empty-filtered unigrams) — input to the feature
    pipeline; bigrams derive from it inside the Pipeline via NGram."""
    return df.withColumn(
        "__toks",
        F.filter(F.split(F.col(text_col), " "), lambda t: t != ""),
    )


def build_classifier_pipeline(
    num_features: int = 4096,
    reg_param: float = 0.01,
    max_iter: int = 50,
    label_col: str = "label",
):
    """fasttext-style MLlib Pipeline: NGram(2) → HashingTF(uni) +
    HashingTF(bi) → VectorAssembler → LogisticRegression."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram, VectorAssembler

    bigrams = NGram(n=2, inputCol="__toks", outputCol="__bi")
    tf_uni = HashingTF(
        inputCol="__toks", outputCol="__f_uni", numFeatures=num_features
    )
    tf_bi = HashingTF(
        inputCol="__bi", outputCol="__f_bi", numFeatures=num_features
    )
    asm = VectorAssembler(
        inputCols=["__f_uni", "__f_bi"], outputCol="__features"
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[bigrams, tf_uni, tf_bi, asm, lr])


def train_and_evaluate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_expr,
    num_features: int = 4096,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Content-addressed 80/20 split, fit on train, evaluate on holdout.

    Returns (model, metrics dict with n_train/n_test/auc/accuracy).
    ``label_expr`` is a boolean Column (e.g. ``F.col("source").isin(...)``).
    """
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from ..operators.setops import deterministic_sample

    labeled = _token_arrays(df, text_col).withColumn(
        "label", label_expr.cast("double")
    )
    train = deterministic_sample(labeled, [id_col], TRAIN_FRACTION, SPLIT_SALT)
    test = labeled.join(
        train.select(id_col), id_col, "left_anti"
    )
    model = build_classifier_pipeline(
        num_features, reg_param, max_iter
    ).fit(train)
    scored = model.transform(test)
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction"
    ).evaluate(scored)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum((F.col("prediction") == F.col("label")).cast("long")).alias(
            "n_correct"
        ),
    ).first()
    metrics = {
        "n_train": train.count(),
        "n_test": agg["n_test"],
        "auc": auc,
        "accuracy": (agg["n_correct"] or 0) / max(agg["n_test"], 1),
    }
    return model, metrics
