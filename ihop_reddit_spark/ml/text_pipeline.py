"""Spark ML text-preprocessing pipeline (SURVEY §2.9, T1-T6).

Reference: ``ihop/text_processing.py:315-485`` (``SparkTextPreprocessingPipeline``):
RegexTokenizer (match-tokens Unicode pattern, lowercased) → StopWordsRemover
(English, case-insensitive) → CountVectorizer (vocab ≤ 262144, minDF/maxDF/
minTF, binary option) → optional IDF, persisted as a ``pyspark.ml.Pipeline``.

Everything is built-in Spark ML — distributed fit (the CountVectorizer
vocabulary aggregation is a groupBy-term + top-vocabSize, exactly the A1
pattern), codegen'd transform. The only engine additions are the corpus
container (parquet round-trip) and vocabulary index extraction.
"""

from __future__ import annotations

import json
import os

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    CountVectorizerModel,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Match-tokens pattern from the reference (``ihop/text_processing.py:315``):
#: words starting+ending alphanumeric (interior punctuation/dashes allowed,
#: so "don't" and "e-mail" survive), single alphanumerics, or symbol chars
#: (emoji) — #hashtags and @mentions are kept as one token.
DEFAULT_TOKEN_PATTERN = (
    r"([\p{L}\p{N}#@][\p{L}\p{N}\p{Pd}\p{Pc}\p{S}\p{P}]*[\p{L}\p{N}])"
    r"|[\p{L}\p{N}]"
    r"|[^\p{P}\s]"
)


class SparkTextPipeline:
    """Configurable tokenize → stop-words → count-vectorize [→ IDF] pipeline.

    Defaults mirror ``ihop/text_processing.py:320-325``: maxVocabSize 262144,
    minDF 0.05 (fraction), maxDF 0.95, minTF 1.0, binary False, useIDF False.
    """

    def __init__(
        self,
        input_col: str = "document_text",
        tokens_col: str = "tokenized",
        filtered_col: str = "tokensNoStopWords",
        vector_col: str = "vectorized",
        token_pattern: str = DEFAULT_TOKEN_PATTERN,
        stop_words: list[str] | None = None,
        max_vocab_size: int = 262144,
        min_df: float = 0.05,
        max_df: float = 0.95,
        min_tf: float = 1.0,
        binary: bool = False,
        use_idf: bool = False,
    ) -> None:
        self.input_col = input_col
        self.tokens_col = tokens_col
        self.filtered_col = filtered_col
        self.vector_col = vector_col
        self.use_idf = use_idf
        count_out = f"{vector_col}_tf" if use_idf else vector_col
        tokenizer = RegexTokenizer(
            inputCol=input_col,
            outputCol=tokens_col,
            pattern=token_pattern,
            gaps=False,          # match tokens, not separators (ref :346-360)
            toLowercase=True,
        )
        remover = StopWordsRemover(
            inputCol=tokens_col,
            outputCol=filtered_col,
            stopWords=stop_words or StopWordsRemover.loadDefaultStopWords("english"),
            caseSensitive=False,
        )
        vectorizer = CountVectorizer(
            inputCol=filtered_col,
            outputCol=count_out,
            vocabSize=max_vocab_size,
            minDF=min_df,
            maxDF=max_df,
            minTF=min_tf,
            binary=binary,
        )
        stages = [tokenizer, remover, vectorizer]
        if use_idf:
            stages.append(IDF(inputCol=count_out, outputCol=vector_col))
        self.pipeline = Pipeline(stages=stages)
        self.model: PipelineModel | None = None

    # -- fit / transform (ref :413-424) -----------------------------------
    def fit(self, df: DataFrame) -> "SparkTextPipeline":
        self.model = self.pipeline.fit(df)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self.model is None:
            raise RuntimeError("call fit() first")
        return self.model.transform(df)

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)

    # -- vocabulary (ref :426-436) ----------------------------------------
    @property
    def _cv_model(self) -> CountVectorizerModel:
        if self.model is None:
            raise RuntimeError("call fit() first")
        for stage in self.model.stages:
            if isinstance(stage, CountVectorizerModel):
                return stage
        raise RuntimeError("no CountVectorizerModel stage")

    def vocabulary(self) -> list[str]:
        return list(self._cv_model.vocabulary)

    def index_to_word(self) -> dict[int, str]:
        return dict(enumerate(self._cv_model.vocabulary))

    def vocab_df(self, spark) -> DataFrame:
        """Vocabulary as a (term_id, term) DataFrame — the join-based
        replacement for the reference's only Python UDF (U-1,
        ``ihop/clustering.py:932-936``)."""
        return spark.createDataFrame(
            list(enumerate(self._cv_model.vocabulary)), "term_id int, term string"
        )

    # -- persistence (ref :452-485) ---------------------------------------
    def save(self, path: str) -> None:
        if self.model is None:
            raise RuntimeError("call fit() first")
        self.model.write().overwrite().save(os.path.join(path, "model"))
        with open(os.path.join(path, "params.json"), "w") as f:
            json.dump(
                {
                    "input_col": self.input_col,
                    "tokens_col": self.tokens_col,
                    "filtered_col": self.filtered_col,
                    "vector_col": self.vector_col,
                    "use_idf": self.use_idf,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "SparkTextPipeline":
        with open(os.path.join(path, "params.json")) as f:
            params = json.load(f)
        use_idf = params.pop("use_idf", False)
        obj = cls(**params, use_idf=use_idf)
        obj.model = PipelineModel.load(os.path.join(path, "model"))
        return obj


def vectorized_to_terms(df: DataFrame, vector_col: str, vocab_df: DataFrame) -> DataFrame:
    """Explode a count-vector column to (row, term, weight) via the vocab
    join — the JVM-side replacement for the reference's RDD lambdas (U-2,
    ``ihop/text_processing.py:141-144``). Input must be a VectorUDT column.
    """
    from pyspark.ml.functions import vector_to_array

    arr = df.withColumn("__arr", vector_to_array(F.col(vector_col)))
    exploded = arr.select(
        *[c for c in df.columns if c != vector_col],
        F.posexplode("__arr").alias("term_id", "weight"),
    ).where(F.col("weight") != 0)
    return exploded.join(F.broadcast(vocab_df), "term_id", "inner")
