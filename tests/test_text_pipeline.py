"""Text pipeline tests — mirrors the reference's exact-tokenization style
(tests/test_text_processing.py:128-202 in /root/reference) including edge
docs: emoji, #hashtag, @mention, URLs, punctuation-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ihop_reddit_spark.ml.text_pipeline import SparkTextPipeline, vectorized_to_terms


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "Hello world hello"),
        ("d2", "the quick brown fox"),
        ("d3", "#hashtag @mention http://example.com"),
        ("d4", "....!"),
        ("d5", "emoji \U0001f600 test"),
        ("d6", ""),
    ]
    return spark.createDataFrame(rows, "id string, document_text string")


@pytest.fixture(scope="module")
def fitted(docs):
    pipe = SparkTextPipeline(min_df=1.0, max_df=1.0e18)  # absolute counts: keep all
    out = pipe.fit_transform(docs)
    return pipe, out


def test_tokenization_edges(fitted):
    _, out = fitted
    toks = {r.id: r.tokenized for r in out.collect()}
    assert toks["d1"] == ["hello", "world", "hello"]  # lowercased
    assert toks["d3"][0] == "#hashtag"
    assert toks["d3"][1] == "@mention"
    assert any("http" in t for t in toks["d3"])  # URL survives as token(s)
    assert toks["d4"] == []                      # punctuation-only → empty
    assert "\U0001f600" in toks["d5"]            # emoji kept (symbol class)
    assert toks["d6"] == []                      # empty doc → empty tokens


def test_stopword_removal(fitted):
    _, out = fitted
    toks = {r.id: r.tokensNoStopWords for r in out.collect()}
    assert "the" not in toks["d2"]
    assert "quick" in toks["d2"]


def test_vectorization_and_vocab(fitted):
    pipe, out = fitted
    vocab = pipe.vocabulary()
    assert "hello" in vocab
    row = {r.id: r.vectorized for r in out.collect()}["d1"]
    assert row[vocab.index("hello")] == 2.0
    assert pipe.index_to_word()[vocab.index("hello")] == "hello"


def test_vectorized_to_terms_join(fitted, spark):
    pipe, out = fitted
    terms = vectorized_to_terms(out.select("id", "vectorized"), "vectorized", pipe.vocab_df(spark))
    got = {
        (r.id, r.term): r.weight for r in terms.collect()
    }
    assert got[("d1", "hello")] == 2.0
    assert ("d4", "hello") not in got


def test_pipeline_roundtrip(tmp_path, fitted, docs):
    pipe, out = fitted
    path = str(tmp_path / "pipe")
    pipe.save(path)
    loaded = SparkTextPipeline.load(path)
    re_out = loaded.transform(docs)
    a = {r.id: r.vectorized for r in out.collect()}
    b = {r.id: r.vectorized for r in re_out.collect()}
    assert a == b


def test_idf_chain(docs):
    pipe = SparkTextPipeline(min_df=1.0, max_df=1.0e18, use_idf=True)
    out = pipe.fit_transform(docs)
    assert "vectorized" in out.columns and "vectorized_tf" in out.columns
    # IDF downweights the term appearing in more docs
    vec = {r.id: r.vectorized for r in out.collect()}
    assert vec["d1"].numNonzeros() > 0


def test_idf_weights_closed_form(spark):
    import math

    from ihop_reddit_spark.ml.text_pipeline import (
        SparkTextPipeline,
        vectorized_to_terms,
    )

    # "shared" appears in both docs, "rare" in one → idf distinguishes them
    docs = spark.createDataFrame(
        [(1, "shared rare"), (2, "shared shared")],
        "doc_id long, document_text string",
    )
    pipe = SparkTextPipeline(
        stop_words=["nothing"], min_df=1.0, max_df=1.0e18, use_idf=True
    )
    vec = pipe.fit_transform(docs).select("doc_id", "vectorized")
    out = {
        (r["doc_id"], r["term"]): r["weight"]
        for r in vectorized_to_terms(vec, "vectorized", pipe.vocab_df(spark)).collect()
    }
    n = 2
    idf_shared = math.log((n + 1) / (2 + 1))  # df=2 → 0
    idf_rare = math.log((n + 1) / (1 + 1))
    assert out[(1, "rare")] == pytest.approx(1 * idf_rare, rel=1e-9)
    assert out.get((1, "shared"), 0.0) == pytest.approx(1 * idf_shared, abs=1e-12)
    assert out.get((2, "shared"), 0.0) == pytest.approx(2 * idf_shared, abs=1e-12)
