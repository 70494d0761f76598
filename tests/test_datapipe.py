"""Dedup + similarity-search tests (north-star extensions), including a
numpy oracle for brute-force kNN and recall checks for the approximate tiers."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ihop_reddit_spark.datapipe.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_near_dup,
    ngram_jaccard_pairs,
    simhash_candidates,
    word_shingles,
)
from ihop_reddit_spark.datapipe.similarity import (
    brute_force_knn,
    build_ivf_index,
    ivf_knn,
    lsh_knn,
)


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup
        (4, "completely different text about spark query engines at scale"),
        (5, "another unrelated document mentioning benchmarks and joins"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",)], "text string")
    out = df.select(word_shingles(F.col("text"), 3).alias("sh")).collect()
    assert out[0].sh == ["a b c", "b c d"]
    assert out[1].sh == ["x y"]  # short doc → whole text as one shingle


def test_exact_duplicates(near_dup_docs):
    groups = exact_duplicates(near_dup_docs, "text", "doc_id")
    dup = groups.where(F.col("n_dups") > 1).collect()
    assert len(dup) == 1 and dup[0].keep_id == 1 and dup[0].n_dups == 2
    assert dedup_exact(near_dup_docs, "text").count() == 4


def test_ngram_jaccard_finds_near_dups(near_dup_docs):
    pairs = ngram_jaccard_pairs(near_dup_docs, "text", "doc_id", threshold=0.3)
    got = {(r.left_id, r.right_id): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0          # exact dup
    assert (1, 3) in got               # near dup survives
    assert (1, 4) not in got           # unrelated below threshold


def test_simhash_candidates(near_dup_docs):
    cand = simhash_candidates(near_dup_docs, "text", "doc_id")
    got = {(r.left_id, r.right_id) for r in cand.collect()}
    assert (1, 2) in got               # identical signature → candidate
    assert (1, 3) in got               # 1-word change → ≥1 band matches


def test_minhash_near_dup(near_dup_docs):
    pairs = minhash_near_dup(
        near_dup_docs, "text", "doc_id", jaccard_threshold=0.3
    )
    got = {(r.left_id, r.right_id) for r in pairs.collect()}
    assert (1, 2) in got


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_brute_force_knn_matches_numpy(embeddings):
    queries = embeddings.where(F.col("vec_id") < 3)
    out = brute_force_knn(embeddings, queries, k=5, deterministic=True)
    got = {
        (r.query_id, r.rank): r.neighbor_id for r in out.collect()
    }
    rows = embeddings.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in range(3):
        qi = int(np.where(ids == q)[0][0])
        sims = mat @ mat[qi]
        order = [
            int(ids[j])
            for j in np.argsort(-sims)
            if ids[j] != q
        ][:5]
        spark_order = [got[(q, r)] for r in range(1, 6)]
        assert spark_order == order


def test_ivf_knn_recall(embeddings):
    queries = embeddings.where(F.col("vec_id") < 5)
    exact = brute_force_knn(embeddings, queries, k=5, deterministic=False)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    assigned, model = build_ivf_index(embeddings, n_centroids=8, seed=1)
    approx = ivf_knn(assigned, model, queries, k=5, nprobe=4)
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 5 for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6  # nprobe=4/8 cells


def test_lsh_knn_runs(embeddings):
    qvec = embeddings.where(F.col("vec_id") == 0).first().embedding
    out = lsh_knn(embeddings, [float(x) for x in qvec], k=3)
    assert out.count() == 3
