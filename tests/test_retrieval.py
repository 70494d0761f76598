"""Retrieval tier (datapipe/retrieval.py): inverted index, TF-IDF/BM25
ranked search, bigram-LM quality scores — each checked against a pure-Python
closed-form model on literal rows (the reference's operator-test style,
/root/reference tests/test_import_data.py) plus edge docs.
"""

from __future__ import annotations

import math

import pytest

from ihop_reddit_spark.datapipe.retrieval import (
    bm25_topk,
    doc_bigrams,
    inverted_index,
    lm_quality_scores,
    tfidf_topk,
    train_bigram_lm,
)

DOCS = [
    (1, "spark join fast join"),
    (2, "slow scan table"),
    (3, "spark spark vector fast"),
    (4, "join table scan scan scan"),
    (5, "x"),  # single token: no bigrams, never matches the probe
    (6, "  spark   fast "),  # ragged separators: empties must be dropped
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _py_tokens(text):
    return [t for t in text.split(" ") if t != ""]


def _py_tf():
    out = {}
    for doc_id, text in DOCS:
        for t in _py_tokens(text):
            out[(doc_id, t)] = out.get((doc_id, t), 0) + 1
    return out


def test_inverted_index_closed_form(spark):
    rows = {
        r["term"]: r
        for r in inverted_index(_df(spark), "text", "doc_id").collect()
    }
    tf = _py_tf()
    for term in {t for (_, t) in tf}:
        postings = sorted(d for (d, t) in tf if t == term)
        assert rows[term]["doc_freq"] == len(postings)
        assert rows[term]["total_tf"] == sum(
            v for (d, t), v in tf.items() if t == term
        )
        assert rows[term]["postings"] == postings
    assert set(rows) == {t for (_, t) in tf}


def test_inverted_index_postings_cap(spark):
    rows = inverted_index(
        _df(spark), "text", "doc_id", max_postings=2
    ).collect()
    by_term = {r["term"]: r for r in rows}
    # 'spark' occurs in docs 1, 3, 6 — capped list keeps the 2 smallest ids,
    # while doc_freq still counts all three
    assert by_term["spark"]["doc_freq"] == 3
    assert by_term["spark"]["postings"] == [1, 3]


def _py_scores(query, k1=None, b=None):
    """Python TF-IDF (k1 is None) or BM25 model over DOCS."""
    tf = _py_tf()
    dls = {d: len(_py_tokens(t)) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(dls.values()) / n
    dfreq = {
        q: len({d for (d, t) in tf if t == q and tf[(d, t)] > 0})
        for q in query
    }
    scores = {}
    for d, _ in DOCS:
        s = 0.0
        for q in query:
            f = tf.get((d, q), 0)
            if f == 0 or dfreq[q] == 0:
                continue
            if k1 is None:
                s += f * n / dfreq[q] / dls[d]
            else:
                idf = math.log(1 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
                s += idf * (f * (k1 + 1)) / (
                    f + k1 * (1 - b + b * dls[d] / avgdl)
                )
        if s > 0:
            scores[d] = s
    return scores


def test_tfidf_topk_matches_python_model(spark):
    query = ["spark", "join"]
    got = tfidf_topk(_df(spark), query, 10).collect()
    want = _py_scores(query)
    assert {r["doc_id"] for r in got} == set(want)
    for r in got:
        assert r["score"] == pytest.approx(want[r["doc_id"]], abs=1e-9)
    # ranking: score desc, doc_id asc
    keys = [(-r["score"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)


def test_bm25_topk_matches_python_model(spark):
    query = ["spark", "join", "scan"]
    got = bm25_topk(_df(spark), query, 10).collect()
    want = _py_scores(query, k1=1.2, b=0.75)
    assert {r["doc_id"] for r in got} == set(want)
    for r in got:
        assert r["score"] == pytest.approx(round(want[r["doc_id"]], 4), abs=2e-4)


def test_bm25_rare_term_outranks_common(spark):
    """The idf factor must rank a doc matching a rare term above a doc
    matching only a corpus-wide common term."""
    docs = [(i, "common filler words here") for i in range(1, 9)]
    docs += [(9, "common rareword filler"), (10, "common filler all day")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = bm25_topk(df, ["rareword", "common"], 3).collect()
    assert got[0]["doc_id"] == 9


def test_doc_bigrams_row_local(spark):
    rows = doc_bigrams(_df(spark), "text", "doc_id").collect()
    got = {(r["doc_id"], r["w1"], r["w2"]) for r in rows}
    want = set()
    for d, t in DOCS:
        toks = _py_tokens(t)
        for a, b_ in zip(toks, toks[1:]):
            want.add((d, a, b_))
    assert got == want
    # single-token and empty-ish docs contribute nothing
    assert not any(r["doc_id"] == 5 for r in rows)


def test_lm_quality_scores_closed_form(spark):
    df = _df(spark)
    bigrams, unigrams, vocab = train_bigram_lm(df, "text", "doc_id")
    got = {r["doc_id"]: r for r in
           lm_quality_scores(df, bigrams, unigrams, vocab).collect()}

    # python model
    uni, bi = {}, {}
    for d, t in DOCS:
        toks = _py_tokens(t)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b_ in zip(toks, toks[1:]):
            bi[(a, b_)] = bi.get((a, b_), 0) + 1
    v = len(uni)
    for d, t in DOCS:
        toks = _py_tokens(t)
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            assert d not in got
            continue
        lp = sum(
            math.log2((bi[(a, b_)] + 1) / (uni[a] + v)) for a, b_ in pairs
        ) / len(pairs)
        assert got[d]["n_bigrams"] == len(pairs)
        assert got[d]["avg_logprob"] == pytest.approx(round(lp, 4), abs=2e-4)


def test_lm_scores_unseen_bigrams_get_smoothing_floor(spark):
    """Scoring NEW text against a trained model: unseen bigrams fall back to
    the add-one floor instead of -inf/null."""
    train = _df(spark)
    bigrams, unigrams, vocab = train_bigram_lm(train, "text", "doc_id")
    new = spark.createDataFrame(
        [(100, "never seenpair spark")], ["doc_id", "text"]
    )
    rows = lm_quality_scores(new, bigrams, unigrams, vocab).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_bigrams"] == 2
    assert r["avg_logprob"] is not None and r["avg_logprob"] < 0


def test_merge_postings_index_equals_full_recompute(spark):
    """cap(merge(cap(A), cap(B))) == cap(A ∪ B) — the exactness claim."""
    from ihop_reddit_spark.datapipe.retrieval import merge_postings_index

    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} shared") for i in range(1, 11)],
        ["doc_id", "text"],
    )
    hist = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 2 = 1")
    cap = 3
    merged = merge_postings_index(
        inverted_index(hist, "text", "doc_id", max_postings=cap),
        inverted_index(new, "text", "doc_id", max_postings=cap),
        max_postings=cap,
    )
    full = inverted_index(docs, "text", "doc_id", max_postings=cap)
    m = {r["term"]: r for r in merged.collect()}
    f = {r["term"]: r for r in full.collect()}
    assert set(m) == set(f)
    for t in f:
        assert m[t]["doc_freq"] == f[t]["doc_freq"]
        assert m[t]["total_tf"] == f[t]["total_tf"]
        assert m[t]["postings"] == f[t]["postings"]


def test_bucketed_postings_index_merges_without_index_shuffle(
    spark, tmp_path
):
    """The persisted index side must stream out of its term buckets — the
    merge plan shows exactly ONE exchange (the delta's), none over the
    index scan."""
    import io
    from contextlib import redirect_stdout

    from ihop_reddit_spark.datapipe.retrieval import (
        build_postings_index,
        merge_postings_index,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} shared text") for i in range(1, 41)],
        ["doc_id", "text"],
    )
    # bucket count MUST match the join's shuffle parallelism — a mismatched
    # count makes the planner disable the bucketed read entirely
    # ("Bucketed: false (disabled by query planner)", measured). Pin the
    # conf HERE rather than trusting the conftest value: any test that goes
    # through get_spark_session (e.g. the CLI suite) re-applies
    # DEFAULT_CONFIG to the shared session via getOrCreate, resetting
    # shuffle.partitions to the core count (measured: 8 → 32 on local[32],
    # which un-buckets this plan and adds a third exchange).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    build_postings_index(
        docs.where("doc_id % 2 = 0"), "text", "doc_id",
        "postings_idx_test", str(tmp_path / "idx"), num_buckets=8,
    )
    try:
        idx = spark.table("postings_idx_test")
        delta = inverted_index(
            docs.where("doc_id % 2 = 1"), "text", "doc_id"
        )
        merged = merge_postings_index(idx, delta)
        buf = io.StringIO()
        with redirect_stdout(buf):
            merged.explain("formatted")
        plan = buf.getvalue()
        # the only exchanges are the delta's two aggregate shuffles — the
        # index side sorts directly over its bucketed scan
        assert plan.count("Arguments: hashpartitioning") == 2
        assert "Bucketed: true" in plan
        full = inverted_index(docs, "text", "doc_id")
        got = {r["term"]: r["doc_freq"] for r in merged.collect()}
        want = {r["term"]: r["doc_freq"] for r in full.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.sql("DROP TABLE IF EXISTS postings_idx_test")
