"""Distributed BPE (ml/bpe.py) vs a pure-Python reference implementation:
the merge table must match EXACTLY (same pairs, same order, same counts),
and encoding must round-trip and respect merge order."""

from __future__ import annotations

from collections import Counter

import pytest

from ihop_reddit_spark.ml.bpe import (
    bpe_encode,
    encode_word,
    merge_word,
    train_bpe,
)


def ref_bpe(word_counts: dict[str, int], k: int):
    """Literal Sennrich et al. BPE on a word-frequency dict."""
    state: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        key = tuple(w)
        state[key] = state.get(key, 0) + c
    out = []
    for _ in range(k):
        pc: Counter = Counter()
        for syms, c in state.items():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        (left, right), c = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        out.append((left, right, c))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, cnt in state.items():
            key = tuple(merge_word(list(syms), left, right))
            nxt[key] = nxt.get(key, 0) + cnt
        state = nxt
    return out


@pytest.mark.slow
def test_train_matches_reference_on_classic_example(spark):
    docs = spark.createDataFrame(
        [
            (1, "low low low lower lower newest newest newest widest"),
            (2, "low newest widest widest newest"),
        ],
        ["doc_id", "text"],
    )
    wc = Counter(
        w for r in docs.collect() for w in r["text"].split()
    )
    got = train_bpe(docs, "text", num_merges=8)
    assert got == ref_bpe(dict(wc), 8)


@pytest.mark.slow
def test_train_matches_reference_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = Counter(
        w for r in docs.select("text").collect() for w in r["text"].split()
    )
    got = train_bpe(docs, "text", num_merges=12)
    assert got == ref_bpe(dict(wc), 12)
    assert len(got) == 12


def test_merge_word_left_to_right_nonoverlapping():
    assert merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_word(["ab", "b", "b"], "ab", "b") == ["abb", "b"]


def test_encode_word_prefers_lowest_rank():
    # ranks: (e,s) before (s,t) — "est" must merge e+s first
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("s", "t"): 2}
    assert encode_word("est", ranks) == ["est"]
    # without (e,s), (s,t) applies
    assert encode_word("est", {("s", "t"): 0}) == ["e", "st"]


@pytest.mark.slow
def test_encode_roundtrips_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe(docs, "text", num_merges=10)
    enc = bpe_encode(docs.limit(50), "text", merges)
    for r in enc.collect():
        assert "".join(r["tokens"]) == r["text"].replace(" ", "")
