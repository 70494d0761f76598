"""Distributed WordPiece (ml/wordpiece.py) vs a pure-Python reference:
the merge log must match EXACTLY (same pairs, order, counts, scores),
encoding must be greedy-longest-match with [UNK] fallback, and the
full-vocabulary round-trip must hold on a real corpus slice."""

from __future__ import annotations

import pytest

from collections import Counter

from pyspark.sql import functions as F

from ihop_reddit_spark.ml.wordpiece import (
    UNK,
    WordPieceModel,
    encode_word_wordpiece,
    fuse_pair,
    init_symbols,
    merge_word_wp,
    train_wordpiece,
    wordpiece_encode,
)


def ref_wordpiece(word_counts: dict[str, int], k: int):
    """Literal WordPiece on a word-frequency dict — score =
    count(pair) / (count(left)·count(right)), computed with the same
    double arithmetic as the Spark side (cast-then-multiply)."""
    state: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        key = tuple(init_symbols(w))
        state[key] = state.get(key, 0) + c
    merges = []
    for _ in range(k):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for syms, c in state.items():
            for s in syms:
                sc[s] += c
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        scored = [
            (
                float(c) / (float(sc[l]) * float(sc[r])),
                c,
                l,
                r,
            )
            for (l, r), c in pc.items()
        ]
        score, c, left, right = sorted(
            scored, key=lambda t: (-t[0], -t[1], t[2], t[3])
        )[0]
        merges.append((left, right, c, score))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, cnt in state.items():
            key = tuple(merge_word_wp(list(syms), left, right))
            nxt[key] = nxt.get(key, 0) + cnt
        state = nxt
    return merges


@pytest.mark.slow
def test_train_matches_reference_on_classic_example(spark):
    docs = spark.createDataFrame(
        [
            (1, "hugs hugs hug hug hug pug pug pun pun pun bun hugs"),
            (2, "hug pug pun puns puns hugs un un"),
        ],
        ["doc_id", "text"],
    )
    wc = Counter(w for r in docs.collect() for w in r["text"].split())
    m = train_wordpiece(docs, "text", num_merges=6)
    assert m.merges == ref_wordpiece(dict(wc), 6)
    # vocab = sorted alphabet, then fused tokens in merge order
    alpha = sorted({s for w in wc for s in init_symbols(w)})
    fused = []
    for l, r, _c, _s in m.merges:
        f = fuse_pair(l, r)
        if f not in set(alpha) | set(fused):
            fused.append(f)
    assert m.vocab == alpha + fused


@pytest.mark.slow
def test_train_matches_reference_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = Counter(
        w for r in docs.select("text").collect() for w in r["text"].split()
    )
    m = train_wordpiece(docs, "text", num_merges=10)
    assert m.merges == ref_wordpiece(dict(wc), 10)
    assert len(m.merges) == 10


def test_fuse_and_merge_semantics():
    assert fuse_pair("w", "##o") == "wo"
    assert fuse_pair("##r", "##d") == "##rd"
    assert init_symbols("word") == ["w", "##o", "##r", "##d"]
    assert merge_word_wp(["h", "##u", "##g"], "h", "##u") == ["hu", "##g"]
    # non-overlapping, left-to-right
    assert merge_word_wp(
        ["##a", "##a", "##a"], "##a", "##a"
    ) == ["##aa", "##a"]


def test_encode_greedy_longest_match_and_unk():
    vocab = {"h", "hu", "hug", "##g", "##u", "##s", "##ugs", "p", "##un"}
    assert encode_word_wordpiece("hug", vocab) == ["hug"]
    assert encode_word_wordpiece("hugs", vocab) == ["hug", "##s"]
    # maximal munch on continuations: "##ugs" beats "##u"+"##g"+"##s"
    assert encode_word_wordpiece(
        "hugs", {"h", "##u", "##g", "##s", "##ugs"}
    ) == ["h", "##ugs"]
    assert encode_word_wordpiece("pun", vocab) == ["p", "##un"]
    # greedy does NOT backtrack: "hug" consumes the g, "##x" unmatchable
    # → [UNK], never a partial emit (the BERT-tokenizer contract)
    assert encode_word_wordpiece("hugx", vocab) == [UNK]
    assert encode_word_wordpiece("", vocab) == [UNK]
    assert encode_word_wordpiece("x" * 999, vocab) == [UNK]


@pytest.mark.slow
def test_roundtrip_and_save_load(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = train_wordpiece(docs, "text", num_merges=8)
    path = str(tmp_path / "wp.json")
    m.save(path)
    m2 = WordPieceModel.load(path)
    assert m2.vocab == m.vocab and m2.merges == m.merges and m2.unk == m.unk

    from ihop_reddit_spark.ml.bpe import word_frequencies

    words = word_frequencies(docs, "text").select(
        F.col("word").alias("text")
    )
    enc = wordpiece_encode(words, "text", m2).collect()
    # trained on the same corpus → every word's alphabet is in vocab, so
    # stripping ## and concatenating must round-trip every word
    for r in enc:
        assert "".join(t.removeprefix("##") for t in r["tokens"]) == r["text"]
        assert 1 <= len(r["tokens"]) <= len(r["text"])
