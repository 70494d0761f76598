"""Unigram-LM tokenizer (ml/unigram_lm.py): Viterbi correctness against
a brute-force reference, planted-optimal vocab learning, char-closure,
determinism, and corpus round-trips."""

from __future__ import annotations

import pytest

import itertools
import math

from ihop_reddit_spark.ml.unigram_lm import (
    UnigramTokenizer,
    train_unigram,
    unigram_encode,
    viterbi_segment,
)


def brute_force_best(word: str, scores: dict, max_len: int) -> list[str]:
    """Enumerate ALL segmentations; apply the documented total order:
    max logp, then fewest pieces, then lexicographically smallest piece
    sequence (the DP's local final-piece tie-break composes to this for
    the cases tested)."""
    n = len(word)
    best = None
    for cuts in itertools.chain.from_iterable(
        itertools.combinations(range(1, n), k) for k in range(n)
    ):
        bounds = [0, *cuts, n]
        pieces = [word[a:b] for a, b in zip(bounds, bounds[1:])]
        if any(len(p) > max_len for p in pieces):
            continue
        lp = 0.0
        ok = True
        for p in pieces:
            if p in scores:
                lp += scores[p]
            elif len(p) == 1:
                lp += -1e6
            else:
                ok = False
                break
        if not ok:
            continue
        key = (lp, -len(pieces), [p for p in reversed(pieces)])
        # reversed + min-on-strings: prefer smaller final piece first —
        # mirror of the DP's backward tie-break
        if best is None or key[0] > best[0][0] + 1e-12 or (
            abs(key[0] - best[0][0]) <= 1e-12
            and (key[1], *[(p,) for p in key[2]])
            > (best[0][1], *[(p,) for p in best[0][2]])
        ):
            best = (key, pieces)
    return best[1]


def test_viterbi_matches_brute_force_scores():
    scores = {
        "ab": math.log(0.4),
        "b": math.log(0.2),
        "a": math.log(0.2),
        "abc": math.log(0.1),
        "c": math.log(0.1),
    }
    # 'abc' as one piece (0.1) beats 'ab'+'c' (0.04) and 'a'+'b'+'c'
    assert viterbi_segment("abc", scores, 3) == ["abc"]
    # 'abab': 'ab'+'ab' (0.16) beats anything with singles
    assert viterbi_segment("abab", scores, 3) == ["ab", "ab"]
    # unseen char falls back to UNK singles without error
    assert viterbi_segment("axb", scores, 3) == ["a", "x", "b"]
    # empty word
    assert viterbi_segment("", scores, 3) == []


def test_viterbi_fuzz_vs_bruteforce():
    import random

    rng = random.Random(5)
    alphabet = "abc"
    for _ in range(40):
        pieces = {"a", "b", "c"}
        for _k in range(4):
            pieces.add(
                "".join(
                    rng.choice(alphabet)
                    for _ in range(rng.randint(2, 3))
                )
            )
        scores = {
            p: math.log(rng.randint(1, 50)) - math.log(100.0)
            for p in pieces
        }
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        got = viterbi_segment(word, scores, 3)
        ref = brute_force_best(word, scores, 3)
        # logp must match exactly; the piece sequence on true float ties
        # may differ in deep compositions, so compare scores
        def lp(seq):
            return sum(scores.get(p, -1e6) for p in seq)

        assert "".join(got) == word
        assert abs(lp(got) - lp(ref)) < 1e-9, (word, got, ref)


@pytest.mark.slow
def test_train_learns_planted_pieces(spark):
    rows = [("abab abab ababab xyz",)] * 30 + [("qrs xyz qrs",)] * 10
    df = spark.createDataFrame(rows, "text string")
    m = train_unigram(
        df, vocab_size=20, seed_size=100, max_piece_len=4, em_rounds=3
    )
    by_count = sorted(m.counts.items(), key=lambda pc: -pc[1])
    assert by_count[0][0] == "abab"  # the planted repeat dominates
    assert {"xyz", "qrs"} <= set(m.counts)
    # char closure: every corpus char survives pruning
    assert {"a", "b", "x", "y", "z", "q", "r", "s"} <= set(m.counts)
    # deterministic retrain
    m2 = train_unigram(
        df, vocab_size=20, seed_size=100, max_piece_len=4, em_rounds=3
    )
    assert m.counts == m2.counts


@pytest.mark.slow
def test_encode_roundtrips_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = train_unigram(
        docs, "text", vocab_size=128, seed_size=512, max_piece_len=4,
        em_rounds=2,
    )
    enc = unigram_encode(docs.limit(40), "text", m)
    total_tokens = 0
    total_chars = 0
    for r in enc.collect():
        assert "".join(r["tokens"]) == r["text"].replace(" ", "")
        total_tokens += len(r["tokens"])
        total_chars += len(r["text"].replace(" ", ""))
    assert total_tokens < total_chars  # subword model compresses


@pytest.mark.slow
def test_tokenizer_model_save_load_roundtrip(spark, tmp_path):
    """S8 parity for the tokenizer tier: a reloaded model encodes
    identically (unigram and BPE)."""
    from ihop_reddit_spark.ml.bpe import (
        bpe_encode,
        load_bpe_merges,
        save_bpe_merges,
        train_bpe,
    )
    from ihop_reddit_spark.ml.unigram_lm import load_unigram, save_unigram

    rows = [("abab abab ababab xyz",)] * 10 + [("qrs xyz qrs",)] * 5
    df = spark.createDataFrame(rows, "text string")

    m = train_unigram(
        df, vocab_size=20, seed_size=100, max_piece_len=4, em_rounds=2
    )
    save_unigram(m, str(tmp_path / "uni.json"))
    m2 = load_unigram(str(tmp_path / "uni.json"))
    assert m2.counts == m.counts and m2.max_piece_len == m.max_piece_len
    a = unigram_encode(df, "text", m).collect()
    b = unigram_encode(df, "text", m2).collect()
    assert [r["tokens"] for r in a] == [r["tokens"] for r in b]

    merges = train_bpe(df, "text", num_merges=6)
    save_bpe_merges(merges, str(tmp_path / "bpe.json"))
    assert load_bpe_merges(str(tmp_path / "bpe.json")) == merges
    e1 = bpe_encode(df, "text", merges).collect()
    e2 = bpe_encode(
        df, "text", load_bpe_merges(str(tmp_path / "bpe.json"))
    ).collect()
    assert [r["tokens"] for r in e1] == [r["tokens"] for r in e2]


def test_unseen_characters_encode_via_unk_singles(spark):
    m = UnigramTokenizer({"ab": 10, "a": 1, "b": 1}, max_piece_len=3)
    df = spark.createDataFrame([("ab ØØab",)], "text string")
    (row,) = unigram_encode(df, "text", m).collect()
    assert row["tokens"] == ["ab", "Ø", "Ø", "ab"]
