"""Distributed WordPiece tokenizer training and encoding (Schuster &
Nakajima 2012 — the BERT-family tokenizer), completing the trainer
family next to BPE (``ml/bpe.py``) and unigram-LM (``ml/unigram_lm.py``).

Scale shape — identical to BPE, by design:

* ONE corpus-scale shuffle: word → count (shared ``word_frequencies``).
  The entire training loop then runs on the word-frequency table, which
  is VOCABULARY-sized, never corpus-sized.
* What differs from BPE is only the MERGE OBJECTIVE: WordPiece fuses the
  adjacent pair maximizing ``count(pair) / (count(left)·count(right))``
  — the likelihood gain of the fusion under a unigram LM over the
  current segmentation — instead of the raw pair count. Non-initial
  subwords carry the ``##`` continuation prefix, so "word" starts as
  ``[w, ##o, ##r, ##d]`` and fusing ``(w, ##o)`` yields ``wo``.
* Per step: adjacent-pair counts AND symbol counts (two vocab-sized
  aggregations), a three-way vocab-sized join for the score, argmax with
  a deterministic total tie-break (score DESC, pair count DESC, pair
  ASC) — the driver materializes ONE row per step. The merge applies to
  the symbol arrays via Arrow ``mapInPandas`` (sequential left-to-right
  within a word — the documented Pandas-UDF escape hatch, same as BPE).
* Encoding is greedy longest-match-first ("maximal munch") against the
  learned vocabulary with ``[UNK]`` fallback — per-word, Arrow-batched,
  the vocabulary ships in the closure (model-sized side input).

Determinism: counts are integers; the score is a ratio of integer
products compared as IEEE doubles identically in Spark and the pure-
Python reference the tests pin against; ties break on exact integers
then lexicographic pair order. Cross-engine SQL hash parity is NOT
claimed (the in-word fuse loop is not ANSI-SQL-expressible); the
catalog gates invariants + a full-vocabulary round-trip, mirroring the
BPE/unigram gate pattern.

Reference parity: the reference repo tokenizes with a fixed regex
(``ihop/text_processing.py:315``) and trains no tokenizer; WordPiece
belongs to the engine's LLM-training-data extension tier (SURVEY §2.9).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import word_frequencies

UNK = "[UNK]"

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("syms", T.ArrayType(T.StringType())),
        T.StructField("cnt", T.LongType()),
    ]
)


def fuse_pair(left: str, right: str) -> str:
    """The fused symbol of an adjacent pair: the right side drops its
    continuation prefix (``w + ##o → wo``, ``##r + ##d → ##rd``)."""
    return left + (right[2:] if right.startswith("##") else right)


def merge_word_wp(syms: list[str], left: str, right: str) -> list[str]:
    """One WordPiece merge on one word: left-to-right, non-overlapping,
    replacing (left, right) with ``fuse_pair(left, right)``."""
    fused = fuse_pair(left, right)
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(fused)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def init_symbols(word: str) -> list[str]:
    """``word → [w, ##o, ##r, ##d]`` — first char bare, rest continued."""
    return [c if i == 0 else "##" + c for i, c in enumerate(word)]


class WordPieceModel:
    """vocab (alphabet + fused tokens in merge order, insertion-ordered)
    plus the merge log [(left, right, pair_count, score), ...]."""

    def __init__(
        self,
        vocab: list[str],
        merges: list[tuple[str, str, int, float]],
        unk: str = UNK,
    ) -> None:
        self.vocab = list(vocab)
        self.merges = list(merges)
        self.unk = unk

    def save(self, path: str) -> None:
        import json

        with open(path, "w") as f:
            json.dump(
                {
                    "unk": self.unk,
                    "vocab": self.vocab,
                    "merges": [list(m) for m in self.merges],
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "WordPieceModel":
        import json

        with open(path) as f:
            d = json.load(f)
        return cls(
            [str(v) for v in d["vocab"]],
            [
                (str(l), str(r), int(c), float(s))
                for l, r, c, s in d["merges"]
            ],
            unk=str(d["unk"]),
        )


def train_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 20,
) -> WordPieceModel:
    """Learn ``num_merges`` WordPiece fusions over the corpus.

    The loop runs entirely on the vocab-sized word-frequency frame;
    ``localCheckpoint`` per step bounds lineage exactly like the BPE
    trainer (``ml/bpe.py:train_bpe``)."""
    wf = word_frequencies(df, text_col)
    chars = F.array_remove(F.split("word", "(?!^)"), "")
    state = wf.select(
        F.transform(
            chars,
            lambda c, i: F.when(i == F.lit(0), c).otherwise(
                F.concat(F.lit("##"), c)
            ),
        ).alias("syms"),
        F.col("cnt"),
    ).persist()

    # the alphabet: every initial symbol, deterministic order
    vocab: list[str] = [
        r["s"]
        for r in state.select(F.explode("syms").alias("s"))
        .distinct()
        .orderBy("s")
        .collect()
    ]
    vocab_set = set(vocab)
    merges: list[tuple[str, str, int, float]] = []
    try:
        for _ in range(num_merges):
            pairs = state.where(F.size("syms") >= 2).select(
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(syms, 1, size(syms) - 1)"),
                        F.expr("slice(syms, 2, size(syms) - 1)"),
                    )
                ).alias("p"),
                "cnt",
            )
            pair_counts = pairs.groupBy(
                F.col("p.0").alias("left"), F.col("p.1").alias("right")
            ).agg(F.sum("cnt").alias("pc"))
            sym_counts = (
                state.select(F.explode("syms").alias("s"), "cnt")
                .groupBy("s")
                .agg(F.sum("cnt").alias("sc"))
            )
            best = (
                pair_counts.join(
                    sym_counts.select(
                        F.col("s").alias("left"), F.col("sc").alias("lc")
                    ),
                    "left",
                )
                .join(
                    sym_counts.select(
                        F.col("s").alias("right"), F.col("sc").alias("rc")
                    ),
                    "right",
                )
                .select(
                    "left",
                    "right",
                    "pc",
                    (
                        F.col("pc").cast("double")
                        / (
                            F.col("lc").cast("double")
                            * F.col("rc").cast("double")
                        )
                    ).alias("score"),
                )
                .orderBy(
                    F.desc("score"),
                    F.desc("pc"),
                    F.asc("left"),
                    F.asc("right"),
                )
                .limit(1)
                .collect()  # ONE row — the argmax, never the table
            )
            if not best:
                break
            left, right = best[0]["left"], best[0]["right"]
            pc, score = int(best[0]["pc"]), float(best[0]["score"])
            merges.append((left, right, pc, score))
            fused = fuse_pair(left, right)
            if fused not in vocab_set:
                vocab.append(fused)
                vocab_set.add(fused)

            def apply_merge(
                it: Iterator[pd.DataFrame], l: str = left, r: str = right
            ) -> Iterator[pd.DataFrame]:
                for pdf in it:
                    pdf = pdf.copy()
                    pdf["syms"] = pdf["syms"].map(
                        lambda s: merge_word_wp(list(s), l, r)
                    )
                    yield pdf

            nxt = state.mapInPandas(apply_merge, _STATE_SCHEMA)
            nxt = nxt.localCheckpoint(eager=True)
            state.unpersist()
            state = nxt
    finally:
        state.unpersist()
    return WordPieceModel(vocab, merges)


def encode_word_wordpiece(
    word: str,
    vocab: set[str],
    *,
    unk: str = UNK,
    max_word_len: int = 200,
) -> list[str]:
    """Greedy longest-match-first against the vocabulary; a word with
    any unmatchable stretch (or pathological length) becomes [unk] —
    the standard BERT-tokenizer contract."""
    if not word or len(word) > max_word_len:
        return [unk]
    out: list[str] = []
    i = 0
    n = len(word)
    while i < n:
        end = n
        piece = None
        while end > i:
            cand = word[i:end] if i == 0 else "##" + word[i:end]
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        i = end
    return out


def wordpiece_encode(
    df: DataFrame,
    text_col: str,
    model: WordPieceModel,
    *,
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize ``text_col`` word-by-word with a trained model.
    Row-local ``mapInPandas``; the vocabulary ships in the closure
    (model-sized side input, same shape as ``bpe_encode``)."""
    vocab = set(model.vocab)
    unk = model.unk
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(
                lambda t: [
                    s
                    for w in str(t).split()
                    for s in encode_word_wordpiece(w, vocab, unk=unk)
                ]
            )
            yield pdf

    return df.mapInPandas(enc, schema)
