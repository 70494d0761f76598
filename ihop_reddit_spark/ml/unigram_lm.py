"""Distributed unigram-LM (SentencePiece-style) tokenizer training and
encoding (Kudo 2018, "Subword Regularization") — the second corpus-trained
tokenizer family of the LLM-data extension tier, beside ``ml/bpe.py``.

Shape of the computation at 100 TB (same contract as BPE):

* ONE corpus-scale shuffle: word → count. Everything after runs on the
  word-frequency table (VOCABULARY-sized, never corpus-sized).
* **Seeding**: candidate pieces = all word substrings up to
  ``max_piece_len``, counted with word weights (explode + groupBy on the
  vocab frame — substring fan-out is ``len·max_piece_len`` per word, still
  vocab-grain), top ``seed_size`` kept, single characters always kept
  (segmentation closure: every word must be representable).
* **Viterbi-EM rounds**: the E-step segments every word with the CURRENT
  piece scores via an Arrow-batched ``mapInPandas`` (the model — a
  piece→log-prob dict — ships in the closure, broadcast-sized); piece
  counts come back through one vocab-grain explode + groupBy. The M-step
  re-estimates probabilities from the counts and PRUNES the worst pieces
  (keep-fraction per round, never below ``vocab_size``, chars always
  kept) — Kudo's prune-loop with hard-EM (Viterbi) expectations instead
  of full forward-backward; the standard engineering simplification, and
  deterministic.
* The driver only holds the piece table (≤ seed_size rows — the model,
  exactly like BPE's merge list).

Determinism: counts are integers; piece scores are ``log(cnt) −
log(total)`` computed identically everywhere; Viterbi ties break on
FEWER pieces, then lexicographically smaller piece at the split point —
a total order, so the segmentation (hence the trained model) is a pure
function of the corpus. Cross-engine SQL hash parity is NOT claimed
(lattice DP is not ANSI-SQL-expressible) — the catalog gates invariants
+ a full-vocabulary encode round-trip, mirroring the BPE gate pattern.

Reference parity: the reference tokenizes with a fixed regex
(``ihop/text_processing.py:315``) and never trains a tokenizer; this
module is engine extension tier (SURVEY §2.9 note).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import word_frequencies


def viterbi_segment(
    word: str, scores: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best unigram segmentation of ``word`` under piece log-probs.

    DP over end positions; unknown single characters get a large
    penalty (still segmentable — closure fallback for chars unseen in
    training). Ties break on fewer pieces, then on the lexicographically
    smaller final piece — a total order.
    """
    n = len(word)
    NEG = -1e18
    UNK = -1e6  # unseen char penalty: worse than any real piece chain
    # best[i] = (logp, n_pieces, backptr_start, piece); backptr -1 at
    # unreached positions (and the base, which needs no pointer)
    best: list[tuple] = [(0.0, 0, -1, "")] + [(NEG, 0, -1, "")] * n
    for end in range(1, n + 1):
        cand = None  # ((logp, -n_pieces), start, piece)
        for start in range(max(0, end - max_piece_len), end):
            piece = word[start:end]
            sc = scores.get(piece)
            if sc is None:
                if end - start > 1:
                    continue
                sc = UNK
            prev = best[start]
            if prev[2] == -1 and start != 0:
                continue
            key = (prev[0] + sc, -(prev[1] + 1))
            if (
                cand is None
                or key > cand[0]
                or (key == cand[0] and piece < cand[2])
            ):
                cand = (key, start, piece)
        if cand is not None:
            key, start, piece = cand
            best[end] = (key[0], -key[1], start, piece)
    if best[n][2] == -1 and n > 0:
        # only reachable if NEG survived — cannot happen with the UNK
        # fallback, but keep the contract explicit
        raise ValueError(f"unsegmentable word {word!r}")
    out: list[str] = []
    pos = n
    while pos > 0:
        _, _, start, piece = best[pos]
        out.append(piece)
        pos = start
    out.reverse()
    return out


def _seed_pieces(
    wf: DataFrame, max_piece_len: int, seed_size: int
) -> DataFrame:
    """(piece, cnt) candidates: all substrings up to ``max_piece_len``
    weighted by word count — top ``seed_size`` multi-char pieces by
    (cnt DESC, piece ASC) plus ALL single characters."""
    subs = wf.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), s -> "
                f"transform(sequence(0, least({max_piece_len},"
                " length(word) - s + 1) - 1), "
                "l -> substring(word, s, l + 1))))"
            )
        ).alias("piece"),
        "cnt",
    ).groupBy("piece").agg(F.sum("cnt").alias("cnt"))
    chars = subs.where(F.length("piece") == 1)
    multi = (
        subs.where(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(seed_size)
    )
    return chars.unionByName(multi)


class UnigramTokenizer:
    """The trained model: piece → integer count (the sufficient
    statistic); scores derive as ``log(cnt / total)``."""

    def __init__(self, counts: dict[str, int], max_piece_len: int) -> None:
        self.counts = counts
        self.max_piece_len = max_piece_len
        total = sum(counts.values()) or 1
        self.scores = {
            p: math.log(c) - math.log(total) for p, c in counts.items() if c > 0
        }

    def segment(self, word: str) -> list[str]:
        return viterbi_segment(word, self.scores, self.max_piece_len)


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    *,
    vocab_size: int = 512,
    seed_size: int = 4096,
    max_piece_len: int = 6,
    em_rounds: int = 3,
    prune_keep: float = 0.75,
) -> UnigramTokenizer:
    """Viterbi-EM unigram training; returns the fitted tokenizer.

    Each round: segment every distinct word under the current model
    (mapInPandas, model in closure), sum piece counts with word weights
    (one vocab-grain shuffle), then keep the top ``prune_keep`` fraction
    (never below ``vocab_size``; single chars always survive). Final
    round prunes straight to ``vocab_size``.
    """
    wf = word_frequencies(df, text_col).persist()
    try:
        seeds = _seed_pieces(wf, max_piece_len, seed_size).collect()
        counts = {r["piece"]: int(r["cnt"]) for r in seeds}
        n_seed = len(counts)
        # closure set: every corpus character stays in the vocab with a
        # floor count of 1 even when no Viterbi path uses it alone —
        # otherwise a char absent from final segmentations would drop
        # out and an unseen-in-context word could only encode via the
        # UNK penalty path
        seed_chars = {p for p in counts if len(p) == 1}
        for rnd in range(em_rounds):
            model = UnigramTokenizer(counts, max_piece_len)
            scores = model.scores
            mpl = model.max_piece_len

            def e_step(
                it: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                for pdf in it:
                    rows = []
                    for w, c in zip(pdf["word"], pdf["cnt"]):
                        for p in viterbi_segment(str(w), scores, mpl):
                            rows.append((p, int(c)))
                    yield pd.DataFrame(rows, columns=["piece", "cnt"])

            observed = (
                wf.mapInPandas(e_step, "piece string, cnt long")
                .groupBy("piece")
                .agg(F.sum("cnt").alias("cnt"))
                .collect()  # vocab-sized model table, like BPE's merges
            )
            counts = {r["piece"]: int(r["cnt"]) for r in observed}
            # pruning: chars are unconditionally kept (closure); the
            # multi-char tail shrinks by prune_keep per round, straight
            # to vocab_size on the last
            chars = {p: max(counts.get(p, 0), 1) for p in seed_chars}
            multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )
            if rnd == em_rounds - 1:
                keep = max(vocab_size - len(chars), 0)
            else:
                keep = max(
                    int(len(multi) * prune_keep), vocab_size - len(chars)
                )
            counts = dict(multi[:keep])
            counts.update(chars)
        model = UnigramTokenizer(counts, max_piece_len)
        model.n_seed = n_seed  # type: ignore[attr-defined]
        return model
    finally:
        wf.unpersist()


def save_unigram(model: UnigramTokenizer, path: str) -> None:
    """Persist the model (piece → count + max_piece_len) as JSON — the
    model is vocab-sized (the sufficient statistic), exactly like BPE's
    merge list; scores re-derive on load."""
    import json

    with open(path, "w") as f:
        json.dump(
            {
                "max_piece_len": model.max_piece_len,
                "counts": model.counts,
            },
            f,
        )


def load_unigram(path: str) -> UnigramTokenizer:
    import json

    with open(path) as f:
        d = json.load(f)
    return UnigramTokenizer(
        {str(p): int(c) for p, c in d["counts"].items()},
        int(d["max_piece_len"]),
    )


def unigram_encode(
    df: DataFrame,
    text_col: str,
    model: UnigramTokenizer,
    *,
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained model — row-local
    ``mapInPandas``, the score dict in the closure (model-sized)."""
    scores = model.scores
    mpl = model.max_piece_len
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
                    for s in viterbi_segment(w, scores, mpl)
                ]
            )
            yield pdf

    return df.mapInPandas(enc, schema)
