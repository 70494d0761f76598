"""Distributed BPE (byte-pair-encoding) tokenizer training and encoding
(Sennrich et al. 2016) — the "train a tokenizer on the corpus" stage of
an LLM data pipeline.

Shape of the computation at 100 TB:

* ONE corpus-scale shuffle: word → count. Everything after runs on the
  word-frequency table, which is VOCABULARY-sized (heavy-tailed, millions
  of rows at web scale, never corpus-sized) — this is the classical BPE
  trick and the reason tokenizer training is cheap relative to the scan.
* Per merge step: adjacent-pair counts (explode + groupBy on the vocab
  frame, weighted by word count), argmax with a deterministic tie-break
  (count DESC, pair ASC), then the merge applied to the symbol arrays by
  an Arrow-batched ``mapInPandas`` (true left-to-right BPE merge — a
  genuinely sequential per-word operation, the documented Pandas-UDF
  escape hatch). The driver only ever materializes ONE row per step (the
  argmax), never the table.
* Encoding applies the learned merge ranks per word with the standard
  lowest-rank-first greedy loop, again ``mapInPandas``; the merge table
  is a broadcast-sized side input.

Reference parity: the reference tokenizes with a fixed regex
(``ihop/text_processing.py:315``) and never trains a tokenizer; corpus-
trained BPE is part of the engine's LLM-training-data extension tier
(SURVEY §2.9 note), sharing the word-count stage with the text pipeline.

Determinism: counts are integers, the tie-break is total, and the merge
application is order-insensitive across rows — the merge table is a pure
function of the corpus. Cross-engine hash parity is NOT claimed (the
within-word merge is not expressible in ANSI SQL without lookaround
regexes); the catalog gates invariants + an encode/decode round-trip,
and tests pin exact parity against a pure-Python reference BPE.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """One BPE merge step on one word: left-to-right, non-overlapping."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard greedy BPE encode: repeatedly apply the lowest-rank
    applicable merge until none applies."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        syms = merge_word(syms, best_pair[0], best_pair[1])
    return syms


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The one corpus-scale stage: (word, cnt) with map-side partials."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), "\\s+")).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("syms", T.ArrayType(T.StringType())),
        T.StructField("cnt", T.LongType()),
    ]
)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 20,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns
    ``[(left, right, pair_count), ...]`` in merge order.

    The loop runs on the vocab-sized frame; ``.persist`` per step with
    eager release of the previous state bounds both memory and lineage.
    """
    wf = word_frequencies(df, text_col)
    # split-to-chars: Spark's split(limit=-1) keeps a trailing empty
    # element — strip it ("" can never be a real symbol)
    state = wf.select(
        F.array_remove(F.split("word", "(?!^)"), "").alias("syms"),
        F.col("cnt"),
    ).persist()
    merges: list[tuple[str, str, int]] = []
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
            best = (
                pairs.groupBy(
                    F.col("p.0").alias("left"), F.col("p.1").alias("right")
                )
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()  # exactly ONE row — the argmax, never the table
            )
            if not best:
                break
            left, right, c = best[0]["left"], best[0]["right"], best[0]["c"]
            merges.append((left, right, int(c)))

            def apply_merge(
                it: Iterator[pd.DataFrame], l: str = left, r: str = right
            ) -> Iterator[pd.DataFrame]:
                for pdf in it:
                    pdf = pdf.copy()
                    pdf["syms"] = pdf["syms"].map(
                        lambda s: merge_word(list(s), l, r)
                    )
                    yield pdf

            nxt = state.mapInPandas(apply_merge, _STATE_SCHEMA)
            nxt = nxt.localCheckpoint(eager=True)
            state.unpersist()
            state = nxt
    finally:
        state.unpersist()
    return merges


def save_bpe_merges(
    merges: list[tuple[str, str, int]], path: str
) -> None:
    """Persist the merge list (THE model — rank = position) as JSON."""
    import json

    with open(path, "w") as f:
        json.dump([[l, r, c] for l, r, c in merges], f)


def load_bpe_merges(path: str) -> list[tuple[str, str, int]]:
    import json

    with open(path) as f:
        return [(str(l), str(r), int(c)) for l, r, c in json.load(f)]


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]],
    *,
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list (rank = position).
    Row-local ``mapInPandas``; the ranks dict ships in the closure
    (broadcast-sized — the merge table is the model)."""
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
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
                    for s in encode_word(w, ranks)
                ]
            )
            yield pdf

    return df.mapInPandas(enc, schema)
