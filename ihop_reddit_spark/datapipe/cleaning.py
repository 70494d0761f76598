"""C4-style rule-based corpus cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", §2.2) re-expressed as Catalyst plans.

Two stages, matching the paper:

* :func:`c4_clean` — line-level retention rules + page-level drop rules.
  The line pass is ENTIRELY row-local: lines live in an ``array<string>``
  column and the rules run inside ``filter()`` higher-order functions, so
  the stage is a zero-shuffle projection that scales with the scan. Page
  rules are plain ``where`` predicates on the raw text.
* :func:`sentence_span_dedup` — the paper's "discard all but one of any
  three-sentence span occurring more than once in the data set". Candidate
  spans come from one hash-keyed shuffle (every span hashed, first
  occurrence canonical); removal is sentence-granular per document.

Reference parity: the reference corpus prep (ihop/import_data.py:48-88)
filters by top-N subreddit membership only — it has no content-quality
pass. This module is part of the engine's LLM-training-data extension
tier alongside datapipe/curation.py (Gopher repetition signals,
decontamination) and datapipe/dedup.py (document-level dedup); C4's
line rules + sentence-span dedup are the missing page-structure stage.

Scale notes (100 TB): c4_clean adds NO shuffle — it fuses into the scan
projection. sentence_span_dedup shuffles (a) once on the 3-sentence span
hash (span count ≈ sentence count ≈ corpus tokens / ~20 — the same grain
as dedup.duplicate_substring_spans, measured linear there) and (b) once
on doc_id to reassemble; both partition on high-cardinality keys with no
skew (span hashes are md5-uniform).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..caching import register_scoped_persists

#: Default "bad words" placeholder list. C4 uses the public "List of Dirty,
#: Naughty, Obscene or Otherwise Bad Words"; the engine takes the list as a
#: parameter and ships a neutral single-token default for tests/oracles.
DEFAULT_BAD_WORDS: tuple[str, ...] = ("nsfwterm",)

#: Line must end in terminal punctuation (period, exclamation, question
#: mark, or closing quote) — C4 §2.2 rule 1.
_TERMINAL_RE = '[.!?"]$'


def _line_keep(line: Column, min_words: int) -> Column:
    """C4 line-retention predicate (row-local, no regex backtracking)."""
    return (
        line.rlike(_TERMINAL_RE)
        & (F.size(F.split(line, " ")) >= min_words)
        & ~F.lower(line).contains("javascript")
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words_per_line: int = 3,
    min_lines: int = 3,
    bad_words: tuple[str, ...] = DEFAULT_BAD_WORDS,
) -> DataFrame:
    """Apply C4's line filters then page filters; return survivors.

    Output: ``id_col``, ``cleaned_text`` (kept lines joined by newline),
    ``n_lines`` (before), ``n_lines_kept`` (after). Page-level drop rules
    run against the RAW text (the paper drops a page when the offending
    content appears anywhere on it, not only on retained lines):

    * fewer than ``min_lines`` retained lines,
    * contains ``lorem ipsum`` (case-insensitive),
    * contains a curly bracket ``{``,
    * contains any word from ``bad_words`` (word-boundary match).

    Zero shuffles: lines are split/filtered/rejoined with array
    higher-order functions inside one projection.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    kept = F.filter(lines, lambda x: _line_keep(x, min_words_per_line))
    # regex-escape each entry (real bad-word lists carry metacharacters);
    # \b anchors assume word-character boundaries — entries that start or
    # end with punctuation should be pre-normalized by the caller
    bad_re = (
        "\\b(" + "|".join(re.escape(w) for w in bad_words) + ")\\b"
        if bad_words
        else None
    )
    out = df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("cleaned_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        text.alias("__raw"),
    ).where(F.col("n_lines_kept") >= min_lines)
    out = out.where(~F.lower(F.col("__raw")).contains("lorem ipsum"))
    out = out.where(~F.col("__raw").contains("{"))
    if bad_re is not None:
        out = out.where(~F.lower(F.col("__raw")).rlike(bad_re))
    return out.drop("__raw")


def sentence_span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    span_sents: int = 3,
    sent_sep: str = ". ",
) -> DataFrame:
    """C4's cross-corpus three-sentence-span deduplication.

    Every window of ``span_sents`` consecutive sentences is hashed; the
    first occurrence corpus-wide (ordered by ``(id, start)``) is canonical
    and keeps its sentences, every other occurrence has the window's
    sentences removed from its document. Overlapping removed windows union
    their coverage. Documents whose sentences are all removed survive with
    empty text (row count is preserved — this is a rewrite, not a filter).

    Output: ``id_col``, ``deduped_text``, ``n_sents``, ``n_sents_removed``.

    Complexity: one shuffle on the span hash (uniform md5 keys), one on
    ``id_col`` for reassembly — the same profile as
    ``dedup.duplicate_substring_spans`` (measured linear in the ×10 probe).
    """
    did = F.col(id_col)
    # Sentence list; documents keep their trailing-period convention, so
    # split on ". " leaves the final sentence carrying its own period —
    # strip one trailing period for a uniform sentence key, re-add on join.
    sents_arr = F.split(F.col(text_col), re.escape(sent_sep), -1)
    base = df.select(
        did.alias("__id"),
        F.transform(
            sents_arr, lambda s: F.regexp_replace(s, "\\.$", "")
        ).alias("__sents"),
    )
    # Multi-consumer boundary (sentence stream, span stream, doc totals all
    # derive from the split) — scoped persist per the engine-wide rule;
    # callers release via caching.release_scoped_persists.
    base = base.withColumn("__n", F.size("__sents")).persist()

    sents = base.select(
        "__id", F.posexplode("__sents").alias("__idx", "__sent")
    )
    # Span hash per window start (docs shorter than the window emit none).
    k = span_sents
    spans = base.where(F.col("__n") >= k).select(
        "__id",
        F.explode(F.sequence(F.lit(0), F.col("__n") - k)).alias("__start"),
        "__sents",
    ).select(
        "__id",
        "__start",
        F.md5(
            F.array_join(
                F.slice(F.col("__sents"), F.col("__start") + 1, k), "\x01"
            )
        ).alias("__h"),
    )
    # Canonical occurrence per hash = min (id, start). A per-hash window
    # sort would put a boilerplate span's entire occurrence list in one
    # task; min(struct) instead partial-aggregates map-side (hot hashes
    # combine before the shuffle), and the dup-hash join is AQE-skew-
    # splittable. Non-duplicated hashes (the vast majority) exit at the
    # count>1 filter before the join.
    agg = spans.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(F.struct("__id", "__start")).alias("__c"),
    ).where(F.col("__n") > 1)
    removed = (
        spans.join(agg, "__h")
        .where(
            ~(
                (F.col("__id") == F.col("__c.__id"))
                & (F.col("__start") == F.col("__c.__start"))
            )
        )
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__start"), F.col("__start") + k - 1)
            ).alias("__idx"),
        )
        .distinct()
    )
    kept = sents.join(removed, ["__id", "__idx"], "left_anti")
    reassembled = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__idx", "__sent"))
                ),
                lambda s: s["__sent"],
            ),
            sent_sep.strip() + " " if sent_sep.strip() else sent_sep,
        ).alias("__joined"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = base.select("__id", F.col("__n").alias("__n_total"))
    out = totals.join(reassembled, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.when(
            F.coalesce(F.col("__n_kept"), F.lit(0)) > 0,
            F.concat(F.col("__joined"), F.lit(sent_sep.strip())),
        ).otherwise(F.lit("")).alias("deduped_text"),
        F.col("__n_total").cast("long").alias("n_sents"),
        (F.col("__n_total") - F.coalesce(F.col("__n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_sents_removed"),
    )
    return register_scoped_persists(out, base)
