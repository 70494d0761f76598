"""Closed-form tests for the C4-style cleaning tier
(datapipe/cleaning.py): line-retention rules, page drop rules, and
cross-corpus three-sentence-span dedup.

The catalog queries built on these are DuckDB-oracle-gated at sf0.01
(c4_cleaned_documents, c4_sentence_span_dedup); these tests pin the
hand-computable semantics on tiny inputs plus the zero-shuffle plan
contract for the line pass.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ihop_reddit_spark.caching import release_scoped_persists
from ihop_reddit_spark.datapipe.cleaning import c4_clean, sentence_span_dedup


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # doc 1: all four lines pass line rules and the page survives
        (1, "alpha beta gamma.\ndelta epsilon zeta!\nquoted words here\"\n"
            "is this a question?"),
        # doc 2: junk lines dropped (no terminal punct / too few words /
        # javascript), leaving 3 good lines — page survives at min_lines=3
        (2, "one good line here.\nno terminal punctuation\nshort one.\n"
            "please enable javascript now.\nsecond good line stays.\n"
            "third good line stays."),
        # doc 3: fine lines but too few survive (min_lines=3)
        (3, "only line one stays.\nonly line two stays."),
        # doc 4: lorem ipsum anywhere on the page drops the page
        (4, "good line number one.\ngood line number two.\n"
            "good line number three.\nLorem Ipsum dolor sit."),
        # doc 5: curly bracket drops the page even on a dropped line
        (5, "good line number one.\ngood line number two.\n"
            "good line number three.\nfunction() { return 1; }"),
        # doc 6: bad word (word-boundary) drops the page
        (6, "good line number one.\ngood line number two.\n"
            "this page has nsfwterm material."),
        # doc 7: substring of a bad word does NOT match the word boundary
    (7, "good line number one.\ngood line number two.\n"
            "notnsfwtermish words are fine here."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_c4_line_and_page_rules(pages):
    out = {
        r["doc_id"]: r
        for r in c4_clean(pages, "text", "doc_id").collect()
    }
    # docs 3 (too few kept lines), 4 (lorem ipsum), 5 ({), 6 (bad word) gone
    assert sorted(out) == [1, 2, 7]
    assert out[1]["n_lines"] == 4 and out[1]["n_lines_kept"] == 4
    assert out[1]["cleaned_text"].count("\n") == 3
    # doc 2: 6 lines in, 3 kept, junk lines absent from the cleaned text
    assert out[2]["n_lines"] == 6 and out[2]["n_lines_kept"] == 3
    assert "javascript" not in out[2]["cleaned_text"]
    assert "no terminal" not in out[2]["cleaned_text"]
    assert out[2]["cleaned_text"].splitlines() == [
        "one good line here.",
        "second good line stays.",
        "third good line stays.",
    ]
    assert out[7]["n_lines_kept"] == 3


def test_c4_line_pass_is_zero_shuffle(pages):
    plan = (
        c4_clean(pages, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_sentence_span_dedup_removes_noncanonical(spark):
    shared = "alpha one. alpha two. alpha three."
    rows = [
        (1, "unique opening here. " + shared),
        (2, "different opening line. " + shared + " closing tail here."),
        (3, shared),  # fully covered by the shared span → empty survivor
        (4, "totally unrelated text. nothing shared at all."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sentence_span_dedup(df, "text", "doc_id")
    got = {r["doc_id"]: r for r in out.collect()}
    release_scoped_persists(out)
    # row-preserving rewrite
    assert sorted(got) == [1, 2, 3, 4]
    # doc 1 is canonical (lowest doc_id, earliest start) — keeps everything
    assert got[1]["deduped_text"] == rows[0][1]
    assert got[1]["n_sents_removed"] == 0
    # doc 2 loses exactly the 3 shared sentences, keeps its own
    assert got[2]["deduped_text"] == "different opening line. closing tail here."
    assert got[2]["n_sents"] == 5 and got[2]["n_sents_removed"] == 3
    # doc 3 is entirely the shared span → empty text, row retained
    assert got[3]["deduped_text"] == "" and got[3]["n_sents_removed"] == 3
    # doc 4 untouched
    assert got[4]["deduped_text"] == rows[3][1]


def test_sentence_span_dedup_overlapping_spans_union_coverage(spark):
    # Four sentences a b c d; doc 11 duplicates windows (a,b,c) AND (b,c,d)
    # → coverage unions to all four sentences.
    rows = [
        (10, "sent a. sent b. sent c. sent d."),
        (11, "sent a. sent b. sent c. sent d. only mine here."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sentence_span_dedup(df, "text", "doc_id")
    got = {r["doc_id"]: r for r in out.collect()}
    release_scoped_persists(out)
    assert got[10]["n_sents_removed"] == 0
    assert got[11]["deduped_text"] == "only mine here."
    assert got[11]["n_sents_removed"] == 4
