"""Bag-of-words corpus prep: the reference's second entry point (SURVEY §3.2).

Reference: ``bag_of_words(...)`` at ``ihop/import_data.py:470-540`` —
from raw comments + submissions, build the joined thread table feeding the
topic-model text pipeline:

comments:    S1 scan → P2 regex filter → A1 top-N → J1 semi-join → P4 remove
             removed/deleted bodies → P3 remove deleted authors → J2 exclude
             top-percent users
submissions: S1 scan → P2 → J1 (same vocabulary) → P4/P3 → P6 fullname id
join:        J3 inner on fullname_id == link_id with prefixed comment columns
             + P7 time delta → P5 optional exclusive time window

Everything is a composition of the operator library; one lazy plan, ~3
shuffles (top-N count, user counts, the fact-to-fact join) with the
vocabulary and keep-user tables traveling as broadcasts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.filters import (
    filter_by_regex,
    filter_not_equal,
    filter_not_in,
    filter_open_range,
)
from ..operators.joins import join_submissions_and_comments, semi_join_filter
from ..operators.topn import top_n_by_count
from ..operators.windows import exclude_top_percent
from ..schemas import DELETED_AUTHOR, USER_PAGE_SUBREDDIT_REGEX

REMOVED_BODIES = ("[removed]", "[deleted]")


@dataclass
class BowConfig:
    """Defaults mirror ``ihop/import_data.py:470-540`` / ``params.yaml``."""

    top_n: int = 10_000
    exclude_user_fraction: float = 0.05
    min_time_delta: int | None = None
    max_time_delta: int | None = None
    subreddit_col: str = "subreddit"
    author_col: str = "author"
    body_col: str = "body"
    exclude_item_regex: str = USER_PAGE_SUBREDDIT_REGEX


def bag_of_words(
    comments: DataFrame,
    submissions: DataFrame,
    cfg: BowConfig | None = None,
) -> DataFrame:
    """Joined submission–comment thread table with ``time_to_comment_in_seconds``."""
    cfg = cfg or BowConfig()

    c = filter_by_regex(comments, cfg.subreddit_col, cfg.exclude_item_regex)
    s = filter_by_regex(submissions, cfg.subreddit_col, cfg.exclude_item_regex)
    vocab = top_n_by_count(c, cfg.subreddit_col, cfg.top_n).select(cfg.subreddit_col)

    c = semi_join_filter(c, vocab, cfg.subreddit_col)
    c = filter_not_in(c, cfg.body_col, REMOVED_BODIES)
    c = filter_not_equal(c, cfg.author_col, DELETED_AUTHOR)
    if cfg.exclude_user_fraction:
        user_counts = c.groupBy(cfg.author_col).agg(
            F.count(F.lit(1)).alias("__activity")
        )
        keep = exclude_top_percent(
            user_counts, "__activity", cfg.exclude_user_fraction
        ).select(cfg.author_col)
        c = semi_join_filter(c, keep, cfg.author_col)

    s = semi_join_filter(s, vocab, cfg.subreddit_col)
    s = filter_not_in(s, "selftext", REMOVED_BODIES)
    s = filter_not_equal(s, cfg.author_col, DELETED_AUTHOR)

    joined = join_submissions_and_comments(s, c)
    if cfg.min_time_delta is not None or cfg.max_time_delta is not None:
        joined = filter_open_range(
            joined,
            "time_to_comment_in_seconds",
            cfg.min_time_delta,
            cfg.max_time_delta,
        )
    return joined


def thread_documents(joined: DataFrame, comment_prefix: str = "comments_") -> DataFrame:
    """bow output → topic-model document table (``SparkCorpus.
    init_from_joined_dataframe``, ``ihop/text_processing.py:176-232``):
    one row per submission with ``document_text`` = title ∥ selftext ∥
    comment bodies in event-time order — A8 with the reference's undefined
    sort-before-groupBy replaced by an explicit in-group total order.

    Output: (id, subreddit, document_text).
    """
    from ..operators.aggregates import assemble_thread_documents

    assembled = assemble_thread_documents(
        joined,
        "fullname_id",
        ["id", "subreddit", "title", "selftext"],
        f"{comment_prefix}body",
        ["time_to_comment_in_seconds", f"{comment_prefix}id"],
        doc_col="__comments_concat",
    )
    return assembled.select(
        "id",
        "subreddit",
        F.concat_ws(
            " ", F.col("title"), F.col("selftext"), F.col("__comments_concat")
        ).alias("document_text"),
    )
