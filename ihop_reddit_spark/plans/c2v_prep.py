"""The flagship pipeline: community2vec context prep (SURVEY §3.1, §7).

Reference: ``community2vec(...)`` at ``ihop/import_data.py:422-467`` — from a
month of raw comments, compute (a) the top-N subreddits by comment count and
(b) each surviving user's space-joined subreddit context, excluding user-page
subreddits, deleted authors, the top p% most active users, and contexts
shorter than ``min_sentence_length``.

Chain: S1 scan → P2 regex filter → A1 top-N → J1 broadcast semi-join →
P3 author filter → A3+W1 heavy-user exclusion (histogram-based, no global
sort) → A2 ordered group-concat → length filter.

Shuffle budget (the thing that matters at 100 TB): one shuffle for the top-N
count, one for the per-user counts, one for the context group-by — the two
per-user aggregations share the ``groupBy(author)`` key, so with
``spark.sql.shuffle.partitions`` aligned Spark reuses the exchange (visible
as ReusedExchange in ``.explain``). The top-N and keep-user tables travel as
broadcasts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import grouped_concat
from ..operators.filters import filter_by_regex, filter_not_equal
from ..operators.joins import semi_join_filter
from ..operators.topn import top_n_by_count
from ..operators.windows import exclude_top_percent
from ..schemas import DELETED_AUTHOR, USER_PAGE_SUBREDDIT_REGEX


@dataclass
class C2VPrepConfig:
    """Defaults mirror ``ihop/import_data.py:19-29`` / ``params.yaml:63-65``."""

    user_col: str = "author"
    item_col: str = "subreddit"
    order_cols: tuple = ("created_utc", "id")
    top_n: int = 10_000
    exclude_user_fraction: float = 0.05
    min_sentence_length: int = 2
    exclude_item_regex: str | None = USER_PAGE_SUBREDDIT_REGEX
    deleted_user_sentinel: str | None = DELETED_AUTHOR
    max_context_items: int | None = None  # 100 TB guard on collect_list state
    #: True = count users in a separate pass and semi-join the keep-set
    #: BEFORE aggregating (reference's shape — avoids building contexts for
    #: soon-dropped heavy users). False (default) = fused single-aggregation
    #: plan; see user_contexts.
    prefilter_heavy_users: bool = False


#: The synthetic events-table tuning of the prep pipeline (user sessions
#: over event types) — shared by the catalog flagship queries and the
#: interactive explorer so both build the same vocabulary.
EVENTS_C2V_CFG = C2VPrepConfig(
    user_col="user_id",
    item_col="event_type",
    order_cols=("ts", "event_id"),
    top_n=4,
    exclude_user_fraction=0.05,
    min_sentence_length=2,
    exclude_item_regex="^err.*",
    deleted_user_sentinel=None,
)


def top_n_items(df: DataFrame, cfg: C2VPrepConfig) -> DataFrame:
    """Vocabulary query (A1): top-N items by row count, ties broken by name."""
    filtered = df
    if cfg.exclude_item_regex:
        filtered = filter_by_regex(filtered, cfg.item_col, cfg.exclude_item_regex)
    return top_n_by_count(filtered, cfg.item_col, cfg.top_n)


def user_contexts(
    df: DataFrame,
    cfg: C2VPrepConfig,
    top_n_df: DataFrame | None = None,
) -> DataFrame:
    """Surviving users' ordered item contexts:
    ``(user, context_concat, context_length)``.

    Fused plan (default): the heavy-user exclusion metric (per-user row
    count over the vocab-filtered rows) EQUALS the aggregated
    ``context_length``, so the engine aggregates once and applies the
    percentile exclusion to the aggregated table — 2 source scans total
    (top-N count + context aggregation) and one wide shuffle, vs the
    reference shape's separate count pass + keep-set semi-join (5 scans as
    one Catalyst plan). Set ``cfg.prefilter_heavy_users`` for the
    reference shape when contexts of soon-dropped heavy users are too
    expensive to even build and ``max_context_items`` must stay None.
    """
    filtered = df
    if cfg.exclude_item_regex:
        filtered = filter_by_regex(filtered, cfg.item_col, cfg.exclude_item_regex)
    if top_n_df is None:
        top_n_df = top_n_by_count(filtered, cfg.item_col, cfg.top_n)
    filtered = semi_join_filter(
        filtered, top_n_df.select(cfg.item_col), cfg.item_col
    )
    if cfg.deleted_user_sentinel is not None:
        filtered = filter_not_equal(filtered, cfg.user_col, cfg.deleted_user_sentinel)
    if cfg.exclude_user_fraction and cfg.prefilter_heavy_users:
        user_counts = filtered.groupBy(cfg.user_col).agg(
            F.count(F.lit(1)).alias("__activity")
        )
        kept_users = exclude_top_percent(
            user_counts, "__activity", cfg.exclude_user_fraction
        ).select(cfg.user_col)
        filtered = semi_join_filter(filtered, kept_users, cfg.user_col)
    contexts = grouped_concat(
        filtered,
        cfg.user_col,
        cfg.item_col,
        order_cols=list(cfg.order_cols),
        max_items=cfg.max_context_items,
    )
    if cfg.exclude_user_fraction and not cfg.prefilter_heavy_users:
        # NOTE: valid only while context_length counts the same rows the
        # reference's activity count does (max_context_items caps the LIST,
        # not the count — grouped_concat always emits the full count).
        contexts = exclude_top_percent(
            contexts, "context_length", cfg.exclude_user_fraction
        )
    return contexts.where(F.col("context_length") >= cfg.min_sentence_length)
