"""Explicit schemas — schema-on-read with fixed projection, no inference.

Reference: DDL strings at ``ihop/import_data.py:33-36`` (comments/submissions)
and ``ihop/community2vec.py:32`` (context CSV). The reference reads raw
Pushshift JSON (~40 fields) through a fixed 8-column schema, which is also its
manual column pruning (SURVEY §4). We keep the same contract but:

* epoch columns are ``LONG`` not ``INTEGER`` (2038-safe, 100 TB rule), and we
  normalize the reference's comments/submissions ``created_utc`` type asymmetry
  (INTEGER vs STRING, ``ihop/import_data.py:33-36``) at read time instead of
  relying on implicit casts inside join arithmetic.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Reddit comment objects (JSON-lines). Reference: ihop/import_data.py:33-34.
COMMENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("parent_id", T.StringType()),
        T.StructField("score", T.IntegerType()),
        T.StructField("link_id", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("subreddit", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("created_utc", T.LongType()),
    ]
)

#: Reddit submission objects (JSON-lines). Reference: ihop/import_data.py:35.
SUBMISSIONS_SCHEMA = T.StructType(
    [
        T.StructField("author", T.StringType()),
        T.StructField("created_utc", T.LongType()),  # normalized (STRING in ref)
        T.StructField("id", T.StringType()),
        T.StructField("score", T.IntegerType()),
        T.StructField("selftext", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("subreddit", T.StringType()),
    ]
)

#: One-column user-context CSV for community2vec training.
#: Reference: ihop/community2vec.py:32.
CONTEXTS_SCHEMA = T.StructType(
    [T.StructField("subreddit_list", T.StringType(), nullable=False)]
)

#: Vocabulary counts CSV (subreddit,count). Reference: tests/test_files/vocab.csv.
VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("subreddit", T.StringType()),
        T.StructField("count", T.LongType()),
    ]
)

#: Sentinels the reference filters on (ihop/import_data.py:21-25).
DELETED_AUTHOR = "[deleted]"
REMOVED_TEXT_SENTINELS = ("[removed]", "[deleted]")
USER_PAGE_SUBREDDIT_REGEX = "^u_.*"
