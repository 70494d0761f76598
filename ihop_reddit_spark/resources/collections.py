"""Pre-defined subreddit groupings ("collections") for search,
visualization, and cluster-label enrichment.

Mirrors ``ihop/resources/collections/__init__.py:1-32``: the reference
stores one text file per collection (one member subreddit per line) and
exposes ``Collection`` metadata plus ``get_collection_members``. Here
the memberships are one headered CSV (``collection``, ``member``) and
the Spark-facing surface is a broadcast-sized lookup DataFrame — the
idiomatic enrichment path is a broadcast join, not a driver loop.
"""

from __future__ import annotations

import csv
import os
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEMBERS_CSV = os.path.join(
    _HERE, "resources", "collections", "collection_members.csv"
)


class Collection(NamedTuple):
    name: str
    description: str


#: Collection metadata, keyed by display name
#: (reference ``COLLECTIONS_LIST`` / ``SUBREDDIT_GROUPINGS``).
SUBREDDIT_GROUPINGS: dict[str, Collection] = {
    "Denigrating toward immigrants": Collection(
        "Denigrating toward immigrants",
        "Subreddits that frequently have denigrating language about "
        "immigrants",
    ),
}


def get_collection_members(collection_name: str) -> list[str]:
    """Members of one collection, in file order (reference
    ``get_collection_members``)."""
    if collection_name not in SUBREDDIT_GROUPINGS:
        raise KeyError(collection_name)
    with open(MEMBERS_CSV, newline="") as f:
        return [
            row["member"]
            for row in csv.DictReader(f)
            if row["collection"] == collection_name
        ]


def collections_df(spark: SparkSession) -> DataFrame:
    """ALL collection memberships as a lookup frame
    ``(collection, member, description)`` — broadcast-sized by
    construction (tens of rows per collection)."""
    rows = []
    with open(MEMBERS_CSV, newline="") as f:
        for row in csv.DictReader(f):
            meta = SUBREDDIT_GROUPINGS.get(row["collection"])
            rows.append(
                (
                    row["collection"],
                    row["member"],
                    meta.description if meta else None,
                )
            )
    return spark.createDataFrame(
        rows, "collection string, member string, description string"
    )


def enrich_with_collections(
    df: DataFrame,
    member_col: str,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Left-join collection labels onto any frame with a subreddit-like
    column: adds ``collection`` (NULL when the value is in no
    collection). The lookup side is broadcast — the enriched frame
    never shuffles, so this composes onto a 100 TB cluster-assignment
    table for free.
    """
    spark = spark or df.sparkSession
    lookup = collections_df(spark).select(
        F.col("member").alias(member_col), "collection"
    )
    return df.join(F.broadcast(lookup), member_col, "left")
