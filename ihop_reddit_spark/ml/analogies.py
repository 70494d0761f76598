"""Reference-derived subreddit analogy benchmark (M3 data surface).

The reference ships headerless seed-pair CSVs (city↔MLB/NBA/NFL/NHL team,
university↔city town) and expands every unordered pair-combination within
a file into an ``a:b :: c:d`` 4-tuple (``ihop/resources/analogies/
__init__.py:7-56`` — ``generate_analogies`` over ``itertools``-style
``i<j`` row combinations; the bundled ``subreddit_analogies.txt`` is the
pre-expanded artifact). The seed pairs are PUBLIC FACTUAL DATA (which
city hosts which franchise subreddit); they are vendored here merged
into one sectioned, headered CSV (``resources/analogies/
analogy_pairs.csv``) rather than five headerless files.

Expansion semantics mirrored exactly: per section with ``n`` pairs the
benchmark has ``n·(n−1)/2`` tuples — 113,842 total across the five
sections, matching the reference artifact's tuple count.

Evaluation goes through :func:`ihop_reddit_spark.ml.community2vec.
evaluate_analogies` (batched BLAS, OOV-skip, sectioned P@1) — this
module only supplies the reference benchmark's DATA.
"""

from __future__ import annotations

import csv
import os
from itertools import combinations

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_PAIRS_CSV = os.path.join(
    _HERE, "resources", "analogies", "analogy_pairs.csv"
)

#: The five reference benchmark sections, in file order.
REFERENCE_SECTIONS = (
    "city_to_mlb_team",
    "city_to_nba_team",
    "city_to_nfl_team",
    "city_to_nhl_team",
    "uni_to_city",
)


def load_reference_pairs(
    path: str | None = None,
) -> dict[str, list[tuple[str, str]]]:
    """Seed pairs by section, preserving within-section file order
    (the expansion below is order-sensitive only in tuple ordering,
    not membership)."""
    path = path or DEFAULT_PAIRS_CSV
    out: dict[str, list[tuple[str, str]]] = {}
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        for row in reader:
            out.setdefault(row["section"], []).append((row["a"], row["b"]))
    return out


#: The four sports sections — the fast gate subset (1,741 tuples).
SPORTS_SECTIONS = (
    "city_to_mlb_team",
    "city_to_nba_team",
    "city_to_nfl_team",
    "city_to_nhl_team",
)


def build_reference_corpus(
    spark,
    sections: tuple[str, ...] = SPORTS_SECTIONS,
    reps: int = 15,
    seed: int = 11,
    path: str | None = None,
):
    """Synthetic training corpus over the REAL benchmark vocabulary:
    each seed pair (a, b) gets a private anchor token plus a city-side
    marker and a per-section team-side marker, so every a→b offset is
    consistent within a section and the trained embedding can be
    evaluated on the actual reference tuples. Scaffold tokens are
    ``__``-prefixed — exclude them from the prediction vocabulary
    (``vectors().where(~col("word").startswith("__"))``).

    Shared by the c2v/sgns reference-analogy gates and their pytest
    twins — one builder, one corpus shape.
    """
    import random

    pairs = load_reference_pairs(path)
    rng = random.Random(seed)
    rows = []
    for si, section in enumerate(sections):
        for pi, (a, b) in enumerate(pairs[section]):
            anchor = f"__pair_{si}_{pi}"
            for _ in range(reps):
                s1 = [a, anchor, "__cityness"]
                s2 = [b, anchor, f"__{section}"]
                rng.shuffle(s1)
                rng.shuffle(s2)
                rows.append((s1,))
                rows.append((s2,))
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "context array<string>")


def reference_analogies(
    path: str | None = None,
    sections: tuple[str, ...] | None = None,
) -> list[tuple[str, str, str, str, str]]:
    """The full reference benchmark as (section, a, b, c, d) 5-tuples:
    ``a:b :: c:d`` for every i<j pair combination within a section —
    the reference's ``generate_analogies`` semantics
    (``ihop/resources/analogies/__init__.py:7-26``). 113,842 tuples.

    ``sections`` restricts to a subset (e.g. the four sports sections
    for a fast gate; ``uni_to_city`` alone is 112k tuples).
    """
    pairs = load_reference_pairs(path)
    out: list[tuple[str, str, str, str, str]] = []
    for section in sections or REFERENCE_SECTIONS:
        for (a, b), (c, d) in combinations(pairs.get(section, []), 2):
            out.append((section, a, b, c, d))
    return out
