"""Operator unit tests on literal rows — the reference's test style
(SURVEY §5: operator → literal rows → collected assertion), covering the
relational core against hand-computed expectations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ihop_reddit_spark.operators.aggregates import (
    assemble_thread_documents,
    contingency_table,
    describe_column,
    grouped_concat,
)
from ihop_reddit_spark.operators.filters import (
    filter_by_regex,
    filter_not_equal,
    filter_not_in,
    filter_open_range,
)
from ihop_reddit_spark.operators.joins import (
    anti_join_filter,
    join_submissions_and_comments,
    semi_join_filter,
)
from ihop_reddit_spark.operators.projections import (
    recategorize,
    rename_with_prefix,
    with_difference,
    with_prefixed_id,
)
from ihop_reddit_spark.operators.setops import key_alignment, union_dedup
from ihop_reddit_spark.operators.topn import top_n_by_count
from ihop_reddit_spark.operators.windows import (
    exclude_top_percent,
    percent_rank_exact,
    top_k_per_group,
)


@pytest.fixture(scope="module")
def author_subreddit(spark):
    # Mirrors the reference's inline fixture (tests/test_import_data.py:30-52):
    # mixed-case names + u_-prefixed user-page subreddits.
    rows = [
        ("alice", "nba", 1, "c1"),
        ("alice", "nba", 2, "c2"),
        ("alice", "NBA2K", 3, "c3"),
        ("bob", "nba", 4, "c4"),
        ("bob", "u_bob", 5, "c5"),
        ("carol", "funny", 6, "c6"),
        ("[deleted]", "nba", 7, "c7"),
        ("dave", "funny", 8, "c8"),
        ("dave", "nba", 9, "c9"),
        ("dave", "funny", 10, "c10"),
    ]
    return spark.createDataFrame(
        rows, "author string, subreddit string, created_utc long, id string"
    )


def test_filter_by_regex_removes_user_pages(author_subreddit):
    out = filter_by_regex(author_subreddit, "subreddit", "^u_.*")
    assert out.where(F.col("subreddit") == "u_bob").count() == 0
    assert out.count() == 9
    kept = filter_by_regex(author_subreddit, "subreddit", "^u_.*", keep_matches=True)
    assert kept.count() == 1


def test_filter_not_equal_drops_deleted(author_subreddit):
    out = filter_not_equal(author_subreddit, "author", "[deleted]")
    assert out.count() == 9
    assert out.where(F.col("author") == "[deleted]").count() == 0


def test_filter_not_in(spark):
    df = spark.createDataFrame(
        [("a", "[removed]"), ("b", "hello"), ("c", "[deleted]")], "id string, body string"
    )
    out = filter_not_in(df, "body", ["[removed]", "[deleted]"])
    assert [r.id for r in out.collect()] == ["b"]


def test_filter_open_range_exclusive(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "x long")
    out = filter_open_range(df, "x", lower=2, upper=7)
    assert sorted(r.x for r in out.collect()) == [3, 4, 5, 6]
    only_lower = filter_open_range(df, "x", lower=8)
    assert sorted(r.x for r in only_lower.collect()) == [9]


def test_top_n_by_count_tie_break(author_subreddit):
    # counts: nba=5, funny=3, NBA2K=1, u_bob=1 → ties broken name-asc
    out = top_n_by_count(author_subreddit, "subreddit", 3).collect()
    assert [(r.subreddit, r["count"]) for r in out] == [
        ("nba", 5),
        ("funny", 3),
        ("NBA2K", 1),
    ]


def test_semi_and_anti_join(author_subreddit, spark):
    keep = spark.createDataFrame([("nba",)], "subreddit string")
    semi = semi_join_filter(author_subreddit, keep, "subreddit")
    assert semi.count() == 5
    assert set(semi.columns) == set(author_subreddit.columns)
    anti = anti_join_filter(author_subreddit, keep, "subreddit")
    assert anti.count() == 5


def test_prefixed_id_and_rename(spark):
    df = spark.createDataFrame([("6xauyf",)], "id string")
    out = with_prefixed_id(df, "id", "t3_", "fullname_id")
    assert out.first().fullname_id == "t3_6xauyf"
    renamed = rename_with_prefix(df, ["id"], "comments_")
    assert renamed.columns == ["comments_id"]


def test_join_submissions_and_comments(spark):
    subs = spark.createDataFrame(
        [("s1", "alice", 100, "text1", "title1", "sub1")],
        "id string, author string, created_utc long, selftext string, title string, subreddit string",
    )
    comments = spark.createDataFrame(
        [
            ("c1", "t3_s1", "bob", 160, "first!"),
            ("c2", "t3_s1", "carol", 700, "second"),
            ("c3", "t3_zz", "dan", 100, "other thread"),
        ],
        "id string, link_id string, author string, created_utc long, body string",
    )
    joined = join_submissions_and_comments(subs, comments)
    rows = {r.comments_id: r for r in joined.collect()}
    assert set(rows) == {"c1", "c2"}
    assert rows["c1"].time_to_comment_in_seconds == 60
    assert rows["c2"].time_to_comment_in_seconds == 600
    # P5 range filter composes on the derived column
    windowed = filter_open_range(joined, "time_to_comment_in_seconds", 0, 300)
    assert [r.comments_id for r in windowed.collect()] == ["c1"]


def test_grouped_concat_ordered(author_subreddit):
    clean = filter_not_equal(
        filter_by_regex(author_subreddit, "subreddit", "^u_.*"), "author", "[deleted]"
    )
    out = grouped_concat(
        clean, "author", "subreddit", order_cols=["created_utc"],
    )
    got = {r.author: (r.context_concat, r.context_length) for r in out.collect()}
    assert got["alice"] == ("nba nba NBA2K", 3)
    assert got["dave"] == ("funny nba funny", 3)
    assert got["carol"] == ("funny", 1)


def test_grouped_concat_max_items(author_subreddit):
    out = grouped_concat(
        author_subreddit, "author", "subreddit",
        order_cols=["created_utc"], max_items=2,
    )
    got = {r.author: r.context_concat for r in out.collect()}
    assert got["alice"] == "nba nba"  # truncated after ordering
    assert got["alice"] is not None and len(got["alice"].split()) == 2


def test_exclude_top_percent_matches_exact_window(spark):
    # 20 users with activity 1..20; exclude top 10% → drop counts 19, 20
    df = spark.createDataFrame([(f"u{i}", i) for i in range(1, 21)], "user string, cnt long")
    out = exclude_top_percent(df, "cnt", 0.10)
    kept = sorted(r.cnt for r in out.collect())
    # exact spec: percent_rank = (cnt-1)/19 <= 0.9 → cnt <= 18.1 → keep 1..18
    assert kept == list(range(1, 19))
    # cross-check against the reference-literal single-partition window
    exact = percent_rank_exact(df, "cnt")
    ref_kept = sorted(r.cnt for r in exact.where(F.col("percent_rank") <= 0.9).collect())
    assert kept == ref_kept


def test_exclude_top_percent_with_ties(spark):
    # ties at the boundary: all rows with the same metric share a rank
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 2), ("d", 2), ("e", 5)], "user string, cnt long"
    )
    out = exclude_top_percent(df, "cnt", 0.05)
    exact = percent_rank_exact(df, "cnt")
    ref = sorted(r.user for r in exact.where(F.col("percent_rank") <= 0.95).collect())
    assert sorted(r.user for r in out.collect()) == ref


def test_exclude_zero_fraction_keeps_all(spark):
    df = spark.createDataFrame([("a", 1), ("b", 9)], "user string, cnt long")
    assert exclude_top_percent(df, "cnt", 0.0).count() == 2


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", "x", 5), ("g1", "y", 9), ("g1", "z", 9), ("g2", "w", 1)],
        "g string, item string, score long",
    )
    out = top_k_per_group(
        df, "g", [F.col("score").desc(), F.col("item").asc()], 2
    )
    got = [(r.g, r.item, r.rank) for r in out.orderBy("g", "rank").collect()]
    assert got == [("g1", "y", 1), ("g1", "z", 2), ("g2", "w", 1)]


def test_assemble_thread_documents(spark):
    df = spark.createDataFrame(
        [
            ("s1", "title1", "body B", 200, "cB"),
            ("s1", "title1", "body A", 100, "cA"),
            ("s2", "title2", "solo", 50, "cC"),
        ],
        "sid string, title string, body string, delta long, cid string",
    )
    out = assemble_thread_documents(
        df, "sid", ["title"], "body", ["delta", "cid"]
    )
    got = {r.sid: (r.title, r.document_text, r.num_comments) for r in out.collect()}
    assert got["s1"] == ("title1", "body A body B", 2)
    assert got["s2"] == ("title2", "solo", 1)


def test_recategorize(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
    out = recategorize(df, "v", ["a"], "cat")
    got = {r.v: r.cat for r in out.collect()}
    assert got == {"a": "a", "b": "other", "c": "other"}


def test_union_dedup(spark):
    d1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    d2 = spark.createDataFrame([(2, "b"), (3, "c")], "k long, v string")
    assert union_dedup(d1, d2).count() == 3


def test_key_alignment_full_outer_fill(spark):
    d1 = spark.createDataFrame([("x", 1), ("y", 2)], "k string, c1 int")
    d2 = spark.createDataFrame([("y", 20), ("z", 30)], "k string, c2 int")
    out = key_alignment(d1, d2, "k", "full_outer", fill={"c1": -1, "c2": -1})
    got = {r.k: (r.c1, r.c2) for r in out.collect()}
    assert got == {"x": (1, -1), "y": (2, 20), "z": (-1, 30)}


def test_contingency_table(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")], "l string, r string"
    )
    out = contingency_table(df, "l", "r")
    got = {(r.l, r.r): r.n for r in out.collect()}
    assert got == {("a", "x"): 2, ("a", "y"): 1, ("b", "y"): 1}


def test_describe_column(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0)], "g string, v double"
    )
    row = describe_column(df, "g", "v").first()
    assert row["count"] == 3
    assert row["mean_v"] == pytest.approx(2.0)
    assert row["stddev_v"] == pytest.approx(1.0)
    assert row["min_v"] == 1.0 and row["max_v"] == 3.0


def test_asof_join_backward_semantics(spark):
    from ihop_reddit_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 20, "l20"), (1, 5, "l5"), (2, 7, "l7")],
        "k long, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 9, "r9")],
        "k long, ts long, rv string",
    )
    out = {
        r["lv"]: (r["asof_ts"], r["asof_rv"])
        for r in asof_join(left, right, "k", "ts", "ts").collect()
    }
    assert out == {
        "l10": (10, "r10"),   # inclusive at equal ts
        "l20": (15, "r15"),   # latest preceding
        "l5": (None, None),   # nothing before
        "l7": (None, None),   # right row is later
    }
    # tolerance nulls out stale matches
    tol = {
        r["lv"]: r["asof_rv"]
        for r in asof_join(left, right, "k", "ts", "ts", tolerance=3).collect()
    }
    assert tol == {"l10": "r10", "l20": None, "l5": None, "l7": None}


def test_asof_join_forward_semantics(spark):
    from ihop_reddit_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 20, "l20"), (1, 5, "l5"), (2, 12, "l12")],
        "k long, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 9, "r9")],
        "k long, ts long, rv string",
    )
    out = {
        r["lv"]: (r["asof_ts"], r["asof_rv"])
        for r in asof_join(
            left, right, "k", "ts", "ts", direction="forward"
        ).collect()
    }
    assert out == {
        "l10": (10, "r10"),   # inclusive at equal ts
        "l20": (None, None),  # nothing after
        "l5": (10, "r10"),    # earliest following
        "l12": (None, None),  # right row is earlier
    }
    tol = {
        r["lv"]: r["asof_rv"]
        for r in asof_join(
            left, right, "k", "ts", "ts", direction="forward", tolerance=3
        ).collect()
    }
    assert tol == {"l10": "r10", "l20": None, "l5": None, "l12": None}


def test_corpus_stats_approx_within_rsd(spark, sf_dir):
    from ihop_reddit_spark.operators.aggregates import corpus_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = corpus_stats(ev, ["user_id", "event_type"]).first()
    approx = corpus_stats(ev, ["user_id", "event_type"], approx_rsd=0.02).first()
    assert approx["num_rows"] == exact["num_rows"]
    for c in ("distinct_user_id", "distinct_event_type"):
        assert abs(approx[c] - exact[c]) <= max(3, 0.1 * exact[c])


def test_bag_of_words_pipeline(spark):
    from ihop_reddit_spark.plans.bow import BowConfig, bag_of_words

    comments = spark.createDataFrame(
        [
            # (id, parent, score, link, author, subreddit, body, ts)
            ("c1", "t3_s1", 1, "t3_s1", "alice", "aww", "nice", 100),
            ("c2", "t3_s1", 1, "t3_s1", "bob", "aww", "[removed]", 110),
            ("c3", "t3_s1", 1, "t3_s1", "[deleted]", "aww", "hey", 120),
            ("c4", "t3_s2", 1, "t3_s2", "alice", "u_page", "spam", 130),
            ("c5", "t3_s1", 1, "t3_s1", "carol", "aww", "late", 100 + 90000),
        ],
        "id string, parent_id string, score int, link_id string,"
        " author string, subreddit string, body string, created_utc long",
    )
    submissions = spark.createDataFrame(
        [
            ("alice", 50, "s1", 2, "body text", "title one", "u", "aww"),
            ("bob", 60, "s2", 2, "x", "title two", "u", "u_page"),
        ],
        "author string, created_utc long, id string, score int,"
        " selftext string, title string, url string, subreddit string",
    )
    cfg = BowConfig(
        top_n=5, exclude_user_fraction=0.0, max_time_delta=86400
    )
    rows = bag_of_words(comments, submissions, cfg).collect()
    # c1 joins s1 within the window; c2 [removed], c3 deleted author,
    # c4 user-page subreddit, c5 outside the time window
    assert [r["comments_id"] for r in rows] == ["c1"]
    assert rows[0]["time_to_comment_in_seconds"] == 50
    assert rows[0]["fullname_id"] == "t3_s1"


def test_thread_documents_assembly(spark):
    from ihop_reddit_spark.plans.bow import BowConfig, bag_of_words, thread_documents

    comments = spark.createDataFrame(
        [
            ("c2", "t3_s1", 1, "t3_s1", "bob", "aww", "second", 200),
            ("c1", "t3_s1", 1, "t3_s1", "alice", "aww", "first", 150),
        ],
        "id string, parent_id string, score int, link_id string,"
        " author string, subreddit string, body string, created_utc long",
    )
    submissions = spark.createDataFrame(
        [("sue", 100, "s1", 2, "self words", "title words", "u", "aww")],
        "author string, created_utc long, id string, score int,"
        " selftext string, title string, url string, subreddit string",
    )
    joined = bag_of_words(
        comments, submissions, BowConfig(top_n=5, exclude_user_fraction=0.0)
    )
    docs = thread_documents(joined).collect()
    assert len(docs) == 1
    assert docs[0]["document_text"] == "title words self words first second"
    assert docs[0]["subreddit"] == "aww"


def test_stratified_sample_fractions(spark):
    from ihop_reddit_spark.operators.setops import stratified_sample

    rows = [(("a" if i % 2 else "b"), i) for i in range(2000)]
    df = spark.createDataFrame(rows, "stratum string, v long").repartition(8)
    out = stratified_sample(df, "stratum", {"a": 0.5, "b": 0.1}, seed=7)
    counts = {r["stratum"]: r["n"] for r in
              out.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 350 < counts["a"] < 650      # ~500 of 1000
    assert 40 < counts["b"] < 180       # ~100 of 1000
    # same seed + partitioning → identical sample
    again = stratified_sample(df, "stratum", {"a": 0.5, "b": 0.1}, seed=7)
    assert sorted(r["v"] for r in out.collect()) == sorted(
        r["v"] for r in again.collect()
    )


def test_deterministic_sample_content_addressed(spark):
    import hashlib

    from ihop_reddit_spark.operators.setops import deterministic_sample

    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    out = deterministic_sample(df, ["k"], 0.25, salt="s")
    got = sorted(r.k for r in out.collect())
    want = sorted(
        i for i in range(2000)
        if hashlib.md5(f"s\x1e{i}".encode()).hexdigest()[:8] < "40000000"
    )
    assert got == want                     # selection is md5(content), exactly
    assert 350 < len(got) < 650            # ~500 of 2000
    # partitioning-independent (the whole point vs RNG sampling)
    repart = deterministic_sample(df.repartition(13), ["k"], 0.25, salt="s")
    assert sorted(r.k for r in repart.collect()) == got
    # different salt → a different (independent) draw
    other = deterministic_sample(df, ["k"], 0.25, salt="t")
    assert sorted(r.k for r in other.collect()) != got
    # edges
    assert deterministic_sample(df, ["k"], 0.0).count() == 0
    assert deterministic_sample(df, ["k"], 1.0).count() == 2000


@pytest.mark.slow
def test_salted_join_equals_plain_join(spark):
    from ihop_reddit_spark.operators.joins import salted_join

    # heavy skew: 90% of fact rows share one key; dim has extras (unmatched)
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(200)],
        "row_id long, k string",
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("k10", 2), ("k30", 3), ("absent", 9)], "k string, v int"
    )

    def rows(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = fact.join(dim, "k", how)
        salted = salted_join(fact, dim, "k", n_salts=7, how=how)
        assert salted.columns == [c for c in plain.columns]
        assert rows(salted, salted.columns) == rows(plain, plain.columns)


def test_salted_join_rejects_right_preserving_and_reserved(spark):
    import pytest as _pytest

    from ihop_reddit_spark.operators.joins import salted_join

    df = spark.createDataFrame([(1, "a")], "id long, k string")
    with _pytest.raises(ValueError, match="supports"):
        salted_join(df, df, "k", how="full_outer")
    bad = df.withColumnRenamed("id", "__salt")
    with _pytest.raises(ValueError, match="reserved"):
        salted_join(bad, df, "k")


def test_merge_upsert_semantics(spark):
    from ihop_reddit_spark.operators.setops import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, x double"
    )
    delta = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    out = {r["k"]: (r["v"], r["x"]) for r in merge_upsert(base, delta, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_snapshot_diff_classifies_changes(spark):
    from ihop_reddit_spark.operators.setops import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (5, 50.0)], "k long, x double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 21.0), (3, 3.0), (4, 40.0)], "k long, x double"
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"], ["x"]).collect()}
    # 1 unchanged (absent), 2 changed, 3 NULL->value counts as changed
    # (null-safe compare), 4 added, 5 removed
    assert got == {2: "changed", 3: "changed", 4: "added", 5: "removed"}


def test_interval_overlap_join_matches_theta_join(spark):
    """Bucket-banded overlap join ≡ the naive theta join, including
    multi-bucket intervals (no duplicate pairs) and touching endpoints."""
    from ihop_reddit_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 10), (2, 95, 205), (3, 300, 300), (4, 400, 410)],
        "lid long, w_start long, w_end long",
    )
    right = spark.createDataFrame(
        [(10, 5, 7), (11, 10, 20), (12, 100, 104), (13, 90, 300), (14, 301, 310)],
        "rid long, s_start long, s_end long",
    )
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, ("w_start", "w_end"), ("s_start", "s_end"),
            bucket_width=100,
        ).collect()
    }
    want = {
        (r.lid, r.rid)
        for r in left.join(
            right,
            (left.w_start <= right.s_end) & (right.s_start <= left.w_end),
        ).collect()
    }
    assert got == want
    assert (1, 11) in got   # touching endpoints (inclusive bounds)
    assert (3, 13) in got   # point interval inside a long interval
    assert (3, 14) not in got


@pytest.mark.slow
def test_scd2_apply_all_paths(spark):
    from ihop_reddit_spark.operators.setops import (
        SCD2_OPEN_END,
        scd2_apply,
        scd2_init,
    )

    snap = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)],
        ["k", "seg", "bal"],
    )
    hist = scd2_init(snap, ["k"], ["seg", "bal"], valid_from=0)
    delta = spark.createDataFrame(
        [
            (1, "A2", 10.0),   # changed → close + reopen
            (2, "B", 20.0),    # identical → no-op
            (9, "N", 0.0),     # new key → fresh open row
        ],
        ["k", "seg", "bal"],
    )
    out = scd2_apply(hist, delta, ["k"], ["seg", "bal"], eff=50)
    rows = {(r["k"], r["valid_from"]): r for r in out.collect()}
    assert len(rows) == 5  # 3 current + 1 closed + 1 insert
    closed = rows[(1, 0)]
    assert not closed["is_current"] and closed["valid_to"] == 50
    reopened = rows[(1, 50)]
    assert reopened["is_current"] and reopened["seg"] == "A2"
    assert reopened["valid_to"] == SCD2_OPEN_END
    assert rows[(2, 0)]["is_current"]  # no-op left untouched
    assert rows[(3, 0)]["is_current"]
    assert rows[(9, 50)]["seg"] == "N" and rows[(9, 50)]["is_current"]

    # second application: change key 1 again → two closed rows, as-of
    # lookup at any time returns exactly one row per live key
    delta2 = spark.createDataFrame([(1, "A3", 11.0)], ["k", "seg", "bal"])
    out2 = scd2_apply(out, delta2, ["k"], ["seg", "bal"], eff=80)
    k1 = sorted(
        [r for r in out2.collect() if r["k"] == 1],
        key=lambda r: r["valid_from"],
    )
    assert [(r["valid_from"], r["valid_to"]) for r in k1] == [
        (0, 50), (50, 80), (80, SCD2_OPEN_END),
    ]
    for t in (25, 60, 99):
        live = [r for r in k1 if r["valid_from"] <= t < r["valid_to"]]
        assert len(live) == 1


@pytest.mark.slow
def test_weighted_sample_per_group_properties(spark):
    from ihop_reddit_spark.operators.setops import weighted_sample_per_group

    rows = [(g, i, 1000 if i == 0 else 1) for g in ("x", "y")
            for i in range(8)]
    df = spark.createDataFrame(rows, ["grp", "id", "w"])
    # exact k per group, deterministic, partitioning-invariant
    a = weighted_sample_per_group(df, "grp", "w", "id", k=3, salt="s1")
    b = weighted_sample_per_group(
        df.repartition(7), "grp", "w", "id", k=3, salt="s1"
    )
    sa = sorted((r["grp"], r["id"]) for r in a.collect())
    sb = sorted((r["grp"], r["id"]) for r in b.collect())
    assert sa == sb and len(sa) == 6

    # weight-proportionality: the 1000-weight item (id 0) should win a
    # k=1 draw in nearly every independent (salted) replication
    wins = 0
    trials = 12
    for t in range(trials):
        out = weighted_sample_per_group(
            df.where(F.col("grp") == "x"), "grp", "w", "id",
            k=1, salt=f"t{t}",
        ).collect()
        wins += out[0]["id"] == 0
    assert wins >= trials - 2


def test_scd2_lookup_point_in_time(spark):
    from ihop_reddit_spark.operators.setops import (
        scd2_apply,
        scd2_init,
        scd2_lookup,
    )

    snap = spark.createDataFrame([(1, "A"), (2, "B")], ["k", "seg"])
    hist = scd2_init(snap, ["k"], ["seg"], valid_from=0)
    hist = scd2_apply(
        hist,
        spark.createDataFrame([(1, "A2")], ["k", "seg"]),
        ["k"], ["seg"], eff=100,
    )
    facts = spark.createDataFrame(
        [(10, 1, 50), (11, 1, 100), (12, 1, 150), (13, 2, 70)],
        ["fid", "k", "t"],
    )
    out = {
        r["fid"]: (r["seg"], r["valid_from"])
        for r in scd2_lookup(
            facts, hist, ["k"], F.col("t")
        ).collect()
    }
    # each fact matches exactly one version, at ITS OWN time
    assert out == {
        10: ("A", 0),       # before the change
        11: ("A2", 100),    # boundary: eff is inclusive on the new row
        12: ("A2", 100),
        13: ("B", 0),
    }


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from ihop_reddit_spark.operators.setops import weighted_sample_per_group

    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, -3), ("g", 3, 5), ("g", 4, 5)],
        ["grp", "id", "w"],
    )
    got = sorted(
        r["id"]
        for r in weighted_sample_per_group(
            df, "grp", "w", "id", k=3
        ).collect()
    )
    # weight<=0 means probability 0 — never sampled, even with k slack
    assert got == [3, 4]
