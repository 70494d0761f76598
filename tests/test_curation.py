"""Closed-form tests for the training-data curation tier
(datapipe/curation.py): repetition signals, decontamination, splits,
mixture sampling, sequence packing.

The catalog queries built on these are DuckDB-oracle-gated at sf0.01
(plans/query_catalog.py); these tests pin hand-computable semantics on tiny
inputs plus the partitioning-invariance contracts.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ihop_reddit_spark.datapipe.curation import (
    assign_split,
    decontaminate,
    mixture_rates,
    mixture_sample,
    pack_sequences,
    repetition_features,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1: "a b a b a" — dup tokens 3/5, top 2-gram "a b" 2/4, 3-grams:
        # "a b a","b a b","a b a" → 1 dup of 3
        (1, "a b a b a", "s1"),
        # doc 2: all distinct tokens, no repeated grams
        (2, "p q r s t", "s1"),
        # doc 3: near-dup of doc 2 (shares 5-gram)
        (3, "p q r s t u", "s2"),
        (4, "x y z w v", "s2"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_repetition_features_closed_form(docs):
    out = {
        r["doc_id"]: r
        for r in repetition_features(docs, "text", "doc_id").collect()
    }
    d1 = out[1]
    assert d1["n_tokens"] == 5
    assert d1["dup_token_frac"] == pytest.approx(3 / 5)
    assert d1["top_2gram_frac"] == pytest.approx(2 / 4)
    assert d1["dup_3gram_frac"] == pytest.approx(1 / 3)
    d2 = out[2]
    assert d2["dup_token_frac"] == 0.0
    assert d2["top_2gram_frac"] == pytest.approx(1 / 4)
    assert d2["dup_3gram_frac"] == 0.0


def test_decontaminate_drops_ngram_overlap(spark, docs):
    bench = docs.where(F.col("doc_id") == 2)
    train = docs.where(F.col("doc_id") != 2)
    kept = decontaminate(train, bench, "text", "doc_id", n=5)
    # doc 3 shares the 5-gram "p q r s t" with the benchmark; 1 and 4 don't
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4]
    assert kept.columns == train.columns


def test_assign_split_is_content_addressed(spark, docs):
    bounds = [("train", "e6666666"), ("val", "f3333333"), ("test", None)]
    out = assign_split(docs, "doc_id", "split9", bounds)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    for doc_id, split in rows.items():
        h = hashlib.md5(f"split9\x1e{doc_id}".encode()).hexdigest()[:8]
        expect = "train" if h < "e6666666" else ("val" if h < "f3333333" else "test")
        assert split == expect, doc_id
    # partitioning-invariant: same assignment after a repartition
    re = assign_split(docs.repartition(7), "doc_id", "split9", bounds)
    assert {r["doc_id"]: r["split"] for r in re.collect()} == rows


@pytest.mark.slow
def test_component_split_assign_keeps_duplicates_together(spark):
    from ihop_reddit_spark.datapipe.curation import (
        component_split_assign,
        split_leakage_report,
    )

    bounds = [("train", "e6666666"), ("val", "f3333333"), ("test", None)]
    docs = spark.createDataFrame(
        [(i,) for i in range(40)], ["doc_id"]
    )
    # multi-hop component {0,1,2,3} via a chain, plus {10,11}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)],
        "left_id long, right_id long",
    )
    out = component_split_assign(docs, pairs, "doc_id", "s1", bounds)
    by_id = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(by_id) == 40  # corpus preserved, one row per doc
    assert len({by_id[i] for i in (0, 1, 2, 3)}) == 1  # whole chain
    assert by_id[10] == by_id[11]
    # representative = component min id → component split equals the
    # plain content-addressed split of that id
    expect = hashlib.md5(b"s1\x1e0").hexdigest()[:8]
    want = (
        "train" if expect < "e6666666"
        else ("val" if expect < "f3333333" else "test")
    )
    assert by_id[0] == want
    # singletons keep their own-id assignment (stable vs assign_split)
    solo = assign_split(docs, "doc_id", "s1", bounds)
    solo_map = {r["doc_id"]: r["split"] for r in solo.collect()}
    for i in range(40):
        if i not in (0, 1, 2, 3, 10, 11):
            assert by_id[i] == solo_map[i]

    # audit: dedup-aware assignment has zero cross-split pairs
    rep = split_leakage_report(out, pairs, "doc_id").collect()
    assert all(r["left_split"] == r["right_split"] for r in rep)
    assert sum(r["n_pairs"] for r in rep) == 4


def test_mixture_rates_sqrt_temperature(spark):
    rows = [(i, "big") for i in range(16)] + [(100 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    rates = {r["source"]: r for r in mixture_rates(df, "source").collect()}
    assert rates["small"]["rate"] == 1.0
    assert rates["big"]["rate"] == pytest.approx((4 / 16) ** 0.5)
    assert rates["big"]["threshold"] == "80000000"  # sqrt(.25)=.5 → 0x80000000

    sampled = mixture_sample(df, "source", "doc_id", "mix1")
    got = sampled.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    # the smallest source is kept whole (rate >= 1 arm)
    assert by_src["small"] == 4
    # the big source is thresholded: exactly the ids whose md5 draw < 0.5
    expect_big = sum(
        1
        for i in range(16)
        if hashlib.md5(f"mix1\x1e{i}".encode()).hexdigest()[:8] < "80000000"
    )
    assert by_src.get("big", 0) == expect_big
    assert sampled.columns == df.columns


def test_pack_sequences_bins(spark):
    # budget 10; source s: token counts 4,4,4 → offsets 0,4,8 → bins 0,0,0;
    # fourth doc offset 12 → bin 1
    rows = [
        (1, "a b c d", "s"),
        (2, "a b c d", "s"),
        (3, "a b c d", "s"),
        (4, "a b c d", "s"),
        (5, "a b", "t"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = pack_sequences(
        df, "source", "doc_id", F.size(F.split(F.col("text"), " ")), 10
    )
    bins = {r["doc_id"]: r["bin"] for r in out.collect()}
    assert bins == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0}


def test_top_ngram_fraction_matches_repetition_features(docs):
    from ihop_reddit_spark.datapipe.curation import top_ngram_fraction

    light = {
        r["doc_id"]: r["top_ngram_frac"]
        for r in top_ngram_fraction(docs, "text", "doc_id", n=2).collect()
    }
    full = {
        r["doc_id"]: r["top_2gram_frac"]
        for r in repetition_features(docs, "text", "doc_id").collect()
    }
    assert light == full


def test_key_skew_report_flags_planted_hot_key(spark):
    from ihop_reddit_spark.datapipe.quality import key_skew_report

    rows = [(i, "hot" if i % 2 == 0 else f"k{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "row_id long, k string")
    top = key_skew_report(df, ["k"], top_n=3).collect()
    assert top[0]["k"] == "hot" and top[0]["cnt"] == 50
    assert abs(top[0]["share"] - 0.5) < 1e-12
    # 51 distinct keys, uniform share would be 100/51 rows -> ratio 50*51/100
    assert abs(top[0]["skew_ratio"] - 50 * 51 / 100) < 1e-12


def test_heavy_hitters_gate_superset_guarantee(spark):
    from ihop_reddit_spark.datapipe.quality import heavy_hitters_gate

    rows = [("a",)] * 50 + [("b",)] * 30 + [(f"x{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "k string")
    out = heavy_hitters_gate(df, "k", support=0.25).first()
    assert out["n_true_heavy"] == 2  # a (50%) and b (30%)
    assert out["all_heavy_found"] is True


def test_chunk_documents_windows_and_counts(spark):
    from ihop_reddit_spark.datapipe.curation import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words), (2, "a b")], "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=1)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 1: 10 tokens, stride 3 -> starts 0,3,6,9
    assert {c for d, c in rows if d == 1} == {0, 1, 2, 3}
    assert rows[(1, 0)].chunk_text == "w0 w1 w2 w3"
    assert rows[(1, 1)].chunk_text == "w3 w4 w5 w6"   # overlap 1
    assert rows[(1, 3)].chunk_text == "w9"            # tail
    assert rows[(1, 3)].n_chunk_tokens == 1
    # short doc: exactly one chunk
    assert {c for d, c in rows if d == 2} == {0}
    assert rows[(2, 0)].chunk_text == "a b"
    # every token of doc 1 is covered at least once
    covered = " ".join(rows[(1, c)].chunk_text for c in range(4)).split()
    assert set(covered) == {f"w{i}" for i in range(10)}


def test_html_to_text_extraction(spark):
    from ihop_reddit_spark.functions.text import html_to_text, link_density

    cases = [
        # script/style/comment content never leaks into text
        ("<p>a</p><script>var hidden=1;</script><style>b{}</style>"
         "<!-- secret --><p>c</p>", "a\nc"),
        # block tags become newlines, inline tags become spaces
        ("<h1>Title</h1><p>one <b>two</b> three</p>", "Title\none two three"),
        # entity decoding incl. the double-escape resolving ONE level
        ("<p>x &amp; y &amp;lt;z&amp;gt; &quot;q&quot;&nbsp;!</p>",
         'x & y &lt;z&gt; "q" !'),
        # whitespace collapse + blank-line squeeze
        ("<div>  a  </div>\n\n<div>\t b\r\n</div>", "a\nb"),
        # tags spanning lines; attributes with '>i n' quotes are not
        # handled (documented regex-extractor limit shared by the oracle)
        ("<p\nclass='x'>multi</p>", "multi"),
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i])

    # link density: anchors' visible chars / all visible chars
    ld = spark.createDataFrame(
        [
            ("<p>abcd</p><a href='/'>wxyz</a>", 0.5),
            ("<a>every thing</a>", 1.0),
            ("<p>no links</p>", 0.0),
            ("<script>x</script>", 0.0),  # no visible text at all
        ],
        "h string, want double",
    )
    for r in ld.select(
        link_density(F.col("h")).alias("got"), "want"
    ).collect():
        assert r["got"] == r["want"]


def test_cdc_chunks_boundary_locality(spark):
    """The property fixed-window chunking lacks: editing ONE token only
    changes the chunks that touch the edit — every chunk after the next
    surviving boundary is byte-identical, so chunk-level dedup still
    matches the untouched tail."""
    import random

    from ihop_reddit_spark.datapipe.curation import cdc_chunks

    rng = random.Random(11)
    words = [f"w{rng.randint(0, 400)}" for _ in range(400)]
    original = " ".join(words)
    edited = " ".join(["EDIT"] + words[1:])  # change token 0 only
    df = spark.createDataFrame(
        [(0, original), (1, edited)], "doc_id long, text string"
    )
    rows = cdc_chunks(df, "text", "doc_id").collect()
    chunks = {0: {}, 1: {}}
    for r in rows:
        chunks[r["doc_id"]][r["chunk_id"]] = r["chunk_text"]
    a = [chunks[0][i] for i in sorted(chunks[0])]
    b = [chunks[1][i] for i in sorted(chunks[1])]
    # round-trip: concatenation reconstructs each doc exactly
    assert " ".join(a) == original and " ".join(b) == edited
    # multiple chunks actually formed (expected length 16 tokens)
    assert len(a) > 10
    # locality: identical chunk tails after the edit region
    tail = 0
    while tail < min(len(a), len(b)) and a[-1 - tail] == b[-1 - tail]:
        tail += 1
    assert tail >= len(a) - 3, (len(a), len(b), tail)
    # determinism across partitionings
    re = cdc_chunks(
        df.repartition(5), "text", "doc_id"
    ).collect()
    assert sorted(map(tuple, re)) == sorted(map(tuple, rows))


def test_curriculum_stages_equal_mass_and_tie_rule(spark):
    from ihop_reddit_spark.datapipe.curation import curriculum_stages

    # 40 docs, scores 0..39 → exact quartiles at buckets 9/19/29
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "doc_id long, s double"
    )
    out = {
        r["doc_id"]: r["stage"]
        for r in curriculum_stages(
            df, F.col("s"), "doc_id", n_stages=4, quantize=1
        ).collect()
    }
    for i in range(40):
        assert out[i] == min(i // 10, 3), (i, out[i])
    # tie rule: a score AT a boundary falls in the LOWER stage
    assert out[9] == 0 and out[10] == 1

    # degenerate mass: everyone identical → all stage 0 (all cuts equal,
    # nothing strictly below)
    same = spark.createDataFrame(
        [(i, 5.0) for i in range(10)], "doc_id long, s double"
    )
    stages = {
        r["stage"]
        for r in curriculum_stages(
            same, F.col("s"), "doc_id", n_stages=4, quantize=1
        ).collect()
    }
    assert stages == {0}


def test_domain_quota_salted_matches_window_path(spark):
    """The skew-safe two-phase top-k must keep EXACTLY the same urls as
    the window path, including under a planted mega-domain."""
    from ihop_reddit_spark.datapipe.curation import domain_quota_sample

    rows = []
    for i in range(300):  # hot domain: 300 pages
        rows.append((f"http://hot.example.com/p{i:04d}",))
    for d in range(10):
        for i in range(7):
            rows.append((f"http://site{d}.org/p{i}",))
    df = spark.createDataFrame(rows, "url string")
    plain = sorted(
        r["url"] for r in domain_quota_sample(df, "url", 5).collect()
    )
    salted = sorted(
        r["url"]
        for r in domain_quota_sample(
            df, "url", 5, salted=True, n_salts=4
        ).collect()
    )
    assert salted == plain
    assert len(plain) == 5 + 10 * 5  # hot capped at 5, small kept ≤ 5

    # plan shape: no per-key window sort in the salted path
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        domain_quota_sample(df, "url", 5, salted=True).explain("formatted")
    assert "RunningWindowFunction" not in buf.getvalue()
    assert "row_number" not in buf.getvalue()


def test_normalize_url_edge_cases(spark):
    from ihop_reddit_spark.functions.urls import (
        normalize_url,
        url_domain_key,
        url_host,
    )

    cases = [
        # case + default port + fragment + trailing slash + param sort
        ("HTTP://Example.COM:80/A/b/?z=1&a=2#x",
         "http://example.com/A/b?a=2&z=1"),
        # https default port; path case preserved, host lowered
        ("https://WWW.Site.org:443/Path", "https://www.site.org/Path"),
        # non-default port kept
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # empty path → /; tracking params dropped; empty query dropped
        ("http://example.com?utm_source=a&fbclid=b", "http://example.com/"),
        # root slash preserved (only non-root trailing slash drops)
        ("http://example.com/", "http://example.com/"),
        # mixed params: tracking removed, rest sorted bytewise
        ("http://e.com/p?b=2&utm_campaign=x&a=10&A=1",
         "http://e.com/p?A=1&a=10&b=2"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, u string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", normalize_url(F.col("u")).alias("n")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)

    hosts = df.select(
        url_host(F.col("u")).alias("h"),
        url_domain_key(F.col("u")).alias("d"),
    ).collect()
    assert hosts[1]["h"] == "www.site.org"
    assert hosts[1]["d"] == "site.org"


def test_normalize_url_exact_mixed_encodings(spark):
    """The urllib-exact twin: identical to the JVM version on ASCII
    escape-free URLs (the equivalence contract), and correct on the
    mixed-encoding aliases only a real parser can fold — IDN hosts to
    punycode, unreserved percent-escapes decoded, other escape hex
    uppercased."""
    from ihop_reddit_spark.functions.urls import (
        _normalize_url_py,
        normalize_url,
        normalize_url_exact,
    )

    # equivalence on the ASCII escape-free subset (the JVM twin's scope)
    ascii_urls = [
        "HTTP://Example.COM:80/A/b/?z=1&a=2#x",
        "https://WWW.Site.org:443/Path",
        "http://example.com:8080/x",
        "http://example.com?utm_source=a&fbclid=b",
        "http://example.com/",
        "http://e.com/p?b=2&utm_campaign=x&a=10&A=1",
        "https://deep.sub.example.co.uk/a/b/c?k=v&k2=v2",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(ascii_urls)], "i long, u string"
    )
    both = df.select(
        "i",
        normalize_url(F.col("u")).alias("jvm"),
        normalize_url_exact(F.col("u")).alias("exact"),
    ).collect()
    for r in both:
        assert r["jvm"] == r["exact"], (r["i"], r["jvm"], r["exact"])

    # mixed-encoding fixtures (pure-Python kernel — same code the UDF maps)
    assert (
        _normalize_url_py("http://MÜNCHEN.de/straße")
        == "http://xn--mnchen-3ya.de/stra%C3%9Fe"
        or _normalize_url_py("http://MÜNCHEN.de/straße").startswith(
            "http://xn--mnchen-3ya.de/"
        )
    )
    # unreserved escapes decode; reserved/other escape hex uppercases
    assert (
        _normalize_url_py("http://e.com/%7Euser/%7e2?x=%2fa%2Fb")
        == "http://e.com/~user/~2?x=%2Fa%2Fb"
    )
    # IDN and its punycode spelling fold to ONE canonical key
    a = _normalize_url_py("http://münchen.de/p")
    b = _normalize_url_py("http://xn--mnchen-3ya.de/p")
    assert a == b == "http://xn--mnchen-3ya.de/p"
    # tracking params + sort still apply after percent-normalization
    assert (
        _normalize_url_py("http://e.com/p?b=%41&utm_source=x&a=1")
        == "http://e.com/p?a=1&b=A"
    )
    # garbage passes through, never raises
    assert _normalize_url_py("not a url") == "not a url"
    assert _normalize_url_py(None) is None


@pytest.mark.slow
def test_crawl_corpus_exact_urls_same_on_ascii(spark):
    """crawl_corpus(exact_urls=True) — the urllib frontier — produces the
    same staged chunks as the JVM path on ASCII escape-free pages, and
    folds percent-encoded aliases the JVM path cannot."""
    from ihop_reddit_spark.plans.crawl_corpus import crawl_corpus

    body = " ".join(f"w{i} sentence body text here." for i in range(12))
    html = f"<html><body><p>{body}</p></body></html>"
    pages = spark.createDataFrame(
        [
            (1, html, "http://A.com/page"),
            (2, html + "<p>unique two alpha beta gamma delta too.</p>",
             "http://a.com/Page"),
            # percent-alias of doc 1's URL: only the exact path folds it
            (3, html, "http://a.com/%70age"),
        ],
        "doc_id long, html string, url string",
    )
    kw = dict(domain_quota=10, min_words_per_line=1, min_lines=1)
    jvm = crawl_corpus(pages, **kw)
    exact = crawl_corpus(pages, exact_urls=True, **kw)
    jvm_ids = {r["doc_id"] for r in jvm.select("doc_id").distinct().collect()}
    ex_ids = {r["doc_id"] for r in exact.select("doc_id").distinct().collect()}
    # JVM path: %70age ≠ page → doc 3 survives as its own URL
    assert 3 in jvm_ids
    # exact path: %70 decodes to 'p' → doc 3 is a frontier dup of doc 1
    assert 3 not in ex_ids
    assert 1 in ex_ids and 2 in ex_ids


def test_scrub_pii_redacts_and_counts(spark):
    from pyspark.sql import functions as F

    from ihop_reddit_spark.functions.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [("mail me at a.b-c@test.org or call +1 (222) 333-4455 from 10.0.0.1",)],
        "t string",
    )
    counts = pii_counts(F.col("t"))
    row = df.select(
        scrub_pii(F.col("t")).alias("s"),
        counts["email"].alias("e"),
        counts["phone"].alias("p"),
        counts["ipv4"].alias("i"),
    ).first()
    assert "[PII-EMAIL]" in row.s and "[PII-PHONE]" in row.s and "[PII-IPV4]" in row.s
    assert "a.b-c@test.org" not in row.s and "333-4455" not in row.s
    assert (row.e, row.p, row.i) == (1, 1, 1)


def test_table_fingerprint_order_invariant_and_sensitive(spark):
    from pyspark.sql import functions as F

    from ihop_reddit_spark.datapipe.quality import table_fingerprint

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, v string"
    )
    base = table_fingerprint(df).first()
    shuffled = table_fingerprint(df.repartition(7).orderBy(F.rand(42))).first()
    assert (base.n_rows, base.xor_hash, base.sum_hash) == (
        shuffled.n_rows, shuffled.xor_hash, shuffled.sum_hash,
    )
    changed = table_fingerprint(
        df.withColumn("v", F.when(F.col("k") == 1, "z").otherwise(F.col("v")))
    ).first()
    assert (changed.xor_hash, changed.sum_hash) != (base.xor_hash, base.sum_hash)
    assert changed.n_rows == base.n_rows


def test_profile_table_all_types_one_pass(spark):
    from ihop_reddit_spark.datapipe.quality import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (None, "b", None)],
        "k long, s string, v double",
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["k"].n_nulls == 1 and got["k"].n_distinct == 2
    assert got["k"].min_value == "1" and got["k"].max_value == "2"
    assert got["s"].n_nulls == 1 and got["s"].min_value == "a"
    assert got["v"].n_nulls == 1 and got["v"].max_value == "2.5"


# ---------------------------------------------------------------------------
# DSIR importance resampling (dsir_weights)
# ---------------------------------------------------------------------------
def test_dsir_ranks_target_like_docs_above_off_target(spark):
    from ihop_reddit_spark.datapipe.curation import dsir_weights

    target = spark.createDataFrame(
        [
            (100, "cats purr and cats nap on warm windowsills"),
            (101, "a cat chases yarn while cats watch birds"),
        ],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "cats purr and nap while a cat chases yarn"),   # target-like
            (2, "stock markets rallied as bond yields fell"),   # off-target
            (3, "cats watch birds from warm windowsills"),      # target-like
            (4, "the committee approved the quarterly budget"), # off-target
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in dsir_weights(corpus, target).collect()}
    # the contract is the RANKING: target-like docs outweigh off-target
    # ones (absolute sign is smoothing-dominated at toy scale — add-one
    # over 1024 buckets vs ~30 observed features pulls all weights down)
    assert got[1]["weight"] > got[2]["weight"]
    assert got[3]["weight"] > got[4]["weight"]
    assert min(got[1]["weight"], got[3]["weight"]) > max(
        got[2]["weight"], got[4]["weight"]
    )
    assert all(r["n_features"] > 0 for r in got.values())
    assert all(r["selected"] == (r["weight"] > 0) for r in got.values())


def test_dsir_weight_is_zero_when_target_equals_corpus(spark):
    from ihop_reddit_spark.datapipe.curation import dsir_weights

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        ["doc_id", "text"],
    )
    # p̂ == q̂ bucket-for-bucket → every log-ratio is exactly 0
    got = dsir_weights(docs, docs).collect()
    assert {r["weight"] for r in got} == {0.0}
    assert not any(r["selected"] for r in got)


@pytest.mark.slow
def test_dsir_resample_deterministic_and_weight_biased(spark):
    from ihop_reddit_spark.datapipe.curation import dsir_resample

    target = spark.createDataFrame(
        [(100, "alpha beta gamma delta alpha beta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma delta" if i % 2 == 0 else "omega psi chi phi")
         for i in range(40)],
        ["doc_id", "text"],
    )
    a = dsir_resample(corpus, target, k=10).collect()
    b = dsir_resample(corpus, target, k=10).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]  # pure function
    assert len(a) == 10
    c = dsir_resample(corpus, target, k=10, salt="other").collect()
    assert {r["doc_id"] for r in c} != {r["doc_id"] for r in a}  # salt moves it
    # target-like docs (even ids) dominate a weight-proportional draw
    evens = sum(1 for r in a if r["doc_id"] % 2 == 0)
    assert evens >= 8


def test_materialize_packed_sequences_order_and_budget(spark):
    from ihop_reddit_spark.datapipe.curation import (
        materialize_packed_sequences,
    )

    rows = [
        (1, "a b c d", "s"),
        (2, "e f g h", "s"),
        (3, "i j k l", "s"),
        (4, "m n o p", "s"),
        (5, "q r", "t"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        (r["source"], r["bin"]): r
        for r in materialize_packed_sequences(
            df, "source", "doc_id",
            F.size(F.split(F.col("text"), " ")), 10, "text",
        ).collect()
    }
    # budget 10: docs 1-3 fill bin 0 (offsets 0,4,8), doc 4 starts bin 1
    assert out[("s", 0)]["seq_text"] == "a b c d e f g h i j k l"
    assert out[("s", 0)]["n_docs"] == 3 and out[("s", 0)]["sum_tokens"] == 12
    assert out[("s", 1)]["seq_text"] == "m n o p"
    assert out[("t", 0)]["seq_text"] == "q r"
    # concat order is doc order regardless of input partitioning
    re = {
        (r["source"], r["bin"]): r["seq_text"]
        for r in materialize_packed_sequences(
            df.repartition(7), "source", "doc_id",
            F.size(F.split(F.col("text"), " ")), 10, "text",
        ).collect()
    }
    assert re[("s", 0)] == "a b c d e f g h i j k l"


def test_mixture_upsample_epochs_and_budget(spark):
    from ihop_reddit_spark.datapipe.curation import (
        mixture_upsample,
        mixture_upsample_rates,
    )

    rows = [(i, "big") for i in range(16)] + [(100 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    rates = {r["source"]: r for r in mixture_upsample_rates(df, "source").collect()}
    # shares ∝ √n scaled to total 20: big 4/6·20/16 = 5/6, small 2/6·20/4 = 5/3
    assert rates["big"]["rate"] == pytest.approx(5 / 6)
    assert rates["big"]["n_full"] == 0
    assert rates["small"]["rate"] == pytest.approx(5 / 3)
    assert rates["small"]["n_full"] == 1

    up = mixture_upsample(df, "source", "doc_id", "mix2").collect()
    by_doc = {}
    for r in up:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # every small-source doc appears at least once (whole epoch 0); its
    # fractional copy, when present, is epoch 1
    for i in range(4):
        epochs = sorted(by_doc[100 + i])
        assert epochs[0] == 0 and epochs in ([0], [0, 1])
    # big-source docs appear 0 or 1 times, epoch always 0
    for i in range(16):
        assert by_doc.get(i, [0]) in ([0], [0])
    # deterministic
    again = mixture_upsample(df, "source", "doc_id", "mix2").collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in up) == sorted(
        (r["doc_id"], r["epoch"]) for r in again
    )


def test_contamination_report_counts_shared_ngrams(spark, docs):
    from ihop_reddit_spark.datapipe.curation import contamination_report

    bench = docs.where(F.col("doc_id") == 2)   # "p q r s t"
    train = docs.where(F.col("doc_id") != 2)
    rep = {
        (r["train_id"], r["bench_id"]): r["n_shared_ngrams"]
        for r in contamination_report(
            train, bench, "text", "doc_id", n=5
        ).collect()
    }
    # doc 3 ("p q r s t u") shares exactly the one 5-gram "p q r s t"
    assert rep == {(3, 2): 1}


@pytest.mark.slow
def test_fuzzy_decontaminate_drops_near_dups_only(spark):
    from ihop_reddit_spark.datapipe.curation import fuzzy_decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # near-identical to the benchmark (one word changed) → drop
            (1, "the quick brown fox jumps over the sleepy dog"),
            # shares one 3-gram only — below 0.5 jaccard → keep
            (2, "notes on the quick brown squirrel and other tales"),
            (3, "completely unrelated text about spark plans"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in fuzzy_decontaminate(
            train, bench, "text", "doc_id", n=3, jaccard_threshold=0.5
        ).collect()
    )
    assert got == [2, 3]


@pytest.mark.slow
def test_fuzzy_decontaminate_string_ids(spark):
    """Review r4: ids of any type must work — a silent cast-to-null
    would keep contaminated docs with no error."""
    from ihop_reddit_spark.datapipe.curation import fuzzy_decontaminate

    bench = spark.createDataFrame(
        [("b-1", "the quick brown fox jumps over the lazy dog")],
        "doc_id string, text string",
    )
    train = spark.createDataFrame(
        [
            ("t-1", "the quick brown fox jumps over the sleepy dog"),
            ("t-2", "completely unrelated text about spark plans"),
        ],
        "doc_id string, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in fuzzy_decontaminate(
            train, bench, "text", "doc_id", n=3, jaccard_threshold=0.5
        ).collect()
    )
    assert got == ["t-2"]


# ---------------------------------------------------------------------------
# Composed crawl-extraction flagship (plans/crawl_corpus.py — round 6)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_crawl_corpus_composition_end_to_end(spark):
    """Pages with planted junk/variants flow the whole pipeline: the
    link-farm page is gated, URL variants collapse to the min-id row,
    the domain quota caps per-domain pages, lorem-ipsum pages die at the
    C4 page rule, and chunks reassemble to the cleaned text with stages
    in range."""
    from pyspark.sql import functions as F

    from ihop_reddit_spark.caching import release_scoped_persists
    from ihop_reddit_spark.plans.crawl_corpus import crawl_corpus

    body = "<p>alpha beta gamma delta.</p><p>epsilon zeta eta theta.</p>" \
           "<p>iota kappa lambda mu.</p>"
    nav = '<div><a href="/n">x</a></div>'
    linkfarm = "".join(
        f'<a href="/l{j}">link text number {j} here</a>' for j in range(30)
    )
    rows = [
        # docs 0,1: same canonical URL (tracking params / case+port) —
        # min-id row 0 survives the frontier dedup
        (0, f"<html><body>{body}{nav}</body></html>",
         "http://www.siteA.com/p?b=2&a=1"),
        (1, f"<html><body>{body}{nav}</body></html>",
         "HTTP://WWW.SITEA.COM:80/p/?a=1&b=2#f"),
        # doc 2: link farm — gated by link density
        (2, f"<html><body>{linkfarm}<p>tiny real text here.</p></body></html>",
         "http://www.siteB.com/q"),
        # doc 3: lorem ipsum — dies at the C4 page rule
        (3, f"<html><body>{body}<p>filler lorem ipsum junk.</p></body></html>",
         "http://www.siteC.com/r"),
        # docs 4..9: six distinct pages on ONE domain — quota 3 binds
        *[
            (4 + j,
             f"<html><body><p>unique page {j} words one two.</p>"
             f"<p>second line {j} four five six.</p>"
             f"<p>third line {j} seven eight nine.</p></body></html>",
             f"http://www.siteD.com/page{j}")
            for j in range(6)
        ],
    ]
    pages = spark.createDataFrame(rows, "doc_id long, html string, url string")
    out = crawl_corpus(pages, max_link_density=0.3, domain_quota=3)
    got = out.collect()
    release_scoped_persists(out)
    ids = {r["doc_id"] for r in got}
    assert 0 in ids and 1 not in ids          # URL dedup keeps min id
    assert 2 not in ids                        # link-density gate
    assert 3 not in ids                        # C4 lorem-ipsum page rule
    assert len(ids & set(range(4, 10))) == 3   # domain quota binds
    assert all(0 <= r["stage"] <= 3 for r in got)
    # chunks reassemble per doc to the C4-cleaned text
    doc0 = [r for r in got if r["doc_id"] == 0]
    joined = " ".join(
        r["chunk_text"] for r in sorted(doc0, key=lambda r: r["chunk_id"])
    )
    assert joined == ("alpha beta gamma delta.\nepsilon zeta eta theta.\n"
                      "iota kappa lambda mu.")
    assert all(r["n_chunk_tokens"] == len(r["chunk_text"].split(" "))
               for r in got)


def test_crawl_corpus_plan_is_jvm_only(spark, sf_dir):
    """The flagship plan crosses into Python nowhere — every stage is
    Catalyst expressions + windows + aggregates."""
    from ihop_reddit_spark.caching import release_scoped_persists
    from ihop_reddit_spark.plans.query_catalog import QUERIES

    spark.catalog.clearCache()
    df = QUERIES["crawl_corpus"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    release_scoped_persists(df)
    assert "Python" not in plan


@pytest.mark.slow
def test_decontaminate_bloom_equals_exact(spark, docs):
    """The Bloom prefilter must give IDENTICAL drops to the exact path —
    including under a deliberately tiny bitmap (high false-positive
    rate), where the exact-verify join has real work to undo."""
    from ihop_reddit_spark.datapipe.curation import decontaminate_bloom

    bench = docs.where(F.col("doc_id") == 2)
    train = docs.where(F.col("doc_id") != 2)
    exact = sorted(
        r["doc_id"]
        for r in decontaminate(train, bench, "text", "doc_id", n=5).collect()
    )
    assert exact == [1, 4]
    for n_bits in (1 << 23, 64):  # 64 bits → nearly-saturated bitmap
        kept = decontaminate_bloom(
            train, bench, "text", "doc_id", n=5, n_bits=n_bits
        )
        assert sorted(r["doc_id"] for r in kept.collect()) == exact
        assert kept.columns == train.columns

    # empty benchmark → nothing dropped
    kept = decontaminate_bloom(
        train, bench.where(F.lit(False)), "text", "doc_id", n=5
    )
    assert kept.count() == train.count()

    # the driver-side position guard trips loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_positions"):
        decontaminate_bloom(
            train, bench, "text", "doc_id", n=5, max_positions=1
        )


def test_semantic_decontaminate_drops_cosine_close_only(spark):
    from ihop_reddit_spark.datapipe.curation import semantic_decontaminate

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], ["vec_id", "embedding"]
    )
    train = spark.createDataFrame(
        [
            (1, [0.99, 0.01, 0.0]),   # near-parallel to the benchmark
            (2, [0.0, 1.0, 0.0]),     # orthogonal — survives
            (3, [-1.0, 0.0, 0.0]),    # anti-parallel — survives
            (4, [0.8, 0.6, 0.0]),     # cosine 0.8 — dropped at t=0.95? no
        ],
        ["vec_id", "embedding"],
    )
    kept = semantic_decontaminate(
        train, bench, "embedding", "vec_id", cosine_threshold=0.95
    )
    assert sorted(r["vec_id"] for r in kept.collect()) == [2, 3, 4]
    kept_low = semantic_decontaminate(
        train, bench, "embedding", "vec_id", cosine_threshold=0.5
    )
    assert sorted(r["vec_id"] for r in kept_low.collect()) == [2, 3]
    # empty benchmark drops nothing; schema unchanged
    none = semantic_decontaminate(
        train, bench.where(F.lit(False)), "embedding", "vec_id"
    )
    assert none.count() == 4 and none.columns == train.columns
