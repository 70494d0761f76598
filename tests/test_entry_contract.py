"""Driver-contract invariants: entry() runs, every oracle key has a query,
and result schemas are collect-stable."""

from __future__ import annotations

import __spark_entry__ as entry_mod
import pytest


def test_oracles_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["user_id", "context_concat", "context_length"]
    assert all(r.context_length >= 2 for r in rows)


@pytest.mark.slow
def test_every_catalog_query_runs_at_smallest_sf(spark):
    """Every queries() entry must execute and return a stable schema at
    sf0.001 — the same sweep the driver's t1 smoke performs, in CI."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    failures = []
    for name, fn in sorted(entry_mod.queries().items()):
        try:
            df = fn(spark, sf_dir)
            assert df.columns  # schema resolvable
            df.limit(5).collect()
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)


def test_scoring_order_integrity():
    """The scoring rotation must never silently drop or duplicate a query:
    every priority/demoted name exists, the reordered dicts hold exactly
    the registered key set, and oracle keys are a subset of queries."""
    from ihop_reddit_spark.plans import query_catalog as qc

    assert len(set(qc._SCORING_PRIORITY)) == len(qc._SCORING_PRIORITY)
    assert set(qc._SCORING_PRIORITY) <= set(qc.QUERIES)
    assert set(qc._SCORING_DEMOTED) <= set(qc.QUERIES)
    assert set(qc.ORACLE_SQL) <= set(qc.QUERIES)
    order = list(qc.QUERIES)
    # priority block leads, demoted block trails
    assert order[: len(qc._SCORING_PRIORITY)] == [
        n for n in qc._SCORING_PRIORITY if n in qc.QUERIES
    ]
    assert order[-len(qc._SCORING_DEMOTED):] == qc._SCORING_DEMOTED


def test_no_query_ships_unsampled():
    """Evidence policy: every catalog query must be (a) inside the
    driver's ~50-name scoring window, (b) already driver-scored in a
    committed CORRECTNESS_r*.json, or (c) explicitly demoted with a
    scored equivalence twin. A new query that lands outside the window
    with no evidence fails here — the r6–r8 stale-window regression
    (two queries shipped three rounds without driver evidence) cannot
    recur silently."""
    import glob
    import json
    import os

    from ihop_reddit_spark.plans import query_catalog as qc

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scored: set[str] = set()
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        scored |= set(json.load(open(p)))
    # the driver samples the first ~50 names in dict order
    window = set(list(qc.QUERIES)[:50])
    #: demoted names must name a scored twin here — the policy record
    twins = {
        "user_event_contexts_salted": "user_event_contexts",
        "user_event_contexts_capped": "user_event_contexts",
    }
    orphans = [
        n
        for n in qc.QUERIES
        if n not in window and n not in scored and n not in twins
    ]
    assert not orphans, (
        "queries with no driver evidence and outside the scoring window: "
        f"{orphans} — add them to the head of _SCORING_PRIORITY"
    )
    assert set(qc._SCORING_DEMOTED) <= set(twins)
    for demoted, twin in twins.items():
        assert twin in scored, f"{demoted}'s twin {twin} was never scored"


def test_gate_collects_are_bounded():
    """VERDICT r12 item 6: every driver-side collect in the query
    catalog is either the guarded helper itself, a provably-1-row
    scalar aggregate (``.collect()[0]``), or routed through
    _collect_rows — no gate collect is unbounded."""
    import inspect

    from ihop_reddit_spark.plans import query_catalog as qc

    src = inspect.getsource(qc).splitlines()
    bad = []
    for i, line in enumerate(src, 1):
        if ".collect()" not in line:
            continue
        if "_collect_rows(" in line:
            continue  # routed through the guard
        if ".collect()[0]" in line or (
            i < len(src) and ").collect()[0]" in src[i]
        ):
            continue  # scalar aggregate: exactly one row by shape
        if "limit(cap + 1)" in line:
            continue  # the guard's own transfer, capped by limit
        bad.append((i, line.strip()))
    assert not bad, f"unguarded gate collects: {bad}"


def test_data_proportional_gates_materialize_distributed(spark):
    """VERDICT r13 item 1: gates whose output is data-PROPORTIONAL
    (one row per crawl page / per near-dup pair) must materialize via
    ``_detach_from_tempdir`` (executor-side localCheckpoint), never a
    driver collect — the r13 close bench failed at sf0.1 exactly
    because the WARC round-trip collected one row per document."""
    import inspect

    from ihop_reddit_spark.plans import query_catalog as qc

    for fn in (qc._warc_roundtrip_pages_impl,):
        src = inspect.getsource(fn)
        assert "_detach_from_tempdir" in src
        assert "_collect_rows" not in src and ".collect()" not in src
    src = inspect.getsource(qc.manifest_incremental_dedup_pairs)
    assert "_detach_from_tempdir" in src

    # the checkpointed frame must survive its tempdir's deletion: run
    # the real gate (it deletes the WARC dir before returning) and
    # consume the result afterwards
    out = qc.QUERIES["warc_roundtrip_pages"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    assert out.columns == [
        "doc_id",
        "http_status",
        "content_type",
        "clean_text",
    ]
