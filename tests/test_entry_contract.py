"""Driver-contract invariants: entry() runs, every oracle key has a query,
and result schemas are collect-stable."""

from __future__ import annotations

import __spark_entry__ as entry_mod


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
