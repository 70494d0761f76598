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
