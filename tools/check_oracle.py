"""Local differential harness mimicking the driver's t2 gate:
run each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables; compare row count, column names, coarse column TYPE
CLASSES (the driver's value canon is dtype-sensitive: DuckDB ``SUM(BIGINT)``
returns HUGEINT where Spark returns LONG and the driver hashes them
differently — round-1 `doc_token_stats_by_lang` regression), and an
order-insensitive value hash. (The hash stringifies values — it does not
distinguish 5 from '5', and multi-byte separator collisions are possible in
pathological string data; the driver's own comparator is authoritative.)

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


_INT_CLASSES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def duck_type_class(t) -> str:
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "HUGEINT":
        return "hugeint"  # deliberately != "int": the driver canon differs
    if s in _INT_CLASSES:
        return "int"
    if s in ("DOUBLE", "FLOAT"):
        return "float"
    if s == "VARCHAR":
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s.startswith("TIMESTAMP"):
        return "ts"
    return s.lower()


def spark_type_class(dt: str) -> str:
    s = dt.lower()
    if s.startswith("decimal"):
        return "decimal"
    if s in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return "int"
    if s in ("double", "float"):
        return "float"
    if s == "string":
        return "str"
    if s == "boolean":
        return "bool"
    if s.startswith("timestamp"):
        return "ts"
    return s


def norm_value(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ihop_reddit_spark.session import get_spark_session

    spark = get_spark_session(
        "oracle_check", config={"spark.ui.enabled": "false"}, master="local[8]"
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"FAIL unknown query name(s): {sorted(unknown)}")
            print(f"     available: {sorted(qs)}")
            sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # drop per-query scoped persists so 50+ queries don't accumulate
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = {c: duck_type_class(t) for c, t in zip(dcols, rel.types)}
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            stypes = {c: spark_type_class(t) for c, t in sdf.dtypes}
            mismatched = {
                c: (stypes[c], dtypes[c])
                for c in scols
                if stypes[c] != dtypes[c]
            }
            if mismatched:
                problems.append(f"type-class mismatch {mismatched}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh = frame_hash(scols, [[r[c] for c in scols] for r in srows])
            dh = frame_hash(dcols, drows)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a few differing lines for debugging
                sset = {
                    tuple(norm_value(r[c]) for c in sorted(scols)) for r in srows
                }
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = {
                    tuple(norm_value(r[i]) for i in dorder) for r in drows
                }
                for x in list(sset - dset)[:3]:
                    print(f"    spark-only: {x}")
                for x in list(dset - sset)[:3]:
                    print(f"    duck-only:  {x}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
