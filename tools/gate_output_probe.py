"""Gate-output SF-invariance probe (VERDICT r13 item 3).

The ``_collect_rows`` guard bounds every gate-side driver collect at
2048 rows — but a gate can be GUARDED yet data-proportional, and then
the first notice is a bench failure at a bigger SF (the r13 WARC
round-trip: 500 rows at sf0.01, ~5,000 at sf0.1, AssertionError at the
close). This probe catches that class at authoring time:

* discovers every catalog query whose source consumes ``_collect_rows``
  (the same scan the ``test_gate_collects_are_bounded`` lint anchors),
* instruments the guard to record the LARGEST row count each query
  actually lands on the driver,
* runs each consumer at sf0.01 AND sf0.1 and compares: a gate whose
  driver transfer is support/k-bounded shows ratio ≈ 1 across the ×10
  data step; anything above ``--threshold`` (default 1.5) fails unless
  it is on the explicit ALLOWLIST (deliberately data-proportional,
  with a named reason).

Usage: python tools/gate_output_probe.py [--threshold=X] [--only=a,b]
Prints one JSON line {"queries": {name: {"rows_small", "rows_big",
"ratio", "flag"}}, "violations": [...]}; exit 1 on violations.
"""

from __future__ import annotations

import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMALL_SF = "/root/testdata/sf0.01"
BIG_SF = "/root/testdata/sf0.1"

#: gates allowed to land data-proportional row counts on the driver,
#: each with the reason the transfer is intentional. EMPTY by design
#: today: the r13/r14 fixes moved every data-proportional gate to the
#: distributed ``_detach_from_tempdir`` materialization.
ALLOWLIST: dict[str, str] = {}


def discover_consumers(qc) -> list[str]:
    names = []
    for name, fn in qc.QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        if "_collect_rows" in src:
            names.append(name)
    return sorted(names)


def main() -> None:
    threshold = 1.5
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--threshold="):
            threshold = float(a.split("=", 1)[1])
        elif a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))

    from ihop_reddit_spark.plans import query_catalog as qc
    from ihop_reddit_spark.session import get_spark_session

    spark = get_spark_session(
        "gate_output_probe", config={"spark.ui.enabled": "false"}
    )

    consumers = discover_consumers(qc)
    if only:
        consumers = [c for c in consumers if c in only]

    observed: dict[str, int] = {"max": 0}
    real_collect = qc._collect_rows

    def recording_collect(df, cap=qc._GATE_COLLECT_CAP, what=""):
        rows = real_collect(df, cap, what)
        observed["max"] = max(observed["max"], len(rows))
        return rows

    qc._collect_rows = recording_collect
    table: dict[str, dict] = {}
    violations: list[str] = []
    try:
        for name in consumers:
            per_sf: dict[str, int] = {}
            err = None
            for tag, sf_dir in (("small", SMALL_SF), ("big", BIG_SF)):
                observed["max"] = 0
                try:
                    qc.QUERIES[name](spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                except Exception as exc:  # noqa: BLE001 - isolate
                    err = f"{tag}: {type(exc).__name__}: {exc}"[:300]
                    break
                per_sf[tag] = observed["max"]
                spark.catalog.clearCache()
            if err is not None:
                table[name] = {"error": err}
                violations.append(name)
                continue
            small, big = per_sf["small"], per_sf["big"]
            ratio = round(big / small, 2) if small else None
            flag = (
                ratio is not None
                and ratio > threshold
                and name not in ALLOWLIST
            )
            table[name] = {
                "rows_small": small,
                "rows_big": big,
                "ratio": ratio,
                "flag": flag,
                **(
                    {"allowlisted": ALLOWLIST[name]}
                    if name in ALLOWLIST
                    else {}
                ),
            }
            if flag:
                violations.append(name)
    finally:
        qc._collect_rows = real_collect

    print(
        json.dumps(
            {
                "probe": "gate_output_sf_invariance",
                "threshold": threshold,
                "n_consumers": len(consumers),
                "violations": violations,
                "queries": table,
            }
        )
    )
    spark.stop()
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
