"""Gate-stability probe: run the seeded trainer/recall gates under a
DELIBERATELY different session shape than the dev default (vanilla
builder, odd core count, odd shuffle parallelism) and assert every gate
boolean still holds.

Why: the external driver scores catalog queries with its OWN vanilla
SparkSession. A gate that silently depends on partitioning (input split
order into Word2Vec/KMeans, Arrow batch boundaries, hash partition
counts) would pass the dev environment and red the driver round. This
probe is the cheap pre-flight: deterministic-by-construction claims get
checked against an environment we did NOT tune for.

Usage: python tools/gate_stability_probe.py [sf_dir] [cores]
Prints one JSON line {"gates": {name: {"flags": {...}, "ok": bool}}}.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATES = [
    "c2v_planted_analogy_gate",
    "c2v_reference_analogy_gate",
    "sgns_reference_analogy_gate",
    "kmeans_elbow_gate",
    "incremental_ivf_recall",
    "ivf_ann_recall",
    "pq_ann_recall",
    "pca_invariants_gate",
    "lda_invariants_gate",
    "greedy_match_invariants_gate",
    "bpe_merge_invariants_gate",
    "bpe_roundtrip_gate",
    # round-5 additions: tokenizer + real-codec + quality gates
    "unigram_invariants_gate",
    "unigram_roundtrip_gate",
    "png_decode_gate",
    "gif_decode_gate",
    "jpeg_decode_gate",
    "media_decode_gate",
    "avi_decode_gate",
    # round-6 (session 3): the WordPiece trainer gates
    "wordpiece_invariants_gate",
    "wordpiece_roundtrip_gate",
    # split_leakage_audit and g711_decode_gate deliberately absent: they
    # emit exact COUNTS/SUMS (hash-gated by the oracle), not gate booleans
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cores = sys.argv[2] if len(sys.argv) > 2 else "7"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as m

    q = m.queries()
    out: dict[str, dict] = {}
    bad = 0
    for name in GATES:
        try:
            rows = [r.asDict() for r in q[name](spark, sf_dir).collect()]
            # aggregate EVERY row's boolean columns — a multi-row gate
            # can fail on any row, and a gate exposing no booleans must
            # not pass vacuously
            flags: dict[str, bool] = {}
            for r in rows:
                for k, v in r.items():
                    if isinstance(v, bool):
                        flags[k] = flags.get(k, True) and v
            ok = bool(flags) and all(flags.values())
            if not flags:
                flags = {"no_boolean_columns": False}
        except Exception as exc:  # noqa: BLE001 — report, keep probing
            flags, ok = {"error": str(exc)[:200]}, False
        bad += not ok
        out[name] = {"flags": flags, "ok": ok}
    print(json.dumps({"cores": cores, "n_failed": bad, "gates": out}))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
