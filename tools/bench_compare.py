"""Bench drift comparator: flag per-query regressions across rounds.

Reads every ``BENCH_r*.json`` in the repo root (plus an optional candidate
JSON file argument — e.g. a fresh ``bench.py`` line before the driver
records it) and reports, for each query:

* its timing per round,
* the drift of the LATEST reading vs the query's own cross-round MINIMUM
  (the per-query anchor — robust to one busy-box round, unlike
  latest-vs-previous),
* a flag when latest > ``--threshold``× its anchor (default 1.5, the bar
  past rounds' verdicts applied).

Also prints the ``shared_with_r01`` subtotal series when present — the
round-over-round comparable signal.

Usage: python tools/bench_compare.py [candidate.json] [--threshold X]
Exit code 1 when any flag fires (usable as a close-time gate; pair a
flagged query with a best-of-3 quiet-box rerun before concluding
regression — the r3→r4 ``curated_training_corpus`` scare was box noise).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds(candidate: str | None) -> dict[str, dict]:
    rounds: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        try:
            d = json.load(open(f))
        except Exception:
            continue
        # driver records either the bare bench line or a wrapper with the
        # JSON line embedded in "tail"
        if "queries" not in d and "tail" in d:
            mm = re.search(r'\{"metric".*\}', d["tail"])
            if not mm:
                continue
            d = json.loads(mm.group(0))
        if "queries" in d:
            rounds[f"r{int(m.group(1))}"] = d
    if candidate:
        d = json.load(open(candidate))
        rounds["cand"] = d
    return rounds


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1])
    rounds = load_rounds(args[0] if args else None)
    if len(rounds) < 2:
        print(json.dumps({"error": "need at least two bench rounds"}))
        sys.exit(2)
    names = list(rounds)
    latest = names[-1]
    # box-speed sentinel renormalization (VERDICT r12 item 2):
    # normalization is applied ONLY when the LATEST round carries the
    # pinned single-thread kernel's timing — then every sentinel-
    # carrying round's times rescale to the fastest box observed
    # (t * s_ref/s_n) and flags fire on ratio_norm, so a slow-box round
    # compares on code, not on contention. When the latest round has no
    # sentinel (pre-r13 candidate), EVERYTHING stays raw — rescaling
    # only the priors would tighten the gate against the raw candidate.
    # Raw series/anchor_min/ratio are always emitted under their
    # original names so any entry is auditable from its own output.
    sent = {
        n: (d.get("sentinel") or {}).get("min") for n, d in rounds.items()
    }
    have = {n: s for n, s in sent.items() if s}
    normalize = bool(sent.get(latest)) and len(have) > 1
    s_ref = min(have.values()) if have else None

    def norm(n: str, v: float) -> float:
        if normalize and sent.get(n):
            return v * (s_ref / sent[n])
        return v

    queries = sorted(
        {q for d in rounds.values() for q in d.get("queries", {})}
    )
    flags = []
    table = {}
    for q in queries:
        series = {
            n: rounds[n]["queries"][q]
            for n in names
            if q in rounds[n].get("queries", {})
        }
        if q not in rounds[latest].get("queries", {}):
            continue
        prior_raw = [v for n, v in series.items() if n != latest]
        anchor = min(prior_raw) if prior_raw else series[latest]
        ratio = (
            round(series[latest] / anchor, 2) if anchor > 0 else None
        )
        entry = {"series": series, "anchor_min": anchor, "ratio": ratio}
        gate_ratio = ratio
        if normalize:
            nseries = {
                n: round(norm(n, v), 3) for n, v in series.items()
            }
            np = [v for n, v in nseries.items() if n != latest]
            na = min(np) if np else nseries[latest]
            nr = round(nseries[latest] / na, 2) if na > 0 else None
            entry["series_norm"] = nseries
            entry["anchor_min_norm"] = na
            entry["ratio_norm"] = nr
            gate_ratio = nr
        if prior_raw and gate_ratio is not None and gate_ratio > threshold:
            entry["FLAG"] = True
            flags.append(q)
        table[q] = entry
    shared = {
        n: d.get("shared_with_r01")
        for n, d in rounds.items()
        if d.get("shared_with_r01") is not None
    }
    print(
        json.dumps(
            {
                "latest": latest,
                "threshold": threshold,
                "flagged": flags,
                "sentinel_min_by_round": {
                    n: s for n, s in sent.items() if s
                },
                "shared_with_r01": shared,
                "queries": table,
            },
            indent=1,
        )
    )
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
