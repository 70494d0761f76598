"""Bench drift comparator: flag per-query regressions across rounds.

Reads every round's bench artifact in the repo root (plus an optional
candidate JSON file argument — e.g. a fresh ``bench.py`` line before the
driver records it) and reports, for each query:

* its timing per round,
* the drift of the LATEST reading vs the query's own cross-round MINIMUM
  (the per-query anchor — robust to one busy-box round, unlike
  latest-vs-previous),
* a flag when latest > ``--threshold``× its anchor (default 1.5, the bar
  past rounds' verdicts applied).

Artifact resolution per round (VERDICT r13 item 2 — the driver's
``BENCH_r*.json`` wrapper truncates ``tail``, which silently dropped
rounds 11-13 from the old comparator):

1. ``BENCH_session_r{N}_close.json`` when present — the dispersion-gated
   close artifact, complete JSON, carries ``sentinel`` from r13 on.
2. The driver wrapper's ``parsed`` dict, else a full ``{"metric"...}``
   JSON line inside ``tail``.
3. LENIENT tail recovery: scan ``"name": float`` pairs out of a
   truncated tail (non-query scalar keys excluded) and regex the
   sentinel block — partial but far better than dropping the round.

Every round whose wrapper exists but cannot be recovered AT ALL prints a
loud stderr warning instead of vanishing.

Sentinel renormalization: when the LATEST round carries the pinned
single-thread kernel timing, sentinel-carrying rounds rescale to the
fastest box observed (t * s_ref/s_n) and flags fire on ``ratio_norm``.
The normalized anchor is computed ONLY over sentinel-carrying priors
(mixing raw fast-box priors into a rescaled series would tighten the
gate spuriously — ADVICE r13); when no sentinel-carrying prior has the
query, the gate falls back to the raw ratio for that query.

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

#: scalar keys that appear with float values in a bench line but are not
#: per-query timings (lenient tail recovery must skip them)
_NON_QUERY_KEYS = {
    "value",
    "sf",
    "n",
    "rc",
    "cpus",
    "shared_with_r01",
    "shared_with_r01_n",
    "streaming_total",
    "native_total",
    "pre",
    "post",
    "min",
    "max",
    "mean",
    "total",
    "headline_queries_total",
}


def _warn(msg: str) -> None:
    print(f"bench_compare WARNING: {msg}", file=sys.stderr)


def _recover_from_tail(tail: str) -> dict | None:
    """Best-effort recovery of queries/sentinel from a TRUNCATED driver
    tail (the wrapper cuts the head of the JSON line, so ``"metric"``
    and an unknown prefix of the queries dict may be missing)."""
    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*(-?\d+\.\d+)', tail)
    queries = {
        k: float(v) for k, v in pairs if k not in _NON_QUERY_KEYS
    }
    if not queries:
        return None
    d: dict = {"queries": queries, "recovered": "lenient-tail"}
    ms = re.search(r'"sentinel":\s*(\{[^{}]*\})', tail)
    if ms:
        try:
            d["sentinel"] = json.loads(ms.group(1))
        except Exception:
            pass
    msh = re.search(r'"shared_with_r01":\s*(-?\d+\.?\d*)', tail)
    if msh:
        d["shared_with_r01"] = float(msh.group(1))
    return d


def _load_driver_wrapper(path: str) -> dict | None:
    try:
        d = json.load(open(path))
    except Exception as e:  # noqa: BLE001
        _warn(f"{os.path.basename(path)} is unreadable ({e})")
        return None
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        out = dict(d["parsed"])
        if "sentinel" in d:
            out.setdefault("sentinel", d["sentinel"])
        return out
    tail = d.get("tail", "")
    mm = re.search(r'\{"metric".*\}', tail)
    if mm:
        try:
            return json.loads(mm.group(0))
        except Exception:
            pass
    rec = _recover_from_tail(tail)
    if rec is None:
        _warn(
            f"{os.path.basename(path)}: no queries recoverable "
            "(wrapper truncated past recognition) — round DROPPED"
        )
    return rec


def load_rounds(candidate: str | None) -> dict[str, dict]:
    # filenames may zero-pad the round number (BENCH_r01.json) — map
    # round -> actual path rather than reconstructing names
    closes: dict[int, str] = {}
    drivers: dict[int, str] = {}
    for f in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m:
            drivers[int(m.group(1))] = f
    for f in glob.glob(os.path.join(REPO, "BENCH_session_r*_close.json")):
        m = re.search(r"BENCH_session_r(\d+)_close\.json$", f)
        if m:
            closes[int(m.group(1))] = f
    rounds: dict[str, dict] = {}
    for n in sorted(set(closes) | set(drivers)):
        close = closes.get(n, "")
        driver = drivers.get(n, "")
        d = None
        if close:
            try:
                d = json.load(open(close))
                d["source"] = os.path.basename(close)
            except Exception as e:  # noqa: BLE001
                _warn(f"{os.path.basename(close)} unreadable ({e})")
                d = None
        if d is None and driver:
            d = _load_driver_wrapper(driver)
            if d is not None:
                d["source"] = os.path.basename(driver) + (
                    f" [{d['recovered']}]" if "recovered" in d else ""
                )
        if d is not None and "queries" in d:
            rounds[f"r{n}"] = d
    if candidate:
        d = json.load(open(candidate))
        d["source"] = candidate
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
    # compares on code, not on contention. The normalized anchor uses
    # ONLY sentinel-carrying priors; queries with none fall back to the
    # raw gate. When the latest round has no sentinel, EVERYTHING stays
    # raw. Raw series/anchor_min/ratio are always emitted so any entry
    # is auditable from its own output.
    sent = {
        n: (d.get("sentinel") or {}).get("min") for n, d in rounds.items()
    }
    have = {n: s for n, s in sent.items() if s}
    normalize = bool(sent.get(latest)) and len(have) > 1
    s_ref = min(have.values()) if have else None

    def norm(n: str, v: float) -> float:
        return v * (s_ref / sent[n])

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
                n: round(norm(n, v), 3)
                for n, v in series.items()
                if sent.get(n)
            }
            np = [v for n, v in nseries.items() if n != latest]
            entry["series_norm"] = nseries
            if np:
                na = min(np)
                nr = (
                    round(nseries[latest] / na, 2) if na > 0 else None
                )
                entry["anchor_min_norm"] = na
                entry["ratio_norm"] = nr
                gate_ratio = nr
            else:
                entry["norm_fallback"] = (
                    "no sentinel-carrying prior has this query; raw gate"
                )
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
                "normalized": normalize,
                "flagged": flags,
                "sources": {n: d.get("source") for n, d in rounds.items()},
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
