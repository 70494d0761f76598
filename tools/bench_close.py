"""Dispersion-gated close bench (VERDICT r11 item 2).

Round-close discipline: a close artifact measured on a busy box is an
upper bound, not a measurement — r11's committed close read 82.1s where
the same code measured 73.3s idle. This wrapper makes the rule
mechanical instead of aspirational:

* runs ``bench.py`` N times (``--runs``, default 3) SEQUENTIALLY, each
  a fresh process (fresh JVM — every run pays its own warmup, which
  bench.py already absorbs on the sf0.001 sibling);
* computes each run's headline total and the max/min dispersion across
  runs;
* REFUSES to emit an artifact (exit 1) when dispersion exceeds
  ``--max-dispersion`` (default 1.15) — that is the box telling you it
  is not idle; fix the box, don't launder the noise through best-of-N;
* otherwise writes the artifact to ``--out``: per-query MIN across runs
  (JIT/page-cache jitter is one-sided), plus a ``dispersion`` block
  recording every run's total so the judge can audit the gate.

Usage:
    python tools/bench_close.py --out BENCH_session_r12_close.json
    python tools/bench_close.py --runs 4 --max-dispersion 1.2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(idx: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(
        f"run {idx}: bench.py emitted no metric line\n--- stderr tail ---\n"
        + "\n".join(out.stderr.splitlines()[-15:])
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--max-dispersion", type=float, default=1.15)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    runs = [one_run(i) for i in range(args.runs)]
    totals = [r["value"] for r in runs]
    disp = max(totals) / min(totals)
    print(
        f"run totals: {[round(t, 2) for t in totals]}"
        f"  dispersion max/min = {disp:.3f}"
        f" (gate {args.max_dispersion})"
    )
    if disp > args.max_dispersion:
        print(
            "REFUSED: dispersion exceeds the gate — the box is not idle;"
            " no artifact written. Re-run when quiet.",
            file=sys.stderr,
        )
        raise SystemExit(1)

    base = runs[0]
    names = set(base["queries"])
    for r in runs[1:]:
        if set(r["queries"]) != names:
            raise SystemExit("query sets differ across runs")
    merged = {
        q: min(r["queries"][q] for r in runs) for q in sorted(names)
    }
    artifact = dict(base)
    artifact["queries"] = merged
    artifact["value"] = round(sum(merged.values()), 3)
    # min-merge the extra sections bench.py reports, when present, and
    # RECOMPUTE their *_total fields so the artifact stays internally
    # consistent (run[0]'s totals would not sum to min-merged sections)
    for extra in ("streaming", "native", "shared_with_r01"):
        vals = [r.get(extra) for r in runs if r.get(extra) is not None]
        if vals and all(isinstance(v, dict) for v in vals):
            keys = set(vals[0])
            if any(set(v) != keys for v in vals[1:]):
                raise SystemExit(
                    f"{extra!r} key sets differ across runs"
                )
            artifact[extra] = {q: min(v[q] for v in vals) for q in keys}
            if f"{extra}_total" in artifact:
                artifact[f"{extra}_total"] = round(
                    sum(artifact[extra].values()), 3
                )
        elif vals:
            artifact[extra] = min(vals)
    artifact["dispersion"] = {
        "runs": [round(t, 3) for t in totals],
        "max_over_min": round(disp, 4),
        "gate": args.max_dispersion,
        "merge": "per-query min",
    }
    # box-speed sentinel (VERDICT r12 item 2): bench.py times a pinned
    # single-threaded kernel pre+post each run; carry every run's
    # reading so cross-round absolutes renormalize mechanically
    sents = [r.get("sentinel") for r in runs if r.get("sentinel")]
    if sents:
        artifact["sentinel"] = {
            "runs": [s["min"] for s in sents],
            "min": min(s["min"] for s in sents),
            "kernel": sents[0].get("kernel"),
        }
    line = json.dumps(artifact)
    print(line)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as fh:
            fh.write(line + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
