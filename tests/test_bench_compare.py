"""bench_compare artifact-recovery invariants (VERDICT r13 item 2).

The driver's ``BENCH_r*.json`` wrapper truncates ``tail``, which used to
silently drop rounds 11-13 from the comparator; these tests pin the
three recovery tiers against the real committed artifacts so a future
wrapper-format drift fails loudly instead of shrinking the series.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bc():
    spec = importlib.util.spec_from_file_location(
        "bench_compare", os.path.join(REPO, "tools", "bench_compare.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_lenient_tail_recovery_parses_truncated_r13_wrapper():
    bc = _bc()
    d = bc._load_driver_wrapper(os.path.join(REPO, "BENCH_r13.json"))
    assert d is not None and d.get("recovered") == "lenient-tail"
    assert len(d["queries"]) >= 40
    # scalar keys must NOT leak into the query table
    assert not set(d["queries"]) & bc._NON_QUERY_KEYS
    assert d["sentinel"]["min"] == 0.857 or d["sentinel"]["min"] > 0


def test_recover_from_tail_skips_non_query_scalars():
    bc = _bc()
    tail = (
        '", \\"q_alpha\\": 1.25, \\"q_beta\\": 0.50}, \\"value\\": 9.9,'
        ' \\"sf\\": 0.1, \\"sentinel\\": {\\"min\\": 0.9}}'
    ).replace("\\\"", '"')
    d = bc._recover_from_tail(tail)
    assert d["queries"] == {"q_alpha": 1.25, "q_beta": 0.5}
    assert d["sentinel"]["min"] == 0.9


def test_load_rounds_prefers_close_and_keeps_padded_rounds(capsys):
    bc = _bc()
    rounds = bc.load_rounds(None)
    # zero-padded driver files (BENCH_r01.json) must still load
    assert "r1" in rounds
    # the dispersion-gated close artifact wins over the driver wrapper
    assert rounds["r13"]["source"].startswith("BENCH_session_r13_close")
    assert (rounds["r13"].get("sentinel") or {}).get("min")
    # rounds are ordered numerically so the LATEST is the newest round
    names = list(rounds)
    nums = [int(n[1:]) for n in names]
    assert nums == sorted(nums)
    err = capsys.readouterr().err
    # unrecoverable rounds warn loudly instead of vanishing silently
    if "r2" not in rounds:
        assert "BENCH_r02.json" in err


def test_normalization_flags_on_sentinel_ratio(tmp_path, monkeypatch, capsys):
    """ADVICE r13: a sentinel-less fast-box prior must not tighten the
    normalized gate; queries absent from every sentinel-carrying prior
    fall back to the raw ratio (and say so)."""
    import json

    bc = _bc()
    mk = lambda n, d: (tmp_path / n).write_text(json.dumps(d))
    mk("BENCH_session_r1_close.json", {"queries": {"qa": 1.0, "qb": 1.0}})
    mk(
        "BENCH_session_r2_close.json",
        {"queries": {"qa": 4.0}, "sentinel": {"min": 2.0}},
    )
    mk(
        "BENCH_session_r3_close.json",
        {"queries": {"qa": 2.1, "qb": 1.4}, "sentinel": {"min": 1.0}},
    )
    monkeypatch.setattr(bc, "REPO", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["bench_compare.py"])
    try:
        bc.main()
    except SystemExit:
        pass
    out = json.loads(capsys.readouterr().out)
    assert out["normalized"] is True
    qa = out["queries"]["qa"]
    # r2 rescales 4.0 * (1.0/2.0) = 2.0 → normalized anchor 2.0, the
    # latest 2.1 is within threshold — no flag despite raw ratio 2.1
    assert qa["anchor_min_norm"] == 2.0
    assert qa["ratio_norm"] == 1.05
    assert "FLAG" not in qa
    # qb exists only in the sentinel-less r1 → raw-gate fallback noted
    qb = out["queries"]["qb"]
    assert "norm_fallback" in qb
    assert qb["ratio"] == 1.4
    assert out["flagged"] == []
