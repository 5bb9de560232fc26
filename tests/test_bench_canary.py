"""Unit tests for the bench canary's evaluation rules (VERDICT r12
stretch #8: first-appearance tracking + cold-ratio gate, plus the
r13 dedup_semantic exemption from VERDICT r12 #6). Pure-function tests
— no Spark, no git."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "bench_canary",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "bench_canary.py",
    ),
)
canary = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(canary)


def test_warm_regression_fails():
    failures, notes = canary.evaluate(
        cur_warm={"q1": 4.0},
        cur_cold={},
        prev_warm={"q1": 2.0},
        prev_cold=None,
    )
    assert len(failures) == 1 and "warm q1" in failures[0]
    assert notes == []


def test_warm_subsecond_jitter_ignored():
    failures, _ = canary.evaluate(
        cur_warm={"q1": 0.9}, cur_cold={}, prev_warm={"q1": 0.3}, prev_cold=None
    )
    assert failures == []


def test_exempt_query_never_fails():
    failures, _ = canary.evaluate(
        cur_warm={"dedup_semantic": 50.0},
        cur_cold={"dedup_semantic": 90.0},
        prev_warm={"dedup_semantic": 2.0},
        prev_cold={"dedup_semantic": 3.0},
    )
    assert failures == []


def test_new_query_is_noted_not_failed():
    failures, notes = canary.evaluate(
        cur_warm={"old": 1.0, "brand_new": 9.9},
        cur_cold={"brand_new": 31.0},
        prev_warm={"old": 1.0},
        prev_cold=None,
    )
    assert failures == []
    assert len(notes) == 1
    assert "brand_new" in notes[0] and "unguarded" in notes[0]
    assert "31.00" in notes[0]  # cold number surfaced for the record


def test_cold_regression_fails_past_3x():
    failures, _ = canary.evaluate(
        cur_warm={"q": 1.0},
        cur_cold={"q": 10.0},
        prev_warm={"q": 1.0},
        prev_cold={"q": 3.0},
    )
    assert len(failures) == 1 and failures[0].startswith("cold q")


def test_cold_noise_under_3x_passes():
    failures, _ = canary.evaluate(
        cur_warm={"q": 1.0},
        cur_cold={"q": 8.0},
        prev_warm={"q": 1.0},
        prev_cold={"q": 3.0},
    )
    assert failures == []


def test_cold_subfloor_ignored():
    # sub-2s cold numbers are first-touch/JIT noise, never gated
    failures, _ = canary.evaluate(
        cur_warm={"q": 1.0},
        cur_cold={"q": 9.0},
        prev_warm={"q": 1.0},
        prev_cold={"q": 1.5},
    )
    assert failures == []


def test_prior_history_entry_picks_newest_older(tmp_path, monkeypatch):
    hist = tmp_path / "bench_history.jsonl"
    rows = [
        {"ts": 100.0, "cold_queries": {"q": 1.0}},
        {"ts": 200.0, "cold_queries": {"q": 2.0}},
        {"ts": 300.0, "cold_queries": {"q": 3.0}},  # == current: excluded
    ]
    hist.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    monkeypatch.setattr(canary, "REPO", str(tmp_path))
    entry = canary.prior_history_entry(300.0)
    assert entry is not None and entry["ts"] == 200.0
    assert canary.prior_history_entry(50.0) is None
    # missing file is a clean None, not an error
    monkeypatch.setattr(canary, "REPO", str(tmp_path / "absent"))
    assert canary.prior_history_entry(300.0) is None


def test_history_tolerates_corrupt_lines(tmp_path, monkeypatch):
    hist = tmp_path / "bench_history.jsonl"
    hist.write_text(
        "not json\n"
        + json.dumps({"ts": 10.0, "cold_queries": {"q": 5.0}})
        + "\n{\n"
    )
    monkeypatch.setattr(canary, "REPO", str(tmp_path))
    entry = canary.prior_history_entry(999.0)
    assert entry is not None and entry["cold_queries"] == {"q": 5.0}


# ---------------------------------------------------------------------------
# r13 host calibration: regression gates scale with measured host speed


def test_host_factor_basics():
    assert canary.host_factor(2.0, 1.0) == 2.0
    # forgive-only: a faster current host never tightens the gate
    assert canary.host_factor(0.5, 1.0) == 1.0
    # clamped: a >4x "slower host" stops excusing anything further
    assert canary.host_factor(10.0, 1.0) == 4.0
    # missing / bogus calibration on either side -> neutral
    assert canary.host_factor(None, 1.0) == 1.0
    assert canary.host_factor(1.0, None) == 1.0
    assert canary.host_factor(0.0, 1.0) == 1.0


def test_host_slowdown_excuses_uniform_inflation_with_note():
    # a 2x-slower host inflating an untouched query 1.9x: excused, noted
    failures, notes = canary.evaluate(
        cur_warm={"q1": 3.8},
        cur_cold={},
        prev_warm={"q1": 2.0},
        prev_cold=None,
        hf=2.0,
    )
    assert failures == []
    assert len(notes) == 1 and "excused by host calibration" in notes[0]


def test_real_regression_fails_even_host_adjusted():
    # a 4x regression under a 2x-slower host still exceeds 1.5*2 = 3x
    failures, _ = canary.evaluate(
        cur_warm={"q1": 8.0},
        cur_cold={},
        prev_warm={"q1": 2.0},
        prev_cold=None,
        hf=2.0,
    )
    assert len(failures) == 1 and "host-adjusted" in failures[0]


def test_cold_gate_also_host_adjusted():
    failures, notes = canary.evaluate(
        cur_warm={"q": 1.0},
        cur_cold={"q": 14.0},
        prev_warm={"q": 1.0},
        prev_cold={"q": 3.0},
        hf=2.0,
    )
    assert failures == []  # 14 < 3 * 3.0 * 2
    assert any("excused" in n for n in notes)
