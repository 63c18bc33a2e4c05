"""tools/close_round.py — the atomic round-close gates (VERDICT r13 #2/#3).

Round 13 closed red because an evidence commit landed after the last
ledger regeneration.  These tests pin the gate layer that prevents a
recurrence: every fast gate passes on a clean tree, BOTH content gates
actually detect drift (not vacuously green), and the artifact-ordering
helpers pick the newest round correctly (r9 < r10, r13 < r13b).

Drift is probed through doctored COPIES (`scale_ledger.py --check
--file`, `gate_plans_coverage(plans_path=...)`) — the r14 in-round
review flagged that an earlier version mutated the real SCALE_LEDGER.md
in place, which a SIGKILL mid-test would have left corrupted.

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


def test_scale_ledger_gate_detects_drift(tmp_path):
    """The ledger gate must FAIL on a doctored copy and PASS on the real
    file — guard against the gate itself going vacuous.  The real
    SCALE_LEDGER.md is never touched."""
    drifted = tmp_path / "SCALE_LEDGER.md"
    drifted.write_text(
        (ROOT / "SCALE_LEDGER.md").read_text() + "\n<!-- drift -->\n"
    )
    ok, msg = close_round.gate_scale_ledger(file=str(drifted))
    assert not ok and "STALE" in msg
    ok, _ = close_round.gate_scale_ledger()
    assert ok


def test_plans_gate_detects_missing_and_orphan_rows(tmp_path):
    """gate_plans_coverage must flag a dropped row AND an invented row —
    on doctored copies, the real PLANS.md untouched."""
    text = (ROOT / "PLANS.md").read_text()
    lines = text.splitlines(keepends=True)
    data_idx = [
        i for i, line in enumerate(lines)
        if line.startswith("| ") and not line.startswith("| query |")
    ]
    assert data_idx, "PLANS.md has no data rows?"

    missing = tmp_path / "missing.md"
    missing.write_text("".join(
        line for i, line in enumerate(lines) if i != data_idx[0]
    ))
    ok, msg = close_round.gate_plans_coverage(plans_path=missing)
    assert not ok and "missing" in msg

    orphan = tmp_path / "orphan.md"
    orphan.write_text(text + "| not_a_real_slug | 0 | | | | | |\n")
    ok, msg = close_round.gate_plans_coverage(plans_path=orphan)
    assert not ok and "orphan" in msg

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
    """Both bench lines must carry real numbers — the r14 review caught
    the BENCH_r parse reading top-level keys when driver artifacts nest
    bench.py's JSON under 'parsed' (printed 'total None None')."""
    import re

    lines = close_round._bench_lines()
    joined = "\n".join(lines)
    assert "None" not in joined, joined
    bench = [line for line in lines if line.startswith("- bench (")]
    assert bench and re.search(r"total \d+(\.\d+)? sec over [1-9]\d* headline",
                               bench[0]), bench
    ab = [line for line in lines if "BENCH_AB" in line]
    assert ab and re.search(r"\(-?\d+(\.\d+)? %\)", ab[0]), ab


def test_postcommit_hook_versioned_and_executable():
    import os

    hook = ROOT / "tools" / "hooks" / "post-commit"
    assert hook.exists(), "tools/hooks/post-commit missing"
    assert os.access(hook, os.X_OK), "hook not executable"
    body = hook.read_text()
    assert "exit 0" in body and "scale_ledger" in body
    # the heal must be a follow-up commit of ONLY the ledger, skipping
    # hooks it can't control, and must never be able to fail the commit
    assert "--no-verify -o SCALE_LEDGER.md" in body
    # ADVICE r14: never inject the heal commit while a sequencer owns
    # HEAD (rebase/cherry-pick/am)
    for marker in ("rebase-merge", "rebase-apply", "CHERRY_PICK_HEAD"):
        assert marker in body, f"hook missing sequencer guard for {marker}"


def test_scale_ledger_file_flag_missing_operand_is_usage_error():
    """ADVICE r14: `--check --file` with no PATH operand must exit 2 with
    the usage message, not an IndexError traceback."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "scale_ledger.py"),
         "--check", "--file"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 2
    assert "usage" in proc.stderr.lower()
    assert "IndexError" not in proc.stderr
