"""tools/bench_ab.py pure logic — the A/B artifact generator's
non-subprocess parts (median, baseline resolution, ABBA interleave) so
the tool can't silently rot between rounds."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools import bench_ab


def test_median():
    assert bench_ab.median([3.0]) == 3.0
    assert bench_ab.median([1.0, 9.0]) == 5.0
    assert bench_ab.median([9.0, 1.0, 5.0]) == 5.0
    assert bench_ab.median([4.0, 1.0, 9.0, 5.0]) == 4.5


def test_default_baseline_is_commit_of_newest_bench(monkeypatch):
    """default_baseline must resolve to the commit that last touched the
    HIGHEST-numbered BENCH_r*.json by PARSED round number — an unpadded
    BENCH_r9 or a three-digit BENCH_r100 must not win a string sort
    (ADVICE r12)."""
    seen = {}

    def fake_git(*args, cwd=None):
        seen["args"] = args
        return "abc123"

    monkeypatch.setattr(bench_ab, "_git", fake_git)
    monkeypatch.setattr(
        bench_ab.os, "listdir",
        lambda _p: ["BENCH_r02.json", "BENCH_r9.json", "BENCH_r100.json",
                    "BENCH_r11.json", "CORRECTNESS_r11.json"],
    )
    assert bench_ab.default_baseline() == "abc123"
    assert seen["args"][-1] == "BENCH_r100.json"


def test_main_refuses_dirty_head(monkeypatch):
    """A dirty working tree must be a hard refusal (VERDICT r12 #3): the
    artifact's head_sha would not identify the code measured.  The refusal
    must fire BEFORE any worktree is created."""

    def fake_git(*args, cwd=None):
        if args[0] == "status":
            return " M some_file.py"
        if args[0] == "rev-parse":
            return "deadbeef" * 5
        if args[0] == "log":
            return "deadbeef" * 5
        raise AssertionError(f"unexpected git call before refusal: {args}")

    monkeypatch.setattr(bench_ab, "_git", fake_git)
    monkeypatch.setattr(
        bench_ab.os, "listdir", lambda _p: ["BENCH_r12.json"]
    )
    monkeypatch.setattr(bench_ab.sys, "argv", ["bench_ab.py"])
    try:
        bench_ab.main()
    except SystemExit as e:
        assert "dirty" in str(e)
    else:
        raise AssertionError("expected SystemExit on dirty HEAD")


def test_run_bench_parses_json_line_through_progress_noise(monkeypatch, tmp_path):
    """The bench JSON line must be found even when carriage-return progress
    bars share the stream (the stdout-swallowing gotcha in the verify
    skill)."""
    payload = {"metric": "headline_queries_total_sec", "value": 1.5,
               "queries": {"q": 1.5}, "original10_total_sec": 1.5}

    class P:
        returncode = 0
        stderr = ""
        stdout = ("[Stage 1:>    ]\r[Stage 2:>  ]\r" + json.dumps(payload)
                  + "\ntrailing log line\n")

    monkeypatch.setattr(bench_ab.subprocess, "run", lambda *a, **k: P())
    got = bench_ab.run_bench(str(tmp_path), "/x", 3)
    assert got["value"] == 1.5


def test_run_bench_raises_on_failure(monkeypatch, tmp_path):
    class P:
        returncode = 2
        stderr = "boom"
        stdout = ""

    monkeypatch.setattr(bench_ab.subprocess, "run", lambda *a, **k: P())
    try:
        bench_ab.run_bench(str(tmp_path), "/x", 3)
    except RuntimeError as e:
        assert "boom" in str(e)
    else:
        raise AssertionError("expected RuntimeError")
