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
    HIGHEST-numbered BENCH_r*.json (lexicographic works while rounds are
    zero-padded to two digits)."""
    seen = {}

    def fake_git(*args, cwd=None):
        seen["args"] = args
        return "abc123"

    monkeypatch.setattr(bench_ab, "_git", fake_git)
    monkeypatch.setattr(
        bench_ab.os, "listdir",
        lambda _p: ["BENCH_r02.json", "BENCH_r11.json", "BENCH_r10.json",
                    "CORRECTNESS_r11.json"],
    )
    assert bench_ab.default_baseline() == "abc123"
    assert seen["args"][-1] == "BENCH_r11.json"


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
