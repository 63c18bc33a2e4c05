"""Paired interleaved bench A/B: this tree vs a baseline commit (VERDICT
r11 #1).

The standing rule (learned r11, where BENCH_r11 read +35% vs BENCH_r10 and
the entire delta turned out to be box state): never believe a
round-over-round bench regression without a PAIRED A/B on the same box at
the same moment.  r11's A/B lived only in ROUNDLOG prose — this tool makes
it a committed, machine-checkable artifact.

What it does:
  * checks the baseline ref out into a throwaway git worktree,
  * runs `python bench.py` alternately in the baseline tree and in this
    tree (ABBA order, so slow box drift cancels instead of biasing one
    side), N pairs total,
  * writes per-query paired medians + deltas and the raw per-run samples
    to the output JSON.

Usage:
  python tools/bench_ab.py [--baseline REF] [--pairs N] [--runs-per-query K]
                           [--sf-dir DIR] [--out FILE]

Defaults: baseline = the commit that last touched the newest BENCH_r*.json
(i.e. the tree the prior round's recorded bench measured), pairs = 5
(VERDICT r14 #2 — 3 pairs left the noise floor near the deltas being
judged), runs-per-query = 3 (SPARK_GRAFT_BENCH_RUNS for both sides),
out = BENCH_AB.json in the repo root.

The standing cross-round anchor is BENCH_ANCHOR.json: a committed A/B of
a round tree vs the ROUND-1 tree (the BASELINE.md measurement vintage),
refreshed with `--baseline <r01-bench-commit> --out BENCH_ANCHOR.json`.
Its common-set delta is the number to quote for "how far from the
original baseline are we" — per-round BENCH_r*.json totals are NOT
cross-comparable (box state dominates; r11 and r14 both proved it).

Reading the result: `delta_pct` per query and for the totals is
(head - base) / base * 100 over paired medians.  A delta inside the paired
spread is noise; only a delta that holds across every pair is code.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str, cwd: str = REPO) -> str:
    return subprocess.run(
        ["git", *args], cwd=cwd, check=True, capture_output=True, text=True
    ).stdout.strip()


def default_baseline() -> str:
    """The commit that last touched the newest BENCH_r*.json — the tree the
    prior round's recorded bench numbers actually measured.  "Newest" is by
    the parsed round NUMBER, not lexicographic order (an unpadded BENCH_r9
    or a future BENCH_r100 would silently win a string sort)."""
    benches = [
        (int(m.group(1)), f)
        for f in os.listdir(REPO)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    if not benches:
        raise SystemExit("no BENCH_r*.json found; pass --baseline explicitly")
    return _git("log", "-1", "--format=%H", "--", max(benches)[1])


def run_bench(tree: str, sf_dir: str, runs_per_query: int) -> dict:
    """One `python bench.py` invocation in `tree`; returns its JSON line."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_RUNS=str(runs_per_query),
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py failed in {tree} (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}"
        )
    # progress bars share carriage returns with stdout; scan every CR/LF
    # fragment for the single JSON result line
    for line in reversed(proc.stdout.replace("\r", "\n").splitlines()):
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise RuntimeError(f"no bench JSON line in stdout from {tree}")


def median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default=None, help="git ref to A/B against")
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--runs-per-query", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_AB.json"))
    ap.add_argument(
        "--allow-dirty",
        action="store_true",
        help="measure a dirty HEAD anyway (the artifact still records "
        "head_dirty=true); without it a dirty tree is a hard refusal",
    )
    args = ap.parse_args()

    base_ref = args.baseline or default_baseline()
    base_sha = _git("rev-parse", base_ref)
    head_sha = _git("rev-parse", "HEAD")
    dirty = bool(_git("status", "--porcelain"))
    # VERDICT r12 #3: a closing-evidence artifact measured on a dirty tree
    # is unattributable to any commit — refuse unless explicitly overridden
    # (the override still stamps head_dirty so the artifact self-reports).
    if dirty and not args.allow_dirty:
        raise SystemExit(
            "HEAD is dirty — the A/B would measure uncommitted code that no "
            "sha identifies. Commit first, or pass --allow-dirty to record "
            "an explicitly head_dirty=true artifact."
        )

    # Always rebuild the baseline worktree: a leftover from an interrupted
    # run may sit on a different checkout or carry local edits, which would
    # bench modified code while reporting base_sha (ADVICE r12).  Handle
    # BOTH desync directions (self-review r13): registered-but-deleted
    # (e.g. /tmp wiped on reboot -> `worktree add` refuses) via prune, and
    # present-but-unregistered via plain rmtree when `worktree remove`
    # won't own it.
    wt = f"/tmp/bench_ab_{base_sha[:12]}"
    _git("worktree", "prune")
    if os.path.isdir(wt):
        try:
            _git("worktree", "remove", "--force", wt)
        except subprocess.CalledProcessError:
            shutil.rmtree(wt)
            # `remove` may have failed for a reason other than
            # non-registration; rmtree left the registration behind, so
            # prune again or the `worktree add` below refuses (ADVICE r13)
            _git("worktree", "prune")
    _git("worktree", "add", "--detach", wt, base_sha)

    try:
        base_runs: list[dict] = []
        head_runs: list[dict] = []
        order_log: list[str] = []
        for i in range(args.pairs):
            # ABBA: alternate which side goes first so monotone box drift
            # adds to both sides equally instead of biasing the second seat
            legs = (
                [("base", wt), ("head", REPO)]
                if i % 2 == 0
                else [("head", REPO), ("base", wt)]
            )
            for side, tree in legs:
                t0 = time.time()
                res = run_bench(tree, args.sf_dir, args.runs_per_query)
                wall = round(time.time() - t0, 1)
                (base_runs if side == "base" else head_runs).append(res)
                order_log.append(side)
                print(
                    f"[pair {i + 1}/{args.pairs}] {side}: "
                    f"total={res['value']}s (wall {wall}s)",
                    flush=True,
                )

        base_qs = list(base_runs[0]["queries"])
        head_qs = list(head_runs[0]["queries"])
        # totals are compared over the COMMON query set only: if the
        # HEADLINE tuple changed between the two trees, summing each side's
        # own set would report the set change as a phantom code regression
        # (or improvement) — the exact confusion this tool exists to kill.
        common = [q for q in base_qs if q in set(head_qs)]
        added = [q for q in head_qs if q not in set(base_qs)]
        removed = [q for q in base_qs if q not in set(head_qs)]
        per_query = {}
        for q in base_qs:
            b = [r["queries"][q] for r in base_runs]
            if q not in set(head_qs):  # renamed/removed in HEAD
                per_query[q] = {"base_samples": b, "head_samples": None}
                continue
            h = [r["queries"][q] for r in head_runs]
            bm, hm = median(b), median(h)
            per_query[q] = {
                "base_median": round(bm, 3),
                "head_median": round(hm, 3),
                "delta_pct": round((hm - bm) / bm * 100.0, 1) if bm else None,
                "base_samples": b,
                "head_samples": h,
            }
        for q in added:  # present in HEAD only: recorded, never compared
            per_query[q] = {
                "base_samples": None,
                "head_samples": [r["queries"][q] for r in head_runs],
            }
        totals = {}
        b = [sum(r["queries"][q] for q in common) for r in base_runs]
        h = [sum(r["queries"][q] for q in common) for r in head_runs]
        bm, hm = median(b), median(h)
        totals["common_total_sec"] = {
            "n_queries": len(common),
            "base_median": round(bm, 3),
            "head_median": round(hm, 3),
            "delta_pct": round((hm - bm) / bm * 100.0, 1) if bm else None,
            "base_samples": [round(x, 3) for x in b],
            "head_samples": [round(x, 3) for x in h],
        }
        # each side's own recorded totals, kept for cross-referencing the
        # BENCH_r*.json series — NOT comparable to each other when the
        # headline set changed (see added/removed below)
        for key in ("value", "original10_total_sec"):
            # pre-r3 bench JSONs lack original10_total_sec — record what
            # each side actually printed (None-padded keys would lie)
            totals[key] = {
                "base_samples": [r[key] for r in base_runs if key in r],
                "head_samples": [r[key] for r in head_runs if key in r],
            }

        out = {
            "baseline_ref": base_ref,
            "baseline_sha": base_sha,
            "head_sha": head_sha,
            "head_dirty": dirty,
            "sf_dir": args.sf_dir,
            "pairs": args.pairs,
            "runs_per_query": args.runs_per_query,
            "interleave_order": order_log,
            "queries_added_in_head": added,
            "queries_removed_in_head": removed,
            "totals": totals,
            "per_query": per_query,
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
        ct = totals["common_total_sec"]
        print(
            f"\nA/B written to {args.out}: common-set total "
            f"({ct['n_queries']} queries) "
            f"base={ct['base_median']}s head={ct['head_median']}s "
            f"({ct['delta_pct']:+.1f}%)"
            + (f"; added in head: {added}" if added else "")
            + (f"; removed in head: {removed}" if removed else "")
        )
        return 0
    finally:
        _git("worktree", "remove", "--force", wt)


if __name__ == "__main__":
    raise SystemExit(main())
