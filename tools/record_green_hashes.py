"""Maintain registry/green_hashes.json — the source-hash-at-last-green
sidecar behind the rotation's changed-since-green key (VERDICT r9 #1).

Usage:
  python tools/record_green_hashes.py          # round close: record current
      source hashes for every slug GREEN in the NEWEST CORRECTNESS_r*.json.
      Run immediately after the driver writes that file, before editing any
      source, so the hash states "this is the code those green rows proved".
  python tools/record_green_hashes.py --seed   # initial build: for every
      slug, find its last driver-green round N, hash its source closure in
      the round-N close commit tree ("round N: verdict/..." — the driver's
      artifact commit shares the verified source tree), and record the
      CURRENT hash only when the two are identical.  Slugs whose source
      changed since their green are left out of the sidecar (=> they sort
      into the next driver window) and printed as CHANGED.

Green predicate matches registry._driver_green_history (rows AND schema AND
hash AND no error).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from airstrik_py_spark.registry import _driver_green_history, slug_roots  # noqa: E402
from airstrik_py_spark.registry import srcstate  # noqa: E402

REPO = Path(__file__).resolve().parents[1]


def round_close_commits() -> dict[int, str]:
    out = subprocess.run(
        ["git", "-C", str(REPO), "log", "--format=%H %s"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    commits: dict[int, str] = {}
    for line in out.splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m:
            # log is newest-first; keep the newest per round
            commits.setdefault(int(m.group(2)), m.group(1))
    return commits


def main() -> int:
    seed = "--seed" in sys.argv[1:]
    roots = slug_roots()
    cur = srcstate.slug_hashes(roots)
    side = srcstate.load_sidecar()
    _, _, last_full, _ = _driver_green_history()

    if seed:
        commits = round_close_commits()
        readers = {rnd: srcstate.GitReader(c) for rnd, c in commits.items()}
        kept = changed = nogreen = 0
        for slug in sorted(roots):
            rnd = last_full.get(slug, 0)
            if rnd == 0 or rnd not in readers:
                print(f"NO-GREEN {slug}")
                nogreen += 1
                continue
            hist = srcstate.closure_hash(sorted(roots[slug]), readers[rnd])
            if hist == cur[slug]:
                side[slug] = {"round": rnd, "hash": cur[slug]}
                kept += 1
            else:
                side.pop(slug, None)
                print(f"CHANGED {slug} (last green r{rnd})")
                changed += 1
        srcstate.save_sidecar(side)
        print(f"\nseeded: {kept} unchanged-since-green, {changed} changed, "
              f"{nogreen} never-green -> {srcstate.SIDECAR}")
        return 0

    # round close: credit greens from the newest CORRECTNESS file
    files = sorted(REPO.glob("CORRECTNESS_r*.json"))
    if not files:
        print("no CORRECTNESS files")
        return 1
    newest = files[-1]
    rnd = int(newest.stem.rsplit("_r", 1)[1])
    rows = json.loads(newest.read_text())
    n = 0
    for slug, row in rows.items():
        if slug not in cur or not isinstance(row, dict):
            continue
        green = (
            row.get("rows_match")
            and row.get("schema_match") is not False
            and row.get("hash_match") is not False
            and row.get("err") is None
        )
        if green:
            side[slug] = {"round": rnd, "hash": cur[slug]}
            n += 1
    srcstate.save_sidecar(side)
    print(f"recorded {n} green hashes from {newest.name} -> {srcstate.SIDECAR}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
