#!/usr/bin/env python3
"""DF-cap recall/runtime curve for the inverted-index near-dup lanes
(VERDICT r6 #4 / r7 item 2).

The document-frequency cap (operators/dedup.py ngram_jaccard_pairs,
operators/winnow.py winnow_pairs) is THE production scale knob for the
shingle/fingerprint inverted-index joins: per-key join fan-out is bounded
by df_max^2, so candidate-pair work is Sum_over_kept_shingles(df^2).  This
tool measures what the cap actually costs in pairs at a small SF where the
uncapped run is feasible:

  for df_max in {inf, 256, 64, 50, 16}:
    wall time (median of N), pairs emitted,
    recall   = |capped_pairs  & uncapped_pairs| / |uncapped_pairs|
    extra    = |capped_pairs - uncapped_pairs|  (capping the REPRESENTATION
               can also ADD pairs: dropping a hot shingle shrinks both
               union and intersection, so capped Jaccard can cross the
               threshold in either direction)

Usage: python tools/dfcap_curve.py [sf_dir] [runs]
Writes a markdown table to stdout (paste target: RECALL.md).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from airstrik_py_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402
from airstrik_py_spark.operators.winnow import winnow_pairs  # noqa: E402
from airstrik_py_spark.registry.dedup_q import JACCARD_THRESHOLD  # noqa: E402
from airstrik_py_spark.session import pin_session  # noqa: E402
from airstrik_py_spark.sources.tables import load_table  # noqa: E402

UNCAPPED = 1 << 30  # "infinity": larger than any fixture's doc count
CAPS = [UNCAPPED, 256, 64, 50, 16]


def _measure(build, runs: int):
    """(median wall sec, frozenset of (a, b) pairs) for a pair-frame thunk."""
    times = []
    pairs = None
    for _ in range(runs):
        t0 = time.monotonic()
        rows = build().select("doc_a", "doc_b").collect()
        times.append(time.monotonic() - t0)
        pairs = frozenset((r["doc_a"], r["doc_b"]) for r in rows)
    times.sort()
    return times[len(times) // 2], pairs


def curve(name, thunk_for_cap, runs):
    print(f"\n### {name}")
    print()
    print("| df_max | wall s (median) | pairs | recall vs uncapped | extra pairs |")
    print("|---|---|---|---|---|")
    truth = None
    rows = []
    for cap in CAPS:
        sec, pairs = _measure(thunk_for_cap(cap), runs)
        if truth is None:
            truth = pairs
        hit = len(pairs & truth)
        rec = hit / len(truth) if truth else 1.0
        extra = len(pairs - truth)
        label = "inf" if cap == UNCAPPED else str(cap)
        rows.append((label, sec, len(pairs), rec, extra))
        print(f"| {label} | {sec:.2f} | {len(pairs)} | {rec:.4f} | {extra} |")
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("dfcap_curve")
        .getOrCreate()
    )
    pin_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm the scan
    print(f"# DF-cap curve @ {sf_dir} (runs={runs}, threshold={JACCARD_THRESHOLD})")
    curve(
        "ngram_jaccard_pairs (3-gram, exact Jaccard on capped vocabulary)",
        lambda cap: (lambda: ngram_jaccard_pairs(docs, JACCARD_THRESHOLD, df_max=cap)),
        runs,
    )
    curve(
        "winnow_pairs (MOSS fingerprint matches, min_shared=2)",
        lambda cap: (lambda: winnow_pairs(docs, df_max=cap)),
        runs,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
