"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is fully materialized through the `noop` sink so Catalyst cannot
prune unused result columns — the timings are end-to-end plan executions.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airstrik_py_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

# The headline set: flagship trip pipeline + the heaviest operator families
# (dead reckoning unroll, daily rollup, dedup, ANN, kinematics windows).
# The first 10 are unchanged since r1 for round-over-round comparability;
# r3 adds one representative each from the star-schema, events, and
# composed-pipeline families (VERDICT r2 next-round #6).
HEADLINE = (
    "agg_trip_assembly",
    "alarm_dead_reckoning",
    "agg_daily_stats",
    "window_calc_speed",
    "filter_decimation",
    "predicate_search",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_bruteforce_cosine",
    "text_fingerprint",
    "star_revenue_topk",
    "events_sessionize",
    "pipeline_corpus_release",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark("bench")
    queries = entrymod.queries()

    # Warm the session (JVM classload, codegen, parquet footer cache) so the
    # first headline query is not charged for startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    queries["filter_liveness"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # median-of-5 per query with recorded min/max spread (VERDICT r8 #2):
    # single-machine timings vary ±15-25% run-to-run on this shared box
    # (up to 3x under concurrent load — observed r3), which made best-of-3
    # round-over-round deltas unreadable.  The median is robust to a single
    # loaded run in either direction; the per-query spread is persisted so
    # a delta smaller than the spread is read as noise, not regression.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        fn = queries[name]
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        spread[name] = {"min": round(samples[0], 3), "max": round(samples[-1], 3)}

    total = round(sum(timings.values()), 3)
    # Round-over-round comparability (VERDICT r3 #7): publish BOTH totals —
    # the full headline AND the unchanged-since-r1 original-10 subset — so
    # cross-round comparisons never need per-query arithmetic.  best_* are
    # the sum-of-minima twins of the historical best-of-3 numbers, kept so
    # r1-r8 BENCH files stay directly comparable across the estimator switch.
    original10 = round(sum(timings[n] for n in HEADLINE[:10]), 3)
    best_total = round(sum(spread[n]["min"] for n in HEADLINE), 3)
    best_original10 = round(sum(spread[n]["min"] for n in HEADLINE[:10]), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "original10_total_sec": original10,
                "best_total_sec": best_total,
                "best_original10_total_sec": best_original10,
                "queries": timings,
                "spread": spread,
                "sf": sf,
                "runs_per_query": runs,
                "estimator": "median",
            }
        )
    )


if __name__ == "__main__":
    main()
