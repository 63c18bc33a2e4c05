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

    # best-of-3 per query: single-machine timings vary ±30% run-to-run
    # (up to 3x under concurrent load — observed r3), and the minimum is
    # the stable estimator of the plan's actual cost; runs_per_query is
    # declared in the output so rounds stay comparable.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = None
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # Round-over-round comparability (VERDICT r3 #7): publish BOTH totals —
    # the full headline AND the unchanged-since-r1 original-10 subset — so
    # cross-round comparisons never need per-query arithmetic.
    original10 = round(sum(timings[n] for n in HEADLINE[:10]), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "original10_total_sec": original10,
                "queries": timings,
                "sf": sf,
                "runs_per_query": 3,
            }
        )
    )


if __name__ == "__main__":
    main()
