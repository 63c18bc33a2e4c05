"""Per-slug Spark-only wall time: every registered query materialized
through the noop sink (guide §1.4) — no DuckDB oracle in the timing, so
this isolates the engine side that bench.py samples for the headline set.

The round-opening profiling artifact for optimization rounds: run on a
quiet box, sort descending, and the top rows are the checklist.

Usage: python tools/profile_slugs.py [--sf-dir DIR] [--runs N] [--out FILE]
       [slug ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airstrik_py_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="/tmp/profile_slugs.json")
    ap.add_argument("slugs", nargs="*")
    args = ap.parse_args()

    spark = get_spark("profile_slugs")
    queries = entrymod.queries()
    names = args.slugs or list(queries)

    # warm: JVM classload + codegen + parquet footer cache
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        samples = []
        try:
            for _ in range(args.runs):
                spark.sparkContext.setJobDescription(f"profile:{name}")
                t0 = time.time()
                fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
        except Exception as e:  # noqa: BLE001 — record, keep profiling
            print(f"ERR {name}: {e}", file=sys.stderr)
            out[name] = -1.0
            continue
        out[name] = round(min(samples), 3)
        print(f"{out[name]:8.3f}  {name}", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    ranked = sorted((v, k) for k, v in out.items() if v >= 0)[::-1]
    print("\n== slowest ==")
    for v, k in ranked[:20]:
        print(f"{v:8.3f}  {k}")
    print(f"total {sum(v for v, _ in ranked):.1f}s over {len(ranked)} slugs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
