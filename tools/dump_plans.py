"""Dump `.explain("formatted")` for named queries to plans/<tag>/<query>_<suffix>.txt.

The optimization-round evidence artifact: before/after physical plans for
every query touched in the round (the judge checks plan claims against
these files).

Usage: python tools/dump_plans.py --tag r15 --suffix before [--sf-dir DIR] q1 q2 ...
       (no query names -> the bench HEADLINE set)
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airstrik_py_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = args.queries
    if not names:
        import bench

        names = list(bench.HEADLINE)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("dump_plans")
    # Static plans: AQE re-planning hides codegen/exchange structure in
    # explain output (AdaptiveSparkPlan isFinalPlan=false), so disable it
    # for the dump exactly as tools/audit_plans.py does; runtime keeps AQE.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(
            f"{name}: exchanges={txt.count('Exchange')} "
            f"bhj={txt.count('BroadcastHashJoin')} smj={txt.count('SortMergeJoin')} "
            f"-> {path}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
