"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()[name]`` on Spark and the matching ``oracle_sql()[name]``
on DuckDB over the same sf dir, then compares row count, sorted column names,
and the order-insensitive multiset of row values (columns sorted by name, like
the driver).  Exact equality on stringified values; floats get a tolerance
fallback report so tiny-ulp vs real-bug is visible.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

from airstrik_py_spark.session import get_spark  # noqa: E402
from airstrik_py_spark.sources.tables import TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact repr: queries round on both engines upstream, so even float
        # outputs must agree to the bit — no tolerance here
        return repr(v)
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon_value(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    duck = duckdb.connect()
    # Hard cap the oracle engine: DuckDB's default (80% of RAM) let a
    # pathological plan (1.0.0 sort-key aggregates, r8 asof finding) grow
    # to 125 GB and OOM-KILL the whole box, taking the Spark JVM with it.
    # With a cap, a runaway oracle raises OutOfMemoryException and is
    # reported as a normal FAIL instead.  min() with 50% of AVAILABLE RAM:
    # a flat 48GB would RAISE the cap on small boxes (DuckDB's default is
    # 80%), re-enabling the very OOM-kill this guard exists to prevent —
    # and sysconf reports HOST memory inside cgroup-limited containers,
    # so the cgroup cap (v2 memory.max, v1 limit_in_bytes) wins when set.
    ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    for cg in ("/sys/fs/cgroup/memory.max", "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            v = open(cg).read().strip()
            if v.isdigit():
                ram = min(ram, int(v))
        except OSError:
            continue
    cap_gb = max(1, min(48, int(ram * 0.5 / 2**30)))
    duck.execute(f"SET memory_limit='{cap_gb}GB'")
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("check")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"PASS {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            res = duck.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sc, dc = canon_rows(scols, srows), canon_rows(dcols, drows)
            if sc != dc:
                miss = list((dc - sc).items())[:3]
                extra = list((sc - dc).items())[:3]
                problems.append(f"values differ; duck-only={miss} spark-only={extra}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
