"""Rotation-order invariants for the driver-window registry ordering.

The driver records only the first ~50 queries() entries per round, so
collect() must enumerate the least-recently-driver-green slugs first
(VERDICT r6 #1: refresh the stale r1/r2-era rows) with fewest-greens as
the tie-break.  These tests run against the repo's real CORRECTNESS_r*.json
history — no Spark session needed.
"""

from __future__ import annotations

from airstrik_py_spark.registry import _driver_green_history, collect


def test_collect_orders_by_last_green_then_count():
    queries, oracles = collect()
    full, rows_only, last_full, last_rows_only = _driver_green_history()
    keys = []
    for slug in queries:
        last = max(
            last_full.get(slug, 0),
            last_rows_only.get(slug, 0) if slug not in oracles else 0,
        )
        green = full.get(slug, 0) + (
            rows_only.get(slug, 0) if slug not in oracles else 0
        )
        keys.append((last, green))
    assert keys == sorted(keys), "collect() must be least-recently-green first"


def test_every_slug_has_oracle_and_callable():
    queries, oracles = collect()
    assert set(oracles) <= set(queries)
    # every registered slug currently carries an oracle (census invariant);
    # if a genuinely non-SQL-expressible slug is ever added, update the
    # census block too (tools/census.py prints the rows-only list)
    assert set(queries) == set(oracles)
    assert all(callable(fn) for fn in queries.values())


def test_oracle_order_follows_query_order():
    queries, oracles = collect()
    q_order = [s for s in queries if s in oracles]
    assert list(oracles) == q_order
