"""Query registry: every SURVEY.md §2 slug maps to a (Spark callable, DuckDB
oracle SQL) pair.  Submodules register into QUERIES/ORACLES; __spark_entry__
re-exports the merged dicts for the driver."""

from __future__ import annotations

import importlib
import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Module enumeration order (stable tie-break within a rotation class).
_MODULES = (
    "kinematics_q",
    "sessions_q",
    "alarm_q",
    "stats_q",
    "search_q",
    "sinks_q",
    "text_q",
    "dedup_q",
    "similarity_q",
    "extras_q",
    "scale_q",
    "analytics_q",
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def _driver_green_history() -> tuple[
    dict[str, int], dict[str, int], dict[str, int], dict[str, int]
]:
    """(full-green counts, rows-only counts, last full-green round,
    last rows-only round) per slug across CORRECTNESS_r*.json.

    The driver records only the first ~50 ``queries()`` entries per round
    (VERDICT r2: 50/113), so enumeration order decides which slugs ever earn
    a driver-proven row.  Rotation policy (VERDICT r2 #1, refined per
    VERDICT r6 #1): once every slug has at least one green, the binding
    signal is RECENCY — a slug last verified in r2 and rewritten since is
    staler than one verified once in r6 — so the least-recently-green
    cohort leads, with fewest-greens and insertion order as tie-breaks.
    The full local sweep (tools/check.py) still covers everything each
    round.  Rows-only credit is returned separately: it only counts for
    slugs that STILL have no oracle (a slug that later gained one —
    ddl_drop_reset in r4 — must re-enter the window to earn its first
    hash-verified row)."""
    counts: dict[str, int] = {}
    rows_only: dict[str, int] = {}
    last_full: dict[str, int] = {}
    last_rows_only: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.rsplit("_r", 1)[1])
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for slug, row in rows.items():
            if not isinstance(row, dict):
                continue
            # Full green = every recorded check passed: rows AND schema AND
            # value-hash (counting rows_match alone would rotate a slug whose
            # CONTENT mismatches out of the window — the opposite of intent).
            full_green = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and row.get("err") is None
            )
            # Rows-only slugs (no oracle possible, e.g. live catalog ops)
            # record err='no_oracle' with a spark row count: that IS their
            # maximum achievable verification — count it (for oracle-less
            # slugs only; collect() decides), or they burn a window slot
            # every round forever.
            if full_green:
                counts[slug] = counts.get(slug, 0) + 1
                last_full[slug] = max(last_full.get(slug, 0), rnd)
            elif (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            ):
                rows_only[slug] = rows_only.get(slug, 0) + 1
                last_rows_only[slug] = max(last_rows_only.get(slug, 0), rnd)
    return counts, rows_only, last_full, last_rows_only


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(f"airstrik_py_spark.registry.{mod_name}")
        except ModuleNotFoundError:
            continue
        mod_queries = getattr(mod, "QUERIES", {})
        dupes = set(mod_queries) & set(queries)
        if dupes:
            raise ValueError(f"duplicate registry slugs from {mod_name}: {sorted(dupes)}")
        queries.update(mod_queries)
        oracles.update(getattr(mod, "ORACLES", {}))
    # Stable rotation: least-recently-driver-green first (never-green sorts
    # as round 0 and therefore always leads), then fewest green rows, then
    # insertion order.  Rows-only rows count as green only while the slug
    # still lacks an oracle; once one is registered the slug re-enters the
    # window to earn its first hash-verified row.
    full, rows_only, last_full, last_rows_only = _driver_green_history()
    green = {
        slug: full.get(slug, 0)
        + (rows_only.get(slug, 0) if slug not in oracles else 0)
        for slug in queries
    }
    last = {
        slug: max(
            last_full.get(slug, 0),
            last_rows_only.get(slug, 0) if slug not in oracles else 0,
        )
        for slug in queries
    }
    order = sorted(queries, key=lambda slug: (last.get(slug, 0), green.get(slug, 0)))
    queries = {slug: queries[slug] for slug in order}
    oracles = {slug: oracles[slug] for slug in order if slug in oracles}
    return queries, oracles
