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
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def _driver_green_counts() -> dict[str, int]:
    """slug -> number of driver-green CORRECTNESS_r*.json rows so far.

    The driver records only the first ~50 ``queries()`` entries per round
    (VERDICT r2: 50/113), so enumeration order decides which slugs ever earn
    a driver-proven row.  Rotation policy (VERDICT r2 'Next round' #1):
    slugs with the FEWEST driver-green rows lead, so every round the
    never-verified tail moves into the verification window automatically —
    no manual reordering, and the full local sweep (tools/check.py) still
    covers everything each round."""
    counts: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
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
            # maximum achievable verification — count it, or they burn a
            # window slot every round forever.
            rows_only_green = (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if full_green or rows_only_green:
                counts[slug] = counts.get(slug, 0) + 1
    return counts


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
    # Stable rotation: fewest driver-green rows first, insertion order within.
    green = _driver_green_counts()
    order = sorted(queries, key=lambda slug: green.get(slug, 0))
    queries = {slug: queries[slug] for slug in order}
    oracles = {slug: oracles[slug] for slug in order if slug in oracles}
    return queries, oracles
