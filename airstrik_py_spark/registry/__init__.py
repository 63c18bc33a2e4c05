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

# VERDICT r13 #5 hand-pin (rotation hygiene — the same rule landed the
# whole r9-stale trip cohort green in CORRECTNESS_r13): these eight §2
# slugs now carry the oldest driver evidence in the registry (r11/r12;
# everything else is >= r13).  All eight pass the local sweep; the pin
# guarantees they win window slots in the r14 driver run regardless of
# how many slugs the conservative module-level source hash marks
# changed.  Refresh once CORRECTNESS_r14 records them.
_FORCE_WINDOW = (
    "source_snapshot_ingest",
    "ddl_drop_reset",
    "filter_liveness",
    "filter_nonempty",
    "window_dedup_consecutive",
    "window_calc_heading",
    "window_calc_speed",
    "window_distance_home",
)


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


def slug_roots() -> dict[str, frozenset[str]]:
    """Per-slug hash-basis root modules for srcstate: the module DEFINING
    the query callable plus the module(s) REGISTERING the query and its
    oracle (they differ when extras_q re-registers dedup_q/similarity_q
    callables or composes their oracle text)."""
    roots: dict[str, set[str]] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(f"airstrik_py_spark.registry.{mod_name}")
        except ModuleNotFoundError:
            continue
        for slug, fn in getattr(mod, "QUERIES", {}).items():
            roots.setdefault(slug, set()).update(
                {fn.__module__, f"airstrik_py_spark.registry.{mod_name}"}
            )
        for slug in getattr(mod, "ORACLES", {}):
            roots.setdefault(slug, set()).add(
                f"airstrik_py_spark.registry.{mod_name}"
            )
    return {slug: frozenset(r) for slug, r in roots.items()}


def changed_since_green() -> dict[str, bool]:
    """slug -> True when the slug's source hash differs from the hash
    recorded at its last driver-green row (srcstate sidecar).  A missing
    sidecar entry counts as changed — never-certified-at-this-source leads
    the window."""
    from airstrik_py_spark.registry import srcstate

    cur = srcstate.slug_hashes(slug_roots())
    side = srcstate.load_sidecar()
    return {
        slug: side.get(slug, {}).get("hash") != h for slug, h in cur.items()
    }


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
    # Stable rotation (VERDICT r6 #1 + r9 #1): hand-pinned cohort first,
    # then slugs whose SOURCE CHANGED since their last driver-green row
    # (hash sidecar, srcstate.py — a recently-green slug rewritten since is
    # the stalest evidence of all), then least-recently-driver-green (never-
    # green sorts as round 0 and therefore leads its class), then fewest
    # green rows, then insertion order.  Rows-only rows count as green only
    # while the slug still lacks an oracle; once one is registered the slug
    # re-enters the window to earn its first hash-verified row.
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
    changed = changed_since_green()
    pin = {slug: i for i, slug in enumerate(_FORCE_WINDOW)}
    order = sorted(
        queries,
        key=lambda slug: (
            pin.get(slug, len(_FORCE_WINDOW)),
            0 if changed.get(slug) else 1,
            last.get(slug, 0),
            green.get(slug, 0),
        ),
    )
    queries = {slug: queries[slug] for slug in order}
    oracles = {slug: oracles[slug] for slug in order if slug in oracles}
    return queries, oracles
