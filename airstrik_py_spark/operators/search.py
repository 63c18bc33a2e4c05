"""REPL predicate search — SURVEY.md §2.2 F6, §2.3 J3/J4.

The reference's `search_command` (dbread.py:78-122) evaluates per-field
comparison predicates over each plane's attribute histories and matches a
plane when ALL predicates hit at the SAME timestamp (set intersection of
matching ts, dbread.py:114-118).  Relationally that is an INTERSECT of the
per-predicate (key, ts) sets — Catalyst plans it as a hash-based semi join
per predicate; each leg pushes its own filter into the scan.
"""

from __future__ import annotations

import operator
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# dbread.py:81 — the REPL's comparison-operator table
OPS = {
    ">": operator.gt,
    "<": operator.lt,
    "=": operator.eq,
    ">=": operator.ge,
    "<=": operator.le,
}


def predicate_ts_sets(
    obs_df: DataFrame, predicates: Sequence[tuple[str, str, float]]
) -> DataFrame:
    """J3 — the (hex, ts) conjunction set: timestamps at which every
    predicate holds simultaneously (dbread.py:114-118)."""
    legs = []
    for field, op, value in predicates:
        cond = OPS[op](F.col(field), F.lit(value))
        legs.append(obs_df.filter(cond).select("hex", "ts_sec", "event_id"))
    out = legs[0]
    for leg in legs[1:]:
        out = out.intersect(leg)
    return out


def search_planes(
    obs_df: DataFrame, predicates: Sequence[tuple[str, str, float]]
) -> DataFrame:
    """F6 — planes where all predicates co-occur at one timestamp
    (search_command, dbread.py:78-122)."""
    return predicate_ts_sets(obs_df, predicates).select("hex").distinct()
