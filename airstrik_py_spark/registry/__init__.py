"""Query registry: every SURVEY.md §2 slug maps to a (Spark callable, DuckDB
oracle SQL) pair.  Submodules register into QUERIES/ORACLES; __spark_entry__
re-exports the merged dicts for the driver."""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "kinematics_q",
    "sessions_q",
    "alarm_q",
    "alarm_q",
    "stats_q",
    "search_q",
    "sinks_q",
    "dedup_q",
    "similarity_q",
    "text_q",
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(f"airstrik_py_spark.registry.{mod_name}")
        except ModuleNotFoundError:
            continue
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles
