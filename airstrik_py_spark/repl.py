"""Interactive query layer — the dbread.py REPL (SURVEY §3.2) as thin
dispatch over Spark SQL.

The reference parses `field op value` tokens into lambda predicates and
full-scans Mongo client-side (dbread.py:78-122); here every command compiles
to a DataFrame/SQL plan, so pushdown/pruning/joins come from Catalyst.  The
`last_planes` result cache (dbread.py:121-122) becomes a temp view.

Commands (dbread.py:180-187 dispatch table):
  list            -> store enumeration + per-plane trip counts
  search <preds>  -> F6 predicate search; caches view `last_search`
  dump <path>     -> S9 JSON dump of the last search
  drop <view>     -> S10 temp-view drop
Multi-statement `a & b` supported like dbread.py:194.
"""

from __future__ import annotations

import shlex

from pyspark.sql import DataFrame, SparkSession

from airstrik_py_spark.operators.search import OPS, search_planes
from airstrik_py_spark.sinks import write_json


class Repl:
    def __init__(self, spark: SparkSession, obs: DataFrame, trips: DataFrame):
        self.spark = spark
        self.obs = obs
        self.trips = trips
        obs.createOrReplaceTempView("obs")
        trips.createOrReplaceTempView("trips")

    def execute(self, line: str) -> list[DataFrame]:
        """Run one input line; `&`-separated statements run in order
        (dbread.py:194)."""
        return [self._dispatch(part.strip()) for part in line.split(" & ")]

    def _dispatch(self, stmt: str) -> DataFrame:
        cmd, *args = shlex.split(stmt)
        if cmd == "list":
            return self.spark.sql(
                "SELECT flight_id, count(*) AS n_trips, sum(n_obs) AS n_msgs "
                "FROM trips GROUP BY flight_id ORDER BY flight_id"
            )
        if cmd == "search":
            preds = [self._parse_pred(a) for a in args]
            out = search_planes(self.obs, preds)
            out.createOrReplaceTempView("last_search")
            return out
        if cmd == "dump":
            matched = self.spark.table("last_search").join(self.obs, "hex")
            write_json(matched, args[0])
            return matched
        if cmd == "drop":
            self.spark.catalog.dropTempView(args[0])
            return self.spark.sql("SHOW VIEWS")
        if cmd == "sql":  # escape hatch the reference never had
            return self.spark.sql(stmt[4:])
        raise ValueError(f"unknown command: {cmd}")

    @staticmethod
    def _parse_pred(token: str) -> tuple[str, str, float]:
        """`alt_geom>500` -> (field, op, value) (dbread.py:84-94)."""
        for op in (">=", "<=", ">", "<", "="):
            if op in token:
                field, val = token.split(op, 1)
                if op not in OPS:
                    raise ValueError(f"bad operator in {token!r}")
                return field, op, float(val)
        raise ValueError(f"unparseable predicate: {token!r}")
