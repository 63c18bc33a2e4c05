"""t2 queries for the REPL search path: F6 predicate search, J3 timestamp
conjunction, J4 obs-to-state join (SURVEY §2.2/§2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airstrik_py_spark.operators import search as SR
from airstrik_py_spark.oracle.exprs import session_ctes
from airstrik_py_spark.registry.kinematics_q import TS_FMT_DUCK, TS_FMT_SPARK
from airstrik_py_spark.session import pin_session
from airstrik_py_spark.sources.tables import observations

# The showcase predicate set (dbread README example `alt>500 dist<10 alarm=1`
# re-expressed on the observation columns): lat > 35.727 AND alt_geom < 1000 —
# partially-overlapping sets, so the ts-intersection is non-trivial.
PREDICATES = (("lat", ">", 35.727), ("alt_geom", "<", 1000.0))

_CTES = session_ctes(21600.0)
_LEGS = """
leg1 AS (SELECT hex, ts_sec, event_id FROM obs WHERE lat > 35.727),
leg2 AS (SELECT hex, ts_sec, event_id FROM obs WHERE alt_geom < 1000.0),
conj AS (SELECT * FROM leg1 INTERSECT SELECT * FROM leg2)
"""


def q_predicate_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — planes where every predicate matches at the same timestamp
    (search_command, dbread.py:78-122)."""
    pin_session(spark)
    return SR.search_planes(observations(spark, sf_dir), PREDICATES)


def q_join_ts_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — the per-plane timestamp-set intersection itself
    (dbread.py:114-118)."""
    pin_session(spark)
    conj = SR.predicate_ts_sets(observations(spark, sf_dir), PREDICATES)
    return conj.groupBy("hex").agg(
        F.count("*").alias("n_matching_ts"),
        F.round(F.min("ts_sec"), 6).alias("first_match_sec"),
        F.round(F.max("ts_sec"), 6).alias("last_match_sec"),
    )


def q_join_obs_to_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — each observation joined to its running per-key state (the
    plane_history[hex] lookup, airstrik.py:569, 627): fix counter, first-seen
    time, running closest approach."""
    pin_session(spark)
    from airstrik_py_spark.config import TESTDATA
    from airstrik_py_spark.operators.kinematics import with_distance_home

    obs = with_distance_home(observations(spark, sf_dir), TESTDATA)
    w = Window.partitionBy("hex").orderBy("ts_sec", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return obs.select(
        "hex",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
        F.row_number().over(w).alias("fix_number"),
        F.round(F.first("ts_sec").over(run), 6).alias("first_seen_sec"),
        F.min("distance").over(run).alias("running_min_dist"),
    )


QUERIES = {
    "predicate_search": q_predicate_search,
    "join_ts_conjunction": q_join_ts_conjunction,
    "join_obs_to_state": q_join_obs_to_state,
}

ORACLES = {
    "predicate_search": f"""
WITH {_CTES},
{_LEGS}
SELECT DISTINCT hex FROM conj
""",
    "join_ts_conjunction": f"""
WITH {_CTES},
{_LEGS}
SELECT hex, count(*) AS n_matching_ts,
       round(min(ts_sec), 6) AS first_match_sec,
       round(max(ts_sec), 6) AS last_match_sec
FROM conj GROUP BY hex
""",
    "join_obs_to_state": f"""
WITH {_CTES}
SELECT hex, strftime(ts, '{TS_FMT_DUCK}') AS ts_str,
       CAST(row_number() OVER w AS INTEGER) AS fix_number,
       round(first_value(ts_sec) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS first_seen_sec,
       min(distance) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_min_dist
FROM obsd
WINDOW w AS (PARTITION BY hex ORDER BY ts_sec, event_id)
""",
}
