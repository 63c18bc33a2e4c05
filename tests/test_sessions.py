"""W5/F3/A2/A4/J2 sessionization tests (FIXTURES.md A1: gap-separated runs,
short trips dropped, argmin first-wins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airstrik_py_spark.config import EngineConfig
from airstrik_py_spark.operators import kinematics as K
from airstrik_py_spark.operators import sessions as S
from tests.conftest import obs_rows

CFG = EngineConfig(remember_s=60.0, min_trip_length_s=90.0)
BASE = 1700000000.0


def _sessioned(spark, rows):
    df = obs_rows(spark, rows)
    return S.with_session_id(K.with_distance_home(df, CFG), CFG)


def test_session_split_on_gap(spark):
    rows = [
        ("a", BASE + 0, "X", 35.7, -78.7, 0.0, 500.0, 1),
        ("a", BASE + 50, "X", 35.8, -78.7, 0.0, 500.0, 1),
        ("a", BASE + 200, "X", 35.9, -78.7, 0.0, 500.0, 1),  # gap 150 > 60
        ("a", BASE + 240, "X", 36.0, -78.7, 0.0, 500.0, 1),
    ]
    trips = S.trips(_sessioned(spark, rows), CFG).orderBy("session_id").collect()
    assert len(trips) == 2
    assert trips[0]["n_obs"] == 2 and trips[1]["n_obs"] == 2
    assert trips[0]["end_sec"] == BASE + 50
    assert trips[1]["start_sec"] == BASE + 200


def test_exact_gap_does_not_split(spark):
    rows = [
        ("a", BASE + 0, None, 35.7, -78.7, 0.0, 500.0, 1),
        ("a", BASE + 60, None, 35.8, -78.7, 0.0, 500.0, 1),  # gap == remember
    ]
    trips = S.trips(_sessioned(spark, rows), CFG).collect()
    assert len(trips) == 1  # close requires gap STRICTLY > remember


def test_min_trip_length_gate(spark):
    rows = [
        ("short", BASE + 0, None, 35.7, -78.7, 0.0, 500.0, 1),
        ("short", BASE + 50, None, 35.8, -78.7, 0.0, 500.0, 1),  # 50 s < 90 s
        ("long", BASE + 0, None, 35.7, -78.7, 0.0, 500.0, 1),
        ("long", BASE + 95, None, 35.8, -78.7, 0.0, 500.0, 1),
    ]
    # use a no-gap config so both planes have one session each
    cfg = EngineConfig(remember_s=1000.0, min_trip_length_s=90.0)
    df = obs_rows(spark, rows)
    sess = S.with_session_id(K.with_distance_home(df, cfg), cfg)
    kept = S.filter_min_trip_length(S.trips(sess, cfg), cfg).collect()
    assert [r["flight_id"] for r in kept] == ["long"]


def test_argmin_closest_first_wins_tie(spark):
    # two fixes at the identical distance: the EARLIER ts must win
    rows = [
        ("a", BASE + 0, None, 35.8, -78.696, 0.0, 500.0, 1),
        ("a", BASE + 10, None, 35.727, -78.696, 0.0, 500.0, 1),  # dist 0
        ("a", BASE + 20, None, 35.727, -78.696, 0.0, 500.0, 1),  # dist 0 again
    ]
    t = S.trips(_sessioned(spark, rows), CFG).first()
    assert t["closest_dist"] == 0.0
    assert t["closest_sec"] == BASE + 10  # strict-< first-wins (airstrik.py:495)


def test_first_callsign_stripped(spark):
    rows = [
        ("a", BASE + 0, None, 35.7, -78.7, 0.0, 500.0, 1),
        ("a", BASE + 10, "DAL 88", 35.8, -78.7, 0.0, 500.0, 1),
        ("a", BASE + 20, "OTHER", 35.9, -78.7, 0.0, 500.0, 1),
    ]
    t = S.trips(_sessioned(spark, rows), CFG).first()
    assert t["callsign"] == "DAL88"  # first non-null, whitespace stripped


def test_asof_state_at_closest(spark):
    rows = [
        ("a", BASE + 0, "EARLY", 35.9, -78.696, 0.0, 800.0, 1),
        ("a", BASE + 10, None, 35.727, -78.696, 0.0, 600.0, 1),  # closest here
        ("a", BASE + 20, "LATE", 36.0, -78.696, 0.0, 400.0, 1),
    ]
    t = S.trips_with_asof(_sessioned(spark, rows), CFG).first()
    assert t["asof_alt"] == 600.0  # value at closest ts, not after
    assert t["asof_flight"] == "EARLY"  # last non-null at/before closest
