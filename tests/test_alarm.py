"""D1/D2/F2 alarm tests: approach -> warning with eta, inside -> alert eta 0,
retreat -> no alarm; eta <= think_ahead property (SURVEY §5.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airstrik_py_spark.config import REFERENCE
from airstrik_py_spark.operators import alarm as AL
from airstrik_py_spark.operators import kinematics as K
from tests.conftest import obs_rows

BASE = 1700000000.0
CFG = REFERENCE  # home 35.727,-78.696; zone 10 km; think_ahead 60 s


def _state(spark, rows):
    df = obs_rows(spark, rows)
    kin = K.with_distance_home(
        K.with_calc_speed(K.with_calc_heading(df), CFG), CFG
    )
    latest = K.latest_per_key(
        kin,
        ["lat", "lon", "flight", "nav_heading", "alt_geom", "seen",
         "calc_heading", "calc_speed", "distance"],
    ).join(
        kin.select("hex", "ts_sec", "event_id").groupBy("hex").agg(
            F.max("event_id").alias("event_id")
        ),
        "hex",
    )
    return latest


def test_approaching_plane_warns_with_eta(spark):
    # ~13 km due south of home, moving north at ~1070 km/h -> enters the
    # 10 km zone ~11 s into the simulated minute
    rows = [
        ("a", BASE + 0, None, 35.727 - 0.20, -78.696, None, 500.0, 1),
        ("a", BASE + 30, None, 35.727 - 0.12, -78.696, None, 500.0, 1),
    ]
    out = AL.dead_reckoning(_state(spark, rows), CFG).first()
    assert out["can_sim"]
    assert out["alarm"]
    assert 0 < out["alarm_time"] <= CFG.think_ahead
    assert out["min_radius"] < 10.0


def test_retreating_plane_never_alarms(spark):
    rows = [
        ("a", BASE + 0, None, 35.727 + 0.18, -78.696, None, 500.0, 1),
        ("a", BASE + 30, None, 35.727 + 0.20, -78.696, None, 500.0, 1),  # moving away
    ]
    out = AL.dead_reckoning(_state(spark, rows), CFG).first()
    assert not out["alarm"]
    assert out["alarm_time"] == -1
    assert out["min_radius"] == AL.MIN_RADIUS_SENTINEL


def test_no_heading_no_alarm(spark):
    rows = [("a", BASE + 0, None, 35.80, -78.696, None, 500.0, 1)]  # single fix
    out = AL.dead_reckoning(_state(spark, rows), CFG).first()
    assert not out["can_sim"]
    assert not out["alarm"]
    assert out["alarm_time"] == -1
    assert out["min_radius"] == 0.0  # airstrik.py:254 returns 0 sentinel


def test_altitude_gate_blocks_alarm(spark):
    rows = [
        ("a", BASE + 0, None, 35.727 - 0.20, -78.696, None, 5000.0, 1),
        ("a", BASE + 30, None, 35.727 - 0.12, -78.696, None, 5000.0, 1),  # too high
    ]
    out = AL.dead_reckoning(_state(spark, rows), CFG).first()
    assert out["alarm_ll"]  # trajectory does enter
    assert not out["alarm"]  # but altitude 5000 > 1000 (airstrik.py:272-275)


def test_payload_routing_alert_vs_warning(spark):
    rows = [
        # inside the zone now -> alert, eta 0
        ("in", BASE + 0, "X1", 35.727, -78.696, None, 500.0, 1),
        ("in", BASE + 30, "X1", 35.73, -78.696, None, 500.0, 1),
        # approaching -> warning with positive eta
        ("nr", BASE + 0, "X2", 35.727 - 0.20, -78.696, None, 500.0, 1),
        ("nr", BASE + 30, "X2", 35.727 - 0.12, -78.696, None, 500.0, 1),
    ]
    state = AL.dead_reckoning(_state(spark, rows), CFG)
    pay = {r["plane_hex"]: r for r in AL.alarm_payload(state, CFG).collect()}
    assert pay["in"]["topic"] == "airstrik-alert" and pay["in"]["eta"] == 0
    assert pay["nr"]["topic"] == "airstrik-warning" and pay["nr"]["eta"] > 0


def test_matched_filters_expression(spark):
    df = spark.createDataFrame(
        [(4.0, 500.0), (8.0, 500.0), (8.0, 2000.0), (50.0, 500.0), (4.0, None)],
        "dist double, alt double",
    )
    out = df.select(
        AL.matched_filters(F.col("dist"), F.col("alt"), CFG).alias("m")
    ).collect()
    assert [r["m"] for r in out] == [
        "close,tooclose",  # within both
        "close",  # within 10 only
        "",  # altitude blocks both
        "",  # too far
        "close,tooclose",  # unknown altitude passes (airstrik.py:421)
    ]
