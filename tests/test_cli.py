"""CLI migration surface: config.yaml loading + csvdump subcommand wiring."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from airstrik_py_spark.config import load_config

BASE = 1700000000.0


def test_load_reference_config(tmp_path):
    cfg_text = """
think_ahead:
  60
lat_lon_packet_age_max: 10
home:
  lat: 35.7270309
  lon: -78.695587
decimation_factor: 15
decimation_force_new_data: true
utc_time_offset: -4
remember: 60
json_speed: 2
min_trip_length: 90
print_top_planes: 25
mongo_address: "10.0.0.5:27017"
kafka_address: "broker:9092"
filters:
  close: [10, 1000]
  tooclose: [5, 1000]
"""
    p = tmp_path / "config.yaml"
    p.write_text(cfg_text)
    cfg = load_config(str(p))
    assert cfg.home_lat == 35.7270309
    assert cfg.remember_s == 60.0
    assert cfg.most_generous_dist_km == 10.0
    assert [f.name for f in cfg.filters] == ["close", "tooclose"]
    # config.yaml:12,15-16 drop-in fidelity
    assert cfg.json_speed_s == 2.0
    assert cfg.mongo_address == "10.0.0.5:27017"
    assert cfg.kafka_address == "broker:9092"


def test_reference_profile_uses_full_precision_home():
    """config.yaml:5-6 literals, not the 4-dp fixture rounding (a ~40 m
    origin shift on a real deployment)."""
    from airstrik_py_spark.config import REFERENCE, TESTDATA

    assert (REFERENCE.home_lat, REFERENCE.home_lon) == (35.7270309, -78.695587)
    assert (TESTDATA.home_lat, TESTDATA.home_lon) == (35.727, -78.696)


def test_trigger_kwargs_from_json_speed():
    """json_speed -> processingTime trigger (config.yaml:12, airstrik.py:86)."""
    from airstrik_py_spark.__main__ import trigger_kwargs
    from airstrik_py_spark.config import EngineConfig

    assert trigger_kwargs(EngineConfig(json_speed_s=2.0), once=False) == {
        "processingTime": "2.0 seconds"
    }
    assert trigger_kwargs(EngineConfig(json_speed_s=0.0), once=False) == {}
    assert trigger_kwargs(EngineConfig(json_speed_s=2.0), once=True) == {
        "availableNow": True
    }


def test_csvdump_subcommand(tmp_path):
    tape = tmp_path / "tape"
    os.makedirs(tape)
    for i in range(4):
        snap = {
            "now": BASE + 40 * i,
            "aircraft": [
                {"hex": "a1", "flight": "X", "lat": 35.8 + 0.01 * i, "lon": -78.7,
                 "alt_geom": 600.0, "seen": 0.1}
            ],
        }
        (tape / f"s{i}.json").write_text(json.dumps(snap))
    out = tmp_path / "csv"
    res = subprocess.run(
        [sys.executable, "-m", "airstrik_py_spark", "csvdump",
         "--landing-dir", str(tape), "--out", str(out), "--mode", "stats"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files, os.listdir(out)
    header = open(out / files[0]).readline().strip()
    assert header == "day,unique_planes,total_trips,unique_alarm_planes,total_alarm_trips"


def test_dump1090_dir_fallback(tmp_path):
    import argparse

    from airstrik_py_spark.__main__ import _landing
    from airstrik_py_spark.config import load_config

    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("dump1090_dir: '/data/landing'\n")
    cfg = load_config(str(cfg_file))
    assert cfg.dump1090_dir == "/data/landing"
    ns = argparse.Namespace(landing_dir=None)
    assert _landing(ns, cfg) == "/data/landing"
    ns2 = argparse.Namespace(landing_dir="/override")
    assert _landing(ns2, cfg) == "/override"
