"""Independent-derivation pin for the decimation oracle (VERDICT r9 #4).

r10 switched the REGISTERED filter_decimation / sink_mongo_decimated
oracles from the packet-by-packet RECURSIVE fold (depth = longest trip;
blew the 900 s budget on the adversarial 200k-row hot hex) to the same
closed-form cadence the engine uses.  That costs the engine-vs-oracle
independence the fold provided, so this test restores it where it is
cheap: the fold and the closed form are two derivations of
airstrik.py:574-626, and they must agree row-for-row on the real
fixtures.  DuckDB-only — no Spark session needed.
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import duckdb
import pytest

from airstrik_py_spark.registry.sinks_q import (
    _CTES,
    CFG,
    _decim_closed_ctes,
    _decim_fold_ctes,
)
from airstrik_py_spark.sources.tables import TABLES

SELECT = """
SELECT hex, session_id, update_seq, ts_sec, event_id,
       round(lat, 6) AS lat, round(lat_sec, 6) AS lat_sec,
       round(lon, 6) AS lon, round(lon_sec, 6) AS lon_sec
FROM counted
"""


def _run(con, ctes: str, recursive: bool):
    kw = "WITH RECURSIVE" if recursive else "WITH"
    rows = con.execute(f"{kw} {_CTES},\n{ctes}\n{SELECT}").fetchall()
    return Counter(tuple(map(repr, r)) for r in rows)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_fold_equals_closed_form(sf_dir):
    if not Path(sf_dir).exists():
        pytest.skip(f"{sf_dir} absent")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n, force = CFG.decimation_factor, CFG.decimation_force_new_data
    fold = _run(con, _decim_fold_ctes(n, force), recursive=True)
    closed = _run(con, _decim_closed_ctes(n, force), recursive=False)
    assert fold == closed
    assert sum(fold.values()) > 0  # the fixture must actually exercise writes


@pytest.mark.parametrize("force_new", [False, True])
def test_fold_equals_closed_form_both_force_modes(force_new):
    """The force_new branch only shifts the first write one packet right;
    pin both modes on the small fixture regardless of CFG's setting."""
    sf_dir = "/root/testdata/sf0.001"
    if not Path(sf_dir).exists():
        pytest.skip(f"{sf_dir} absent")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n = CFG.decimation_factor
    fold = _run(con, _decim_fold_ctes(n, force_new), recursive=True)
    closed = _run(con, _decim_closed_ctes(n, force_new), recursive=False)
    assert fold == closed


def test_factor_zero_is_empty():
    sf_dir = "/root/testdata/sf0.001"
    if not Path(sf_dir).exists():
        pytest.skip(f"{sf_dir} absent")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    closed = _run(con, _decim_closed_ctes(0, False), recursive=False)
    assert sum(closed.values()) == 0
