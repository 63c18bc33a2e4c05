"""Empty-input engine/oracle parity for the auto-width knn lanes.

ADVICE r9: on an EMPTY embeddings table the sigw CTE computed
ceil(log2(0/20.0)) -> -inf and CAST(-inf AS INTEGER) errors in DuckDB,
while Spark's auto_srp_bits returns SRP_BITS for n <= 0 — the engines
diverged (oracle error vs empty result).  The greatest(count(*), 1) guard
makes both sides yield the same EMPTY result.  DuckDB-only here (the
Spark side's n <= 0 branch is a pure-Python unit check) — no session
needed.
"""

from __future__ import annotations

import duckdb
import pytest

from airstrik_py_spark.operators import similarity as SIM
from airstrik_py_spark.registry.similarity_q import ORACLES


def _empty_embeddings(con) -> None:
    con.execute(
        "CREATE VIEW embeddings AS "
        "SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS VARCHAR) AS label, "
        "CAST(NULL AS FLOAT[]) AS embedding WHERE false"
    )


def test_auto_srp_bits_floor():
    assert SIM.auto_srp_bits(0) == SIM.SRP_BITS
    assert SIM.auto_srp_bits(1) == SIM.SRP_BITS
    assert SIM.auto_srp_bits(-5) == SIM.SRP_BITS


@pytest.mark.parametrize("slug", ["knn_graph_bucketed", "dedup_semantic"])
def test_knn_oracles_run_on_empty_embeddings(slug):
    con = duckdb.connect()
    _empty_embeddings(con)
    cols_rows = con.execute(ORACLES[slug]).fetchall()
    assert cols_rows == []


def test_knn_width_matches_python_at_n1():
    """greatest(count(*),1) must clamp to the same SRP_BITS floor as
    auto_srp_bits for tiny corpora (n=1)."""
    con = duckdb.connect()
    occ = SIM.SRP_TARGET_OCCUPANCY
    w = con.execute(
        f"SELECT least(greatest(CAST(ceil(log2(greatest(count(*), 1) / {occ})) AS INTEGER), "
        f"{SIM.SRP_BITS}), {SIM.SRP_MAX_BITS}) FROM (SELECT 1 AS x)"
    ).fetchone()[0]
    assert w == SIM.auto_srp_bits(1) == SIM.SRP_BITS
