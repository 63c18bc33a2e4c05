"""Output-type lint over every registered oracle (VERDICT r5 #2).

Round-5 root cause: ``corpus_stats_rollup`` was the only oracle of 124 whose
output carried HUGEINT columns (uncast integer ``sum()``), and HUGEINT
materializes lossily on the driver's hash path (float64 via pandas /
decimal128 via Arrow) while ``fetchall()`` hides it — three consecutive
driver-red rounds.  These tests keep the whole class closed:

* no oracle may DESCRIBE to HUGEINT / UHUGEINT / DECIMAL / unsigned columns;
* every oracle's Arrow materialization must canonicalize identically to its
  ``fetchall()`` materialization (null-preserving driver sim);
* the lint itself must still catch a deliberately re-broken rollup oracle.
"""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest

import __spark_entry__ as entrymod
from airstrik_py_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_lint_clean_on_all_oracles():
    proc = subprocess.run(
        [sys.executable, "tools/lint_oracles.py", SF_DIR],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "0 flagged" in proc.stdout


def test_lint_catches_uncast_hugeint_sum(duck):
    """The exact pre-fix corpus_stats_rollup failure shape must be flagged."""
    from tools.lint_oracles import BAD_TYPES

    desc = duck.execute(
        "DESCRIBE SELECT sum(n_chars) AS total_chars FROM documents"
    ).fetchall()
    types = {col: typ for col, typ, *_ in desc}
    assert BAD_TYPES.match(types["total_chars"]), types


def test_rollup_oracle_is_bigint_now(duck):
    sql = entrymod.oracle_sql()["corpus_stats_rollup"]
    desc = duck.execute(f"DESCRIBE {sql}").fetchall()
    types = {col: typ for col, typ, *_ in desc}
    assert types["total_tokens"] == "BIGINT"
    assert types["total_chars"] == "BIGINT"
