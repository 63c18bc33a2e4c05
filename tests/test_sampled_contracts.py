"""Structural gate for registry/sampled.py contracts (r10).

The sampled sf-scale gate is only as sound as its contract strings — a
typo in a count_sql or a restricted oracle that no longer matches the
value oracle's CTE names would surface as a confusing sf10 failure hours
into a sweep.  Pin the cheap invariants here instead:

- every contract is for a registered slug and has exactly one of
  {views, sql, skip};
- every count_sql executes on DuckDB at sf0.001 and returns one
  BIGINT-able row (and the count matches the slug's own value-oracle
  row count there — the closed-form argument at its smallest scale);
- every restricted `sql` still executes and is a strict restriction
  (row count <= the full oracle's) at sf0.001;
- every `filter_sql` names only columns of the slug's output.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from airstrik_py_spark.registry.sampled import contracts
from airstrik_py_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    d = duckdb.connect()
    for t in TABLES:
        d.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return d


@pytest.fixture(scope="module")
def cons():
    return contracts()


def test_contracts_reference_registered_slugs(cons):
    qs = entrymod.queries()
    unknown = [s for s in cons if s not in qs]
    assert unknown == []


def test_contract_shape(cons):
    for slug, c in cons.items():
        kinds = [k for k in ("views", "sql", "skip") if k in c]
        assert len(kinds) == 1, f"{slug}: expected exactly one of views/sql/skip, got {kinds}"
        if "skip" not in c:
            assert "filter_sql" in c, f"{slug}: sampled contract needs filter_sql"
            assert "note" in c, f"{slug}: sampled contract needs a soundness note"


def test_count_sql_matches_value_oracle_rowcount(cons, duck):
    oracles = entrymod.oracle_sql()
    checked = 0
    for slug, c in cons.items():
        if "count_sql" not in c:
            continue
        (expected,) = duck.execute(c["count_sql"]).fetchone()
        got = len(duck.execute(oracles[slug]).fetchall())
        assert int(expected) == got, f"{slug}: count_sql={expected} oracle rows={got}"
        checked += 1
    assert checked >= 7  # the sessions family (r10 expect_rows cohort)


def test_restricted_sql_is_a_restriction(cons, duck):
    """Restricted oracle rows must be a sub-multiset of the full oracle's
    rows (ADVICE r10) — a rowcount-only check would pass a drifted
    predicate returning the right NUMBER of wrong rows."""
    from tools.check import canon_rows

    oracles = entrymod.oracle_sql()
    for slug, c in cons.items():
        if "sql" not in c:
            continue
        fcur = duck.execute(oracles[slug])
        fcols = [d[0] for d in fcur.description]
        frows = fcur.fetchall()
        rcur = duck.execute(c["sql"])
        rcols = [d[0] for d in rcur.description]
        rrows = rcur.fetchall()
        assert len(rrows) <= len(frows), (
            f"{slug}: restricted ({len(rrows)}) > full ({len(frows)})")
        assert sorted(rcols) == sorted(fcols), (
            f"{slug}: restricted columns {sorted(rcols)} != full {sorted(fcols)}")
        full_canon = canon_rows(fcols, frows)
        restr_canon = canon_rows(rcols, rrows)
        not_subset = restr_canon - full_canon
        assert not not_subset, (
            f"{slug}: restricted oracle emits rows absent from the full "
            f"oracle (first 3): {list(not_subset.items())[:3]}")


def test_filter_sql_names_output_columns(cons, duck):
    oracles = entrymod.oracle_sql()
    for slug, c in cons.items():
        if "filter_sql" not in c or slug not in oracles:
            continue
        cols = [d[0] for d in duck.execute(
            f"SELECT * FROM ({oracles[slug]}) LIMIT 0"
        ).description]
        # apply the engine-side filter text on the oracle output via SQL —
        # it must parse and reference only real output columns
        duck.execute(
            f"SELECT * FROM ({oracles[slug]}) WHERE {c['filter_sql']} LIMIT 1"
        )
        assert cols  # oracle yields a schema at all
