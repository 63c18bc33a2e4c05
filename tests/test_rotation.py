"""Rotation-order invariants for the driver-window registry ordering.

The driver records only the first ~50 queries() entries per round, so
collect() must enumerate (1) the hand-pinned re-certification cohort, then
(2) slugs whose source hash changed since their last driver-green row
(VERDICT r9 #1 — a recently-green slug rewritten since is the stalest
evidence of all), then (3) least-recently-driver-green with fewest-greens
as the tie-break.  These tests run against the repo's real
CORRECTNESS_r*.json history and green_hashes.json sidecar — no Spark
session needed.
"""

from __future__ import annotations

from airstrik_py_spark.registry import (
    _FORCE_WINDOW,
    _driver_green_history,
    changed_since_green,
    collect,
    slug_roots,
)
from airstrik_py_spark.registry import srcstate


def test_collect_orders_pinned_then_changed_then_recency():
    queries, oracles = collect()
    full, rows_only, last_full, last_rows_only = _driver_green_history()
    changed = changed_since_green()
    pin = {slug: i for i, slug in enumerate(_FORCE_WINDOW)}
    keys = []
    for slug in queries:
        last = max(
            last_full.get(slug, 0),
            last_rows_only.get(slug, 0) if slug not in oracles else 0,
        )
        green = full.get(slug, 0) + (
            rows_only.get(slug, 0) if slug not in oracles else 0
        )
        keys.append(
            (pin.get(slug, len(_FORCE_WINDOW)), 0 if changed.get(slug) else 1, last, green)
        )
    assert keys == sorted(keys), "collect() must be pinned, changed, then LRG first"


def test_force_window_leads():
    queries, _ = collect()
    head = list(queries)[: len(_FORCE_WINDOW)]
    assert head == list(_FORCE_WINDOW)


def test_every_slug_has_oracle_and_callable():
    queries, oracles = collect()
    assert set(oracles) <= set(queries)
    # every registered slug currently carries an oracle (census invariant);
    # if a genuinely non-SQL-expressible slug is ever added, update the
    # census block too (tools/census.py prints the rows-only list)
    assert set(queries) == set(oracles)
    assert all(callable(fn) for fn in queries.values())


def test_oracle_order_follows_query_order():
    queries, oracles = collect()
    q_order = [s for s in queries if s in oracles]
    assert list(oracles) == q_order


def test_sidecar_hashes_match_current_for_unchanged():
    """A sidecar entry whose hash equals the current hash must be reported
    unchanged, and vice versa — the changed flag is exactly hash
    inequality (missing entry counts as changed)."""
    side = srcstate.load_sidecar()
    cur = srcstate.slug_hashes(slug_roots())
    changed = changed_since_green()
    for slug, h in cur.items():
        assert changed[slug] == (side.get(slug, {}).get("hash") != h)


def test_srcstate_closure_covers_operator_rewrites():
    """The r9 failure mode: an operators/similarity.py rewrite must change
    the hash of slugs whose registry module imports it."""
    roots = slug_roots()
    files = srcstate.dep_closure(sorted(roots["embedding_cosine_banded_candidates"]))
    assert "airstrik_py_spark/operators/similarity.py" in files
    # oracle composed in a different module than the callable definition:
    # extras_q re-registers dedup_q's q_dedup_clusters
    files2 = srcstate.dep_closure(sorted(roots["dedup_clusters"]))
    assert "airstrik_py_spark/registry/extras_q.py" in files2
    assert "airstrik_py_spark/registry/dedup_q.py" in files2
    # rotation plumbing must NOT be in any closure (editing the rotation
    # policy is not a semantic change to any slug)
    assert "airstrik_py_spark/registry/__init__.py" not in files
    assert "airstrik_py_spark/registry/srcstate.py" not in files


def test_srcstate_hash_sensitive_to_content():
    h1 = srcstate.closure_hash(
        ["airstrik_py_spark.operators.decimation"], srcstate.read_worktree
    )

    def tweaked(rel):
        src = srcstate.read_worktree(rel)
        if src is not None and rel == "airstrik_py_spark/operators/decimation.py":
            return src + "\n# tweak\n"
        return src

    h2 = srcstate.closure_hash(["airstrik_py_spark.operators.decimation"], tweaked)
    assert h1 != h2


def test_pinned_cohort_is_computed_oldest():
    """VERDICT r14 #5: the pin is generated, not hand-edited — the committed
    _FORCE_WINDOW must equal tools/rotate.py's oldest-driver-evidence
    cohort exactly (order included)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.rotate import compute_cohort

    cohort, _last = compute_cohort()
    assert tuple(cohort) == _FORCE_WINDOW
