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


def test_srcstate_hash_sensitive_to_semantic_edits_only():
    """VERDICT r14 #4: the per-file hash is the docstring-normalized AST —
    a comment or docstring edit must NOT change any slug hash (in r14 a
    docstring scope note on codecs.py stale-marked eight expensive sf10
    rows), while a code edit (new statement, changed constant) must."""
    roots = ["airstrik_py_spark.operators.decimation"]
    h1 = srcstate.closure_hash(roots, srcstate.read_worktree)

    def edited(suffix):
        def read(rel):
            src = srcstate.read_worktree(rel)
            if src is not None and rel == "airstrik_py_spark/operators/decimation.py":
                return src + suffix
            return src
        return read

    assert srcstate.closure_hash(roots, edited("\n# tweak\n")) == h1
    assert srcstate.closure_hash(roots, edited("\n_X = 1\n")) != h1

    # editing the module's REAL leading docstring must not change the hash
    import ast

    real = srcstate.read_worktree("airstrik_py_spark/operators/decimation.py")
    doc = ast.get_docstring(ast.parse(real))
    assert doc, "fixture module lost its docstring"

    def docstring_edited(rel):
        src = srcstate.read_worktree(rel)
        if src is not None and rel == "airstrik_py_spark/operators/decimation.py":
            return src.replace(doc, doc + " (edited)")
        return src

    assert srcstate.closure_hash(roots, docstring_edited) == h1


def test_comment_only_edit_leaves_every_slug_hash_unchanged():
    """The r14 incident end-to-end (VERDICT r14 #4 'Done' criterion): a
    comment-only edit to functions/codecs.py must leave EVERY slug's
    closure hash — hence every SCALE_LEDGER sf10/sf1 row — fresh.
    scale_ledger.state_of is exactly `hash_at(sha) == current`, so equal
    slug_hashes on both sides IS ledger freshness."""
    roots = slug_roots()
    before = srcstate.slug_hashes(roots)

    def commented(rel):
        src = srcstate.read_worktree(rel)
        if src is not None and rel == "airstrik_py_spark/functions/codecs.py":
            return "# leading comment\n" + src + "\n# trailing comment\n"
        return src

    after = srcstate.slug_hashes(roots, read=commented)
    assert after == before

    # and the converse guard: the r14 edit itself (a changed comparison
    # constant inside jpeg_decode's guard) WOULD still re-mark the slugs
    # whose closure contains codecs.py
    def recoded(rel):
        src = srcstate.read_worktree(rel)
        if src is not None and rel == "airstrik_py_spark/functions/codecs.py":
            return src.replace("0xD0 <= marker <= 0xD8", "0xD0 <= marker <= 0xD7")
        return src

    changed = srcstate.slug_hashes(roots, read=recoded)
    assert changed != before


def test_pinned_cohort_is_computed_oldest():
    """VERDICT r14 #5: the pin is generated, not hand-edited — the committed
    _FORCE_WINDOW must equal tools/rotate.py's oldest-driver-evidence
    cohort exactly (order included), re-derived from the CORRECTNESS
    evidence the pin block says it consumed (the stamp keeps this test
    green when the driver lands a NEWER correctness file at round close;
    the round-start `python tools/rotate.py` refresh re-stamps)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.rotate import compute_cohort, stamped_round

    through = stamped_round()
    assert through is not None, "pin block lost its CORRECTNESS_rN stamp"
    cohort, _last = compute_cohort(through_round=through)
    assert tuple(cohort) == _FORCE_WINDOW
