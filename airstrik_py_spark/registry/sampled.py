"""Sampled-verification contracts for oracle-expensive lanes (VERDICT r8 #4).

At sf10 a handful of DuckDB oracles are infeasible (hours / >48 GB) even
though the ENGINE side runs fine — the wall is oracle cost, not engine
capability (SCALE.md §4b).  For those lanes tools/check.py --sampled swaps
the full bit-exact compare for this documented contract:

  1. Spark runs the FULL query at the full sf — the full row count and
     schema are recorded in the report.  Where the contract carries
     ``count_sql`` (a closed-form count over the oracle's OWN cheap CTE
     prefix — the trips-shaped sessions family), the full count is
     VERIFIED against it (mismatch = FAIL; count-oracle timeout degrades
     to recorded-only).  Elsewhere the count stays informational; only
     the sampled slice is value-verified.
  2. The oracle runs a key-RESTRICTED equivalent that is affordable, via
     one of two mechanisms:
       * ``views``  — re-create an input view with a deterministic key
         predicate.  Sound only for per-key-decomposable queries: every
         CTE in the oracle partitions by (a function of) that key, so
         restricting the input to sampled keys yields exactly the full
         output restricted to those keys.  The per-slug comment states
         the decomposability argument.
       * ``sql``    — a hand-written restricted oracle (used when only one
         side of a self-join may be restricted, e.g. the kNN probe side).
  3. Spark's full output is filtered ENGINE-SIDE (``filter_sql`` on the
     output columns) to the same sampled keys and compared bit-exact —
     same canonicalization as the full gate.  The full count comes from
     a separate count() so the driver never materializes the full
     multi-million-row result (at sf10 the collect-everything form
     drove the checker to an OOM kill).

A slug whose oracle is infeasible at scale AND has no sound restricted
form carries an explicit ``skip`` contract instead: check.py reports it
as a documented SKIP (with the engine still run FULL when the engine side
is scale-valid, so the row count is recorded), never as a raw OOM/FAIL
and never silently passed.  A slug with no contract here and an
infeasible oracle is reported as a timeout SKIP.
"""

from __future__ import annotations

# Deterministic sampling moduli.  Keys in these fixtures are dense
# integers (events.user_id; embeddings.vec_id), so plain modulus is an
# unbiased deterministic sample that both engines express identically.
HEX_MOD = 10  # sessions/as-of family: 1-in-10 planes
VEC_MOD = 41  # kNN probe side: 1-in-41 source vectors
PACK_PREFIX_T = 2048  # greedy packing: verify the doc_id < T prefix


def _hex_filter(col: str) -> str:
    # hex is the stringified user_id; filter the FULL Spark output down
    # to the sampled keys ENGINE-SIDE so check.py never collects the
    # multi-million-row full result (the r9 sf10 OOM lesson)
    return f"CAST({col} AS BIGINT) % {HEX_MOD} = 0"


def _vec_filter(col: str) -> str:
    return f"{col} % {VEC_MOD} = 0"


def _events_views() -> dict[str, str]:
    return {"events": f"user_id % {HEX_MOD} = 0"}


def contracts() -> dict[str, dict]:
    """slug -> {views|sql, keep, note}.  Import is deferred so this module
    stays cheap for the driver path (check.py-only consumer)."""
    from airstrik_py_spark.operators import similarity as SIM
    from airstrik_py_spark.registry.similarity_q import _KNN_CTES

    # The sessions/as-of family: every oracle CTE chain (obs -> sess ->
    # trips -> asof_*) partitions and groups by hex = CAST(user_id AS
    # VARCHAR) and joins dims (nation) per-hex, so restricting events to
    # sampled user_ids produces exactly the full result restricted to
    # those hexes.
    sessions_family = {
        "window_session_trip": "hex",
        "filter_min_trip_length": "hex",
        "agg_argmin_closest": "hex",
        "join_asof_closest": "hex",
        "agg_first_callsign": "hex",
        "join_icao_enrichment": "hex",
        "agg_trip_assembly": "flight_id",
        "filter_geofence_match": "hex",
        "window_alarm_transitions": "hex",
        "project_first_pair": "hex",
        "sink_mongo_trip": "flight_id",
        "sink_mongo_decimated": "flight_id",
        "filter_decimation": "hex",
        "project_flatten_csv": "flight_id",
    }
    out: dict[str, dict] = {
        slug: {
            "views": _events_views(),
            "filter_sql": _hex_filter(col),
            "note": f"events restricted to user_id%{HEX_MOD}=0; "
            f"hex-decomposable (all CTEs partition by hex)",
        }
        for slug, col in sessions_family.items()
    }

    # Closed-form FULL-count oracles (expect_rows, ADVICE r9): for slugs
    # whose output cardinality is a trivial function of a CHEAP prefix of
    # their own oracle CTE chain (linear windows — no as-of joins), the
    # full Spark row count is verified against `count_sql` run on the FULL
    # views, upgrading the sampled contract from "count recorded" to
    # "count verified".  The strings reuse the oracle's own _CTES constant,
    # so they cannot drift from the value oracle.  Slugs whose count needs
    # the expensive part (as-of joins, decimation fold, alarm sim) get no
    # count_sql — their count stays informational.
    from airstrik_py_spark.registry.sessions_q import _CTES as _SESS_CTES
    from airstrik_py_spark.registry.sessions_q import CFG as _SESS_CFG

    _trips_count = f"WITH {_SESS_CTES} SELECT count(*) AS n FROM trips"
    for slug in (
        "window_session_trip",   # one row per trip
        "agg_argmin_closest",    # one row per trip
        "agg_first_callsign",    # one row per trip
        "join_icao_enrichment",  # LEFT JOIN to unique-key nation: 1:1
    ):
        out[slug]["count_sql"] = _trips_count
    out["filter_min_trip_length"]["count_sql"] = (
        f"WITH {_SESS_CTES} SELECT count(*) AS n FROM trips"
        f" WHERE end_sec - start_sec >= {_SESS_CFG.min_trip_length_s}"
    )
    out["filter_geofence_match"]["count_sql"] = (
        f"WITH {_SESS_CTES} SELECT count(*) AS n FROM obsd"
    )
    out["project_first_pair"]["count_sql"] = (
        f"WITH {_SESS_CTES} SELECT count(DISTINCT hex) AS n FROM obs"
    )

    # kNN graph: edges of source v depend on the FULL candidate corpus,
    # so only the PROBE side may be restricted — hand-written SQL with
    # the probe CTE filtered to sampled vec_ids; candidates stay full.
    knn_sampled = _KNN_CTES.replace(
        "FROM sk, sigw),",
        f"FROM sk, sigw WHERE vec_id % {VEC_MOD} = 0),",
    )
    assert f"% {VEC_MOD} = 0" in knn_sampled
    out["knn_graph_bucketed"] = {
        "sql": f"WITH {knn_sampled}\nSELECT src_id, dst_id, cos, rank FROM knn",
        "filter_sql": _vec_filter("src_id"),
        "note": f"probe side restricted to vec_id%{VEC_MOD}=0, candidate "
        "corpus full - per-source decomposable",
    }

    # Triplet mining: each anchor's hardest positive/negative depend on
    # the FULL corpus but not on other anchors — restrict the anchor CTE,
    # keep the candidate side full.
    from airstrik_py_spark.registry.analytics_q import ORACLES as _an
    from airstrik_py_spark.registry.analytics_q import TRIPLET_ANCHOR_MOD

    # Banded cosine pairs: pair (a, b) is emitted once with id_a < id_b,
    # and each pair's verdict depends only on the two vectors + band keys
    # — restricting the a-side samples pairs by their lower id.
    from airstrik_py_spark.registry.dedup_q import ORACLES as _dd

    on_clause = "ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id"
    cos_sql = _dd["embedding_cosine_banded_candidates"].replace(
        on_clause, on_clause + f" AND a.vec_id % {VEC_MOD} = 0"
    )
    assert f"AND a.vec_id % {VEC_MOD} = 0" in cos_sql
    out["embedding_cosine_banded_candidates"] = {
        "sql": cos_sql,
        "filter_sql": _vec_filter("id_a"),
        "note": f"a-side restricted to vec_id%{VEC_MOD}=0 - per-pair "
        "decomposable on the lower id",
    }

    # Documented sf-scale SKIPs (VERDICT r9 #3) — lanes whose oracle has no
    # sound restricted form:
    #
    # dedup_semantic: (r11) skip RETIRED in two steps — the thin knn fixed
    # the edge-build OOM, then the closure RECURSION (reachable-pair
    # materialization, quadratic per component, non-spilling) was replaced
    # by the engine's own min-label propagation, unrolled with pointer
    # doubling and a convergence-poison guard
    # (similarity_q._semantic_oracle).  FULL bit-exact PASS at sf10:
    # 149 541 rows in 337 s whole-slug.  No contract — the full compare
    # runs at every sf.
    # graph_pagerank_knn: PageRank mass flows over EVERY edge, so no
    # restriction of the knn edge build is sound — but none is needed:
    # (r11) skip RETIRED: the thin-candidate + pre-window-projection knn
    # oracle rewrite (similarity_q._KNN_CTES) dropped the full oracle from
    # a 44.7 GiB OOM to ~9.5 GB peak, and the whole slug passes FULL
    # bit-exact at sf10 in ~183 s (200 000 rows).  No contract needed —
    # the full compare runs at every sf.
    # dedup_embedding_cosine_hi: the high-recall low-threshold PAIR-MINING
    # contract is rho-gap-bound (rho=0.66 at t=0.4) — candidate volume is a
    # constant fraction of N^2 BY CONTRACT on both engine and oracle, so
    # neither side should run at 100x; cosine_topk_pairs is the registered
    # scale-valid replacement.  SCALE-GATED (VERDICT r11 #2): the skip is an
    # argument about 100x candidate volume, so it only applies once the
    # embeddings table is actually large — below skip_min_rows the N^2
    # fraction is trivially affordable and check.py drops the contract,
    # running the normal FULL bit-exact compare (sf0.01 = 500 rows, sf0.1 =
    # 2 000 rows both verify; sf1 = 20 000 and sf10 = 200 000 skip).
    out["dedup_embedding_cosine_hi"] = {
        "skip": "contract is rho-gap-bound (high recall at t=0.4 forces a "
        "constant fraction of all pairs as candidates on BOTH engines) — "
        "not run at 100x by design; cosine_topk_pairs is the scale lane",
        "spark": "none",
        "skip_table": "embeddings",
        "skip_min_rows": 10_000,
    }

    # Winnowing pair mining: pair (a, b) is emitted once with
    # doc_a < doc_b and its verdict (shared fingerprint count) depends
    # only on the two docs' fingerprint sets — restricting the a-side
    # samples pairs by their lower id, exactly the embedding_cosine_banded_candidates
    # argument.  Needed at sf10: the full self-join's hash table exceeds
    # the oracle memory cap even on a fresh spilling connection (r10
    # sf10_r10b finding); the linear fingerprint CTEs stay full.
    from airstrik_py_spark.registry.analytics_q import ORACLES as _aw

    w_on = "FROM sh2 a JOIN sh2 b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id"
    winnow_sql = _aw["dedup_winnow_pairs"].replace(
        w_on, w_on + f" AND a.doc_id % {VEC_MOD} = 0"
    )
    assert f"AND a.doc_id % {VEC_MOD} = 0" in winnow_sql
    out["dedup_winnow_pairs"] = {
        "sql": winnow_sql,
        "filter_sql": f"doc_a % {VEC_MOD} = 0",
        "note": f"a-side restricted to doc_id%{VEC_MOD}=0 - per-pair "
        "decomposable on the lower id",
    }

    # pack_greedy_bins (VERDICT r10 #3): next-fit packing is PREFIX-STABLE
    # (operators/corpus.py::greedy_bin_pack docstring, pinned by
    # tests/test_corpus.py): a doc's placement depends only on earlier
    # docs in its shard, and shard order is doc_id order — so restricting
    # documents to the doc_id < T prefix reproduces the full run's
    # placements for exactly those docs.  This bounds the recursive-CTE
    # replay to ~T/16 iterations per shard instead of N/16 (the r10 sf10
    # >900s timeout).  Full count is closed-form: one placement row per
    # document.
    from airstrik_py_spark.registry.text_q import ORACLES as _tx

    pack_sql = _tx["pack_greedy_bins"].replace(
        "FROM documents)", f"FROM documents WHERE doc_id < {PACK_PREFIX_T})"
    )
    assert f"doc_id < {PACK_PREFIX_T}" in pack_sql
    out["pack_greedy_bins"] = {
        "sql": pack_sql,
        "filter_sql": f"doc_id < {PACK_PREFIX_T}",
        "note": f"documents restricted to the doc_id<{PACK_PREFIX_T} prefix "
        "- next-fit placements are prefix-stable per shard",
        "count_sql": "SELECT count(*) FROM documents",
    }

    # multimodal_decode_real: payload bytes and features are a pure
    # function of doc_id — per-document decomposable, so a documents-view
    # restriction is exact.  Full count is one feature row per document.
    out["multimodal_decode_real"] = {
        "views": {"documents": f"doc_id % {VEC_MOD} = 0"},
        "filter_sql": f"doc_id % {VEC_MOD} = 0",
        "note": f"documents restricted to doc_id%{VEC_MOD}=0; per-document "
        "decomposable (features are a pure function of doc_id)",
        "count_sql": "SELECT count(*) FROM documents",
    }

    # multimodal_resize_real: same per-document decomposability argument
    # as decode_real (r12 sibling lane — decode + stride-2 subsample is
    # still a pure function of doc_id).
    out["multimodal_resize_real"] = {
        "views": {"documents": f"doc_id % {VEC_MOD} = 0"},
        "filter_sql": f"doc_id % {VEC_MOD} = 0",
        "note": f"documents restricted to doc_id%{VEC_MOD}=0; per-document "
        "decomposable (resized features are a pure function of doc_id)",
        "count_sql": "SELECT count(*) FROM documents",
    }

    # alarm_dead_reckoning_exact: the D1 unroll partitions by hex end to
    # end (kinematics windows, step windows on (hex, event_id), the final
    # per-plane aggregate) and dims are broadcast — the same
    # hex-decomposability as the sessions family, so an events-view
    # restriction is exact.  Output is one row per plane: count is the
    # full distinct-hex count.
    out["alarm_dead_reckoning_exact"] = {
        "views": _events_views(),
        "filter_sql": _hex_filter("hex"),
        "note": f"events restricted to user_id%{HEX_MOD}=0; "
        "hex-decomposable (all windows partition by hex)",
        "count_sql": "SELECT count(DISTINCT user_id) FROM events",
    }

    anchor_where = f"FROM e WHERE vec_id % {TRIPLET_ANCHOR_MOD} = 0"
    trip = _an["embedding_triplet_mine"].replace(
        anchor_where, anchor_where + f" AND vec_id % {VEC_MOD} = 0"
    )
    assert f"AND vec_id % {VEC_MOD} = 0" in trip
    out["embedding_triplet_mine"] = {
        "sql": trip,
        "filter_sql": _vec_filter("anchor_id"),
        "note": f"anchors restricted to vec_id%{VEC_MOD}=0, candidate "
        "corpus full - per-anchor decomposable",
    }
    return out
