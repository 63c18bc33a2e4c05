"""Round-6 second-wave operators: winnowing guarantee, containment
asymmetry, DSIR brute-force parity, triplet tie rules, acquisition-split
identities, bounce composition, and the new star shapes."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark, texts, langs=None):
    rows = [
        (i, t, (langs[i] if langs else "en"), "src0", len(t))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# ---------------------------------------------------------------- winnowing


def _brute_winnow(words, w=4):
    """Reference winnowing: min-hash per window, rightmost-wins ties —
    straight from the SIGMOD'03 definition, no window functions."""
    kgrams = [
        "|".join(words[i : i + 3]) for i in range(len(words) - 2)
    ]
    if not kgrams:
        return None
    hashes = [hashlib.md5(k.encode()).hexdigest() for k in kgrams]
    m = len(hashes)
    starts = range(1, max(m - w + 1, 0) + 1) if m >= w else [1]
    sel = set()
    for s in starts:
        frame = hashes[s - 1 : s - 1 + w]
        mn = min(frame)
        # rightmost occurrence of the min within the frame
        ridx = max(i for i, h in enumerate(frame) if h == mn)
        sel.add((mn, s + ridx))
    return m, sel


words_strategy = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=3,
    max_size=24,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_words=st.lists(words_strategy, min_size=1, max_size=4))
def test_winnow_matches_bruteforce(spark, docs_words):
    from airstrik_py_spark.operators.winnow import winnow_fingerprints

    df = _docs(spark, [" ".join(ws) for ws in docs_words])
    got = {r["doc_id"]: r for r in winnow_fingerprints(df).collect()}
    for i, ws in enumerate(docs_words):
        m, sel = _brute_winnow(ws)
        assert got[i]["n_kgrams"] == m
        assert got[i]["n_fps"] == len(sel)


def test_winnow_shared_run_guarantee(spark):
    """Docs sharing a run of >= k + w - 1 = 6 words share >= 1 selected
    fingerprint HASH (the winnowing theorem)."""
    from airstrik_py_spark.operators.winnow import winnow_fingerprints

    shared = "one two three four five six seven eight"
    df = _docs(
        spark,
        [f"aa bb cc {shared}", f"{shared} xx yy zz"],
    )
    # recompute the selected hash sets brute-force to inspect overlap
    t0, t1 = [r["text"] for r in df.orderBy("doc_id").collect()]
    _, s0 = _brute_winnow(t0.split(" "))
    _, s1 = _brute_winnow(t1.split(" "))
    assert {h for h, _ in s0} & {h for h, _ in s1}
    out = winnow_fingerprints(df).collect()
    assert len(out) == 2  # and the operator agrees on counts
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_fps"] == len(s0) and by_id[1]["n_fps"] == len(s1)


def test_winnow_short_doc_single_window(spark):
    """A doc with fewer than w k-grams still fingerprints: one whole-doc
    window -> exactly 1 fingerprint."""
    from airstrik_py_spark.operators.winnow import winnow_fingerprints

    out = winnow_fingerprints(_docs(spark, ["a b c d"])).collect()
    assert len(out) == 1
    assert out[0]["n_kgrams"] == 2
    assert out[0]["n_fps"] == 1


# -------------------------------------------------------------- containment


def test_containment_detects_excerpt(spark):
    """A verbatim excerpt inside a larger doc: containment(A in B) = 1.0
    even though Jaccard is far below any dedup threshold."""
    from airstrik_py_spark.operators.dedup import ngram_containment_pairs

    excerpt = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"w{i}" for i in range(60))
    df = _docs(spark, [excerpt, f"{filler} {excerpt}"])
    rows = ngram_containment_pairs(df, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["c_a_in_b"] == 1.0
    assert r["c_b_in_a"] < 0.5


def test_containment_identical_docs_both_one(spark):
    from airstrik_py_spark.operators.dedup import ngram_containment_pairs

    t = "alpha beta gamma delta epsilon zeta eta theta"
    rows = ngram_containment_pairs(_docs(spark, [t, t]), threshold=0.9).collect()
    assert len(rows) == 1
    assert rows[0]["c_a_in_b"] == 1.0 and rows[0]["c_b_in_a"] == 1.0


# --------------------------------------------------------------------- DSIR


def test_dsir_matches_bruteforce(spark):
    from airstrik_py_spark.operators.corpus import DSIR_BUCKETS, dsir_weights

    texts = [
        "spark window hash join",
        "le chat noir dort",
        "spark spark shuffle",
        "der hund läuft schnell",
    ]
    langs = ["en", "fr", "en", "de"]
    df = _docs(spark, texts, langs)
    got = {r["doc_id"]: (r["n_tok"], r["dsir_micro"]) for r in dsir_weights(df).collect()}

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    ct, cr = {}, {}
    for txt, lg in zip(texts, langs):
        for t in txt.split(" "):
            b = bucket(t)
            cr[b] = cr.get(b, 0) + 1
            if lg == "en":
                ct[b] = ct.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    lr = {
        b: round(
            (
                math.log((ct.get(b, 0) + 1) / (tt + DSIR_BUCKETS))
                - math.log((cr[b] + 1) / (tr + DSIR_BUCKETS))
            )
            * 1_000_000.0
        )
        for b in cr
    }
    for i, txt in enumerate(texts):
        toks = txt.split(" ")
        want = sum(lr[bucket(t)] for t in toks)
        assert got[i] == (len(toks), want)


def test_dsir_target_tokens_score_higher(spark):
    """Tokens exclusive to the target slice must carry positive log-ratio
    weight; tokens exclusive to non-target, negative."""
    from airstrik_py_spark.operators.corpus import dsir_weights

    df = _docs(
        spark,
        ["good good good good", "bad bad bad bad"],
        ["en", "fr"],
    )
    got = {r["doc_id"]: r["dsir_micro"] for r in dsir_weights(df).collect()}
    assert got[0] > 0 > got[1]


# ------------------------------------------------------------ triplet mining


def test_triplet_mine_bruteforce_and_ties(spark):
    from airstrik_py_spark.operators.similarity import triplet_mine

    # anchor 0 (label 0); two same-label candidates tie on rounded cosine
    # (identical vectors) -> lowest vec_id wins; hardest negative is the
    # most-similar different-label vector.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.6, 0.8], 0),   # same label, cos 0.6
        (2, [0.6, 0.8], 0),   # same label, cos 0.6 (tie with 1)
        (3, [0.9, 0.1], 1),   # diff label, cos ~0.9938
        (4, [0.0, 1.0], 1),   # diff label, cos 0
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = triplet_mine(emb, anchor_mod=100).collect()
    assert len(out) == 1
    r = out[0]
    assert r["anchor_id"] == 0
    assert r["pos_id"] == 1  # tie on cos -> lowest vec_id
    assert abs(r["pos_cos"] - 0.6) < 1e-9
    assert r["neg_id"] == 3
    assert r["neg_cos"] > 0.99


# ------------------------------------------------------- events engagement


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h, mi, 0), u, et, 1.0, "{}")
            for i, (d, h, mi, u, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_new_vs_returning_identities(spark):
    from airstrik_py_spark.operators.events import new_vs_returning

    ev = _events(
        spark,
        [
            (1, 9, 0, 1, "view"),
            (1, 10, 0, 2, "view"),
            (2, 9, 0, 1, "view"),   # returning
            (2, 9, 5, 1, "click"),  # same user+day, no double count
            (2, 9, 0, 3, "view"),   # new on day 2
        ],
    )
    out = {r["day"]: r for r in new_vs_returning(ev).collect()}
    assert out["2024-01-01"]["n_new"] == 2
    assert out["2024-01-01"]["n_returning"] == 0
    assert out["2024-01-02"]["n_new"] == 1
    assert out["2024-01-02"]["n_returning"] == 1
    for r in out.values():
        assert r["n_new"] + r["n_returning"] == r["dau"]


def test_session_bounce_composition(spark):
    """One multi-event session + one single-event session on the same day:
    2 sessions, 1 bounce, rate 0.5; midnight-spanning sessions bucket to
    their start day."""
    from airstrik_py_spark.operators.events import session_bounce_stats

    ev = _events(
        spark,
        [
            (1, 9, 0, 1, "view"),
            (1, 9, 10, 1, "click"),  # same session (10 min gap)
            (1, 12, 0, 2, "view"),   # bounce
            (1, 23, 50, 3, "view"),  # session starts Jan 1 ...
        ],
    ) .union(
        spark.createDataFrame(
            [(99, dt.datetime(2024, 1, 2, 0, 10, 0), 3, "click", 1.0, "{}")],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
    )
    out = {r["day"]: r for r in session_bounce_stats(ev).collect()}
    assert list(out) == ["2024-01-01"]
    r = out["2024-01-01"]
    assert r["n_sessions"] == 3
    assert r["n_bounces"] == 1
    assert abs(r["bounce_rate"] - round(1 / 3, 6)) < 1e-9


# ---------------------------------------------------------------- star shapes


def test_top_supplier_is_argmax_with_all_ties(spark):
    from airstrik_py_spark.operators.star import Q15_END, Q15_START, top_supplier

    out = top_supplier(spark, SF).collect()
    assert out
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
            ).alias("rev")
        )
    )
    mx = li.agg(F.max("rev")).collect()[0][0]
    winners = {r["l_suppkey"] for r in li.filter(F.col("rev") == mx).collect()}
    assert {r["s_suppkey"] for r in out} == winners
    assert all(r["total_rev_units"] == mx for r in out)


def test_acctbal_cube_grouping_identities(spark):
    from airstrik_py_spark.operators.star import acctbal_cube

    rows = acctbal_cube(spark, SF).collect()
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    leaf_total = sum(r["total_acctbal_cents"] for r in rows if r["gid"] == 0)
    assert grand[0]["total_acctbal_cents"] == leaf_total
    # the two single-axis subtotal sets each re-sum to the grand total
    for gid in (1, 2):
        assert (
            sum(r["total_acctbal_cents"] for r in rows if r["gid"] == gid)
            == leaf_total
        )


def test_market_share_bounds_and_totals(spark):
    from airstrik_py_spark.operators.star import market_share

    rows = market_share(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["nation_units"] <= r["total_units"]
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_revenue_cumshare_monotone_to_one(spark):
    from airstrik_py_spark.operators.star import revenue_cumshare

    rows = revenue_cumshare(spark, SF).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    for rs in by_region.values():
        rs.sort(key=lambda r: r["month"])
        cum = 0
        for r in rs:
            cum += r["month_cents"]
            assert r["cum_cents"] == cum
        assert rs[-1]["cum_share"] == 1.0


# ------------------------------------------------------- token allocation


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.integers(min_value=1, max_value=40), min_size=2, max_size=6),
)
def test_token_allocation_hamilton_invariants(spark, toks):
    """sum(alloc) == budget exactly; every source gets floor or floor+1 of
    its exact quota (Hamilton's method stays in quota)."""
    from airstrik_py_spark.operators.corpus import token_allocation

    texts = [" ".join(f"t{i}x{j}" for j in range(n)) for i, n in enumerate(toks)]
    rows = [(i, t, "en", f"s{i}", len(t)) for i, (t, n) in enumerate(zip(texts, toks))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    budget = 1000
    out = token_allocation(df, budget=budget).collect()
    total_tok = sum(toks)
    assert sum(r["alloc_tokens"] for r in out) == budget
    for r in out:
        q = budget * r["n_tokens"] / total_tok
        assert math.floor(q) <= r["alloc_tokens"] <= math.floor(q) + 1


def test_token_allocation_remainder_tiebreak(spark):
    """Equal remainders: the extra token goes to the ascending-source
    winner."""
    from airstrik_py_spark.operators.corpus import token_allocation

    # two sources, 1 token each, budget 3 -> quotas 1.5/1.5, one leftover
    df = spark.createDataFrame(
        [(0, "a", "en", "sA", 1), (1, "b", "en", "sB", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r["alloc_tokens"] for r in token_allocation(df, budget=3).collect()}
    assert out == {"sA": 2, "sB": 1}


# --------------------------------------------------- minhash jaccard estimate


def test_minhash_est_identical_docs_full_match(spark):
    from airstrik_py_spark.operators.dedup import minhash_jaccard_estimate

    t = "alpha beta gamma delta epsilon zeta"
    out = minhash_jaccard_estimate(_docs(spark, [t, t])).collect()
    assert len(out) == 1
    assert out[0]["n_sig_match"] == 6
    assert out[0]["jaccard_est"] == 1.0


def test_minhash_est_bounded_and_candidate_only(spark):
    """Estimates stay in [0,1]; pairs only exist for band-collisions (a
    subset of all pairs)."""
    from airstrik_py_spark.operators.dedup import minhash_jaccard_estimate

    texts = [
        "one two three four five six seven",
        "one two three four five six eight",
        "completely different words here now ok",
    ]
    rows = minhash_jaccard_estimate(_docs(spark, texts)).collect()
    for r in rows:
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert 1 <= r["n_sig_match"] <= 6
    assert {(r["doc_a"], r["doc_b"]) for r in rows} <= {(0, 1), (0, 2), (1, 2)}
    assert (0, 1) in {(r["doc_a"], r["doc_b"]) for r in rows}


# ------------------------------------------------------------- winnow pairs


def test_winnow_pairs_detects_two_shared_runs(spark):
    from airstrik_py_spark.operators.winnow import winnow_pairs

    run1 = "one two three four five six seven eight"
    run2 = "red orange yellow green blue indigo violet ultra"
    df = _docs(
        spark,
        [
            f"{run1} filler0a filler0b {run2}",
            f"pre1 pre2 pre3 {run1} mid1 mid2 mid3 {run2} post1",
        ],
    )
    rows = winnow_pairs(df).collect()
    assert len(rows) == 1
    assert rows[0]["doc_a"] == 0 and rows[0]["doc_b"] == 1
    assert rows[0]["n_shared"] >= 2


def test_winnow_pairs_df_cap_drops_boilerplate(spark):
    """A fingerprint shared by more than df_max docs leaves the index —
    boilerplate can't explode the pair join."""
    from airstrik_py_spark.operators.winnow import winnow_pairs

    boiler = "this legal notice appears on every single page verbatim"
    df = _docs(spark, [f"{boiler} doc{i}tail{i}" for i in range(4)])
    assert winnow_pairs(df, min_shared=1, df_max=3).count() == 0
    assert winnow_pairs(df, min_shared=1, df_max=10).count() == 6
