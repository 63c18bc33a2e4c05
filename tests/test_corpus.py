"""Unit + invariant tests for the corpus-preparation operators
(operators/corpus.py, similarity.knn_graph) — value-level parity is the
DuckDB oracle's job (tools/check.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from airstrik_py_spark.operators.corpus import (
    PACK_SALT,
    SAMPLE_SALT,
    concat_chunk_pack,
    domain_balance,
    repetition_signals,
)

SF = "/root/testdata/sf0.001"


def docs_df(spark, rows):
    """(doc_id, text[, source]) tuples -> documents-shaped frame."""
    rows = [(i, t, s[0] if s else "src0") for i, t, *s in rows]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_repetition_hand_case(spark):
    out = repetition_signals(docs_df(spark, [(0, "a a a b")])).collect()[0]
    assert out["n_tokens"] == 4
    assert out["dup_word_frac"] == 0.5  # 1 - 2/4
    assert out["top_word_frac"] == 0.75  # 'a' x3
    # 2-grams: a|a, a|a, a|b -> top 2/3
    assert out["top_2gram_frac"] == round(2 / 3, 6)


def test_repetition_all_unique_and_single_token(spark):
    rows = repetition_signals(
        docs_df(spark, [(0, "w x y z"), (1, "solo")])
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["dup_word_frac"] == 0.0
    assert by_id[0]["top_word_frac"] == 0.25
    assert by_id[1]["n_tokens"] == 1
    assert by_id[1]["top_2gram_frac"] == 0.0  # no 2-grams -> explicit 0


def _shard_of(doc_id: int) -> str:
    return hashlib.md5(f"{PACK_SALT}{doc_id}".encode()).hexdigest()[0]


def test_pack_offsets_contiguous_per_shard(spark):
    rows = [(i, " ".join(["tok"] * (5 + i % 7))) for i in range(40)]
    out = concat_chunk_pack(docs_df(spark, rows), seq_len=16).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        expect_start = 0
        for r in docs:
            assert r["shard"] == _shard_of(r["doc_id"])
            assert r["start_off"] == expect_start
            assert r["first_seq"] == r["start_off"] // 16
            assert r["last_seq"] == (r["start_off"] + r["n_tokens"] - 1) // 16
            assert r["split_across"] == (r["last_seq"] > r["first_seq"])
            expect_start += r["n_tokens"]


def test_pack_single_doc_straddles(spark):
    out = concat_chunk_pack(docs_df(spark, [(0, " ".join(["t"] * 10))]), seq_len=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["start_off"], r["first_seq"], r["last_seq"]) == (0, 0, 2)
    assert r["split_across"]


def test_domain_balance_rates_and_determinism(spark):
    # src_small is far under fair share -> rate 1.0 -> every doc kept
    rows = [(i, " ".join(["w"] * 100), "src_big") for i in range(20)]
    rows += [(100, "tiny doc here", "src_small")]
    out = domain_balance(docs_df(spark, rows)).collect()
    small = [r for r in out if r["source"] == "src_small"]
    assert small and all(r["keep_rate"] == 1.0 and r["kept"] for r in small)
    big_rate = {r["keep_rate"] for r in out if r["source"] == "src_big"}
    assert len(big_rate) == 1 and 0.0 < big_rate.pop() < 1.0
    for r in out:
        u16 = int(
            hashlib.md5(f"{SAMPLE_SALT}{r['doc_id']}".encode()).hexdigest()[:4], 16
        )
        assert r["u"] == round(u16 / 65536.0, 6)
        assert r["kept"] == (r["u"] < r["keep_rate"])


def test_knn_graph_stays_in_cluster_and_ranks(spark):
    from airstrik_py_spark.operators.similarity import knn_graph

    # two antipodal clusters -> complementary SRP signatures; Hamming-1
    # probes never bridge an 8-bit flip, so edges stay intra-cluster
    rows = [(i, [1.0 + 0.01 * i] + [0.1] * 63, 0) for i in range(10)]
    rows += [(10 + i, [-1.0 - 0.01 * i] + [-0.1] * 63, 1) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = knn_graph(emb, k=3).collect()
    assert out
    by_src = {}
    for r in out:
        assert (r["src_id"] < 10) == (r["dst_id"] < 10)
        by_src.setdefault(r["src_id"], []).append(r)
    for src, edges in by_src.items():
        edges.sort(key=lambda r: r["rank"])
        assert [e["rank"] for e in edges] == list(range(1, len(edges) + 1))
        cos = [e["cos"] for e in edges]
        assert cos == sorted(cos, reverse=True)


def test_greedy_bins_never_straddle(spark):
    from airstrik_py_spark.operators.corpus import greedy_bin_pack

    rows = [(i, " ".join(["tok"] * (3 + (i * 5) % 11))) for i in range(40)]
    rows.append((99, " ".join(["big"] * 30)))  # oversized: alone in its bin
    out = greedy_bin_pack(docs_df(spark, rows), cap=16).collect()
    assert len(out) == 41
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for docs in by_shard.values():
        fill = {}
        last_bin = 0
        for r in docs:
            # next-fit: bins only move forward, offsets are the running fill
            assert r["bin_idx"] >= last_bin
            last_bin = r["bin_idx"]
            assert r["bin_off"] == fill.get(r["bin_idx"], 0)
            fill[r["bin_idx"]] = r["bin_off"] + r["n_tokens"]
        for b, f in fill.items():
            docs_in_b = [r for r in docs if r["bin_idx"] == b]
            # a bin exceeds cap only when a single oversized doc owns it
            assert f <= 16 or len(docs_in_b) == 1


def test_greedy_bins_hand_case(spark):
    from airstrik_py_spark.operators.corpus import greedy_bin_pack

    # single doc -> shard irrelevant; 3 docs of 6 tokens, cap 16:
    # docs 1,2 share bin 0 (offsets 0,6), doc 3 overflows -> bin 1
    base = 0
    ids = []
    while len(ids) < 3:  # find three doc_ids landing in the SAME shard
        if _shard_of(base) == _shard_of(0):
            ids.append(base)
        base += 1
    rows = [(i, " ".join(["w"] * 6)) for i in ids]
    out = sorted(
        greedy_bin_pack(docs_df(spark, rows), cap=16).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [(r["bin_idx"], r["bin_off"]) for r in out] == [(0, 0), (0, 6), (1, 0)]


def test_semantic_dedup_clusters_min_canonical(spark):
    from airstrik_py_spark.operators.similarity import semantic_dedup

    # near-identical vectors 0-4 (one cluster), 20-22 (another, antipodal),
    # plus isolated noise-free singletons that must NOT appear
    rows = [(i, [1.0 + 0.001 * i] + [0.5] * 63, 0) for i in range(5)]
    rows += [(20 + i, [-1.0 - 0.001 * i] + [-0.5] * 63, 1) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = semantic_dedup(emb, threshold=0.9)
    rows_out = {r["vec_id"]: r for r in out.collect()}
    assert set(rows_out) == {0, 1, 2, 3, 4, 20, 21, 22}
    for vid, r in rows_out.items():
        assert r["cluster_id"] == (0 if vid < 5 else 20)
        assert r["is_canonical"] == (vid in (0, 20))


def test_lm_logprob_hand_case(spark):
    import math

    from airstrik_py_spark.operators.corpus import lm_logprob

    # corpus: 'a a b' + 'b c' -> counts a:2 b:2 c:1, total 5
    out = lm_logprob(docs_df(spark, [(0, "a a b"), (1, "b c")])).collect()
    by_id = {r["doc_id"]: r for r in out}

    def micro(p):
        return round(math.log10(p) * 1e6)

    exp0 = round((2 * micro(2 / 5) + micro(2 / 5)) / (3 * 1e6), 6)
    exp1 = round((micro(2 / 5) + micro(1 / 5)) / (2 * 1e6), 6)
    assert by_id[0]["n_tokens"] == 3 and by_id[0]["avg_logprob10"] == exp0
    assert by_id[1]["n_tokens"] == 2 and by_id[1]["avg_logprob10"] == exp1
    # rarer tokens -> lower score
    assert by_id[1]["avg_logprob10"] < by_id[0]["avg_logprob10"]


def test_length_histogram_hand_case(spark):
    from airstrik_py_spark.operators.corpus import length_histogram

    # token counts: 1, 3, 4, 7 -> buckets 0 (n=1), 1 (n=2: 3), 2 (n=2: 4,7)
    rows = [(0, "w"), (1, "w w w"), (2, "w w w w"), (3, " ".join(["w"] * 7))]
    out = {r["bucket"]: r for r in length_histogram(docs_df(spark, rows)).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0]["lo_tokens"], out[0]["hi_tokens"], out[0]["n_docs"]) == (1, 1, 1)
    assert (out[1]["lo_tokens"], out[1]["hi_tokens"], out[1]["n_docs"]) == (2, 3, 1)
    assert (out[2]["lo_tokens"], out[2]["hi_tokens"], out[2]["n_docs"]) == (4, 7, 2)
    assert out[2]["n_tokens"] == 11
    assert [out[b]["cum_docs"] for b in (0, 1, 2)] == [1, 2, 4]
    assert out[2]["cum_doc_frac"] == 1.0


def test_tfidf_topk_hand_case(spark):
    import math

    from airstrik_py_spark.operators.corpus import tfidf_topk

    # 3 docs; 'c' appears only in doc 2 -> highest idf there; 'a' in all
    # docs -> idf 0 -> tfidf 0 everywhere
    rows = [(0, "a a b"), (1, "a b b"), (2, "a c c c")]
    out = tfidf_topk(docs_df(spark, rows), k=2).collect()
    by = {(r["doc_id"], r["rank"]): r for r in out}
    idf_b = round(math.log10(3 / 2) * 1e6)
    idf_c = round(math.log10(3 / 1) * 1e6)
    # doc 2: c (tf=3) wins with 3*idf_c; then a (tfidf 0)
    assert by[(2, 1)]["token"] == "c" and by[(2, 1)]["tfidf_micro"] == 3 * idf_c
    assert by[(2, 2)]["token"] == "a" and by[(2, 2)]["tfidf_micro"] == 0
    # doc 1: b tf=2 -> 2*idf_b beats a's 0
    assert by[(1, 1)]["token"] == "b" and by[(1, 1)]["tfidf_micro"] == 2 * idf_b
    # doc 0: b tf=1
    assert by[(0, 1)]["token"] == "b" and by[(0, 1)]["tfidf_micro"] == idf_b
    # k=2 cap holds
    assert all(r["rank"] <= 2 for r in out)


def test_chunk_sliding_geometry(spark):
    from airstrik_py_spark.operators.corpus import chunk_sliding

    # 40 tokens, chunk 16 stride 12 -> chunks at 0,12,24 (last = 16 tok)
    # 41 tokens -> extra chunk at 36 with 5 tokens; 5 tokens -> 1 chunk
    toks = lambda n: " ".join(f"t{i}" for i in range(n))
    rows = [(0, toks(40)), (1, toks(41)), (2, toks(5))]
    out = chunk_sliding(docs_df(spark, rows)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [(c["start_tok"], c["n_chunk_tok"]) for c in sorted(by_doc[0], key=lambda c: c["chunk_idx"])] == [
        (0, 16), (12, 16), (24, 16)]
    assert [(c["start_tok"], c["n_chunk_tok"]) for c in sorted(by_doc[1], key=lambda c: c["chunk_idx"])] == [
        (0, 16), (12, 16), (24, 16), (36, 5)]
    assert [(c["start_tok"], c["n_chunk_tok"]) for c in by_doc[2]] == [(0, 5)]
    # chunk text is the exact token slice
    c1 = next(c for c in by_doc[1] if c["chunk_idx"] == 3)
    assert c1["chunk_text"] == "t36 t37 t38 t39 t40"
    # every token of doc 0 is covered by some chunk
    covered = set()
    for c in by_doc[0]:
        covered.update(range(c["start_tok"], c["start_tok"] + c["n_chunk_tok"]))
    assert covered == set(range(40))


def test_quality_topk_matches_unsalted(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from airstrik_py_spark.operators.corpus import quality_topk_per_source
    from airstrik_py_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = quality_topk_per_source(docs, k=4).collect()
    # unsalted single-window reference on the same engine
    from airstrik_py_spark.registry.text_q import q_text_quality  # noqa: F401
    words = F.split("text", " ")
    n_tok = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: (w == "the") | (w == "a")))
    avg_len = (F.length("text") - (n_tok - 1).cast("double")) / n_tok.cast("double")
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    score = F.round(avg_len * 0.1 + (1.0 - stop_ratio) * 0.9, 6)
    ref = (
        docs.select(
            "source", "doc_id",
            F.round(score * F.lit(1_000_000), 0).cast("long").alias("sm"))
        .withColumn("rank", F.row_number().over(
            Window.partitionBy("source").orderBy(F.col("sm").desc(), "doc_id")))
        .filter(F.col("rank") <= 4)
        .collect()
    )
    assert {(r["source"], r["rank"], r["doc_id"]) for r in got} == {
        (r["source"], r["rank"], r["doc_id"]) for r in ref}
    # each source contributes at most k rows and ranks are 1..k contiguous
    per = {}
    for r in got:
        per.setdefault(r["source"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 4 for v in per.values())


def test_lm_perplexity_buckets_order_and_counts(spark):
    from airstrik_py_spark.operators.corpus import lm_perplexity_buckets

    # 6 docs with strictly decreasing fluency: common tokens first
    rows = [
        (0, "a a a a"), (1, "a a a b"), (2, "a a b b"),
        (3, "a b b c"), (4, "b b c c"), (5, "b c c d"),
    ]
    out = lm_perplexity_buckets(docs_df(spark, rows)).collect()
    by_id = {r["doc_id"]: r for r in out}
    # equal-count tiers of 2 over 6 docs
    from collections import Counter
    assert Counter(r["ppl_bucket"] for r in out) == {1: 2, 2: 2, 3: 2}
    # bucket is monotone non-increasing in score
    ordered = sorted(out, key=lambda r: (-r["avg_logprob10"], r["doc_id"]))
    assert [r["ppl_bucket"] for r in ordered] == sorted(
        r["ppl_bucket"] for r in out
    )
    assert by_id[0]["ppl_bucket"] == 1  # most fluent doc is head


def test_embedding_dim_stats_hand_case(spark):
    from airstrik_py_spark.operators.similarity import embedding_dim_stats

    rows = [
        (0, [1.0, -2.0], 0),
        (1, [3.0, 2.0], 0),
        (2, [5.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["dim"]: r for r in embedding_dim_stats(emb).collect()}
    assert set(out) == {0, 1}
    d0, d1 = out[0], out[1]
    assert d0["n"] == 3 and d0["mean"] == 3.0
    # var over [1,3,5] (population) = 8/3
    assert d0["variance"] == round(8 / 3, 6)
    assert (d0["min_micro"], d0["max_micro"]) == (1_000_000, 5_000_000)
    assert d1["mean"] == 0.0 and d1["variance"] == round(8 / 3, 6)
    assert (d1["min_micro"], d1["max_micro"]) == (-2_000_000, 2_000_000)


def test_manifest_counts_consistent(spark):
    from airstrik_py_spark.registry.text_q import q_pipeline_corpus_manifest
    from airstrik_py_spark.sources.tables import load_table

    rows = q_pipeline_corpus_manifest(spark, SF).collect()
    assert rows
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_quality"] <= r["n_docs"]
        assert (r["tokens_kept"] > 0) == (r["n_kept"] > 0)


def test_stratified_sample_exact_quota_and_idempotence(spark):
    from airstrik_py_spark.operators.corpus import stratified_sample_exact

    docs = spark.createDataFrame(
        [(i, f"t {i}", f"s{i % 3}") for i in range(60)],
        "doc_id long, text string, source string",
    )
    a = stratified_sample_exact(docs, quota=5).collect()
    b = stratified_sample_exact(docs, quota=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per.setdefault(r["source"], []).append(r["rank_in_source"])
    assert set(per) == {"s0", "s1", "s2"}
    for ranks in per.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_length_percentiles_ignore_null_n_chars(spark):
    """r6 hardening (ADVICE r5): NULL n_chars must be filtered before the
    rank window (the replaced percentile builtin ignored NULLs; a ranked
    NULL would also order divergently across engines)."""
    from airstrik_py_spark.operators.corpus import length_percentiles

    df = spark.createDataFrame(
        [("en", 10), ("en", 20), ("en", 30), ("en", 40), ("en", None)],
        "lang string, n_chars long",
    )
    row = length_percentiles(df).collect()[0]
    # 4 non-null values; p50 at 0-based pos 1.5 -> 25.0
    assert row["n_docs"] == 4
    assert row["p50_chars"] == 25.0
    assert row["p99_chars"] == 39.7


def test_lm_perplexity_buckets_ntile_arithmetic_edges(spark):
    """r6 distributed-rank rewrite: the arithmetic bucket must match engine
    ntile semantics at the edges — n not divisible by k (first n%k buckets
    one larger) and n < k (first n buckets get one row each)."""
    from collections import Counter

    from airstrik_py_spark.operators.corpus import lm_perplexity_buckets

    # n=7, k=3 -> bucket sizes 3,2,2
    rows7 = [(i, " ".join(["tok"] * (i + 1))) for i in range(7)]
    out = lm_perplexity_buckets(docs_df(spark, rows7), buckets=3).collect()
    assert Counter(r["ppl_bucket"] for r in out) == {1: 3, 2: 2, 3: 2}

    # n=2, k=3 -> buckets 1 and 2 only, one row each
    rows2 = [(0, "a a"), (1, "a b")]
    out2 = lm_perplexity_buckets(docs_df(spark, rows2), buckets=3).collect()
    assert Counter(r["ppl_bucket"] for r in out2) == {1: 1, 2: 1}


def test_char_entropy_hand_cases(spark):
    """'aaaa' -> 0 entropy; 'ab' -> exactly 1 bit; uniform 4-char doc ->
    exactly 2 bits (powers of two avoid rounding in micro units)."""
    from airstrik_py_spark.operators.corpus import char_entropy

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "ab"), (2, "abcd")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert out[0]["entropy_micro"] == 0
    assert out[0]["n_distinct_chars"] == 1 and out[0]["n_chars_counted"] == 4
    assert out[1]["entropy_micro"] == 1_000_000
    assert out[2]["entropy_micro"] == 2_000_000


def test_bm25_hand_case(spark):
    """Two query-term docs: higher tf on a rarer term must outrank; docs
    with no query terms never appear; ranks are dense from 1."""
    from airstrik_py_spark.operators.corpus import bm25_topk

    df = spark.createDataFrame(
        [
            (0, "spark spark spark filler filler"),
            (1, "spark filler filler filler filler"),
            (2, "filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(df, query=("spark",), k=10).collect()
    assert [r["doc_id"] for r in out] == [0, 1]   # tf=3 beats tf=1
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["bm25_micro"] > out[1]["bm25_micro"] > 0


def test_greedy_bins_prefix_stable(spark):
    """The sampled-contract lever (registry/sampled.py pack_greedy_bins):
    packing the doc_id < T prefix must reproduce the full run's placements
    for exactly those docs — next-fit state never looks ahead."""
    from airstrik_py_spark.operators.corpus import greedy_bin_pack

    rows = [(i, " ".join(["tok"] * (1 + (i * 7) % 13))) for i in range(60)]
    full = {
        r["doc_id"]: (r["shard"], r["bin_idx"], r["bin_off"], r["n_tokens"])
        for r in greedy_bin_pack(docs_df(spark, rows), cap=16).collect()
    }
    t = 25
    prefix = {
        r["doc_id"]: (r["shard"], r["bin_idx"], r["bin_off"], r["n_tokens"])
        for r in greedy_bin_pack(
            docs_df(spark, [r for r in rows if r[0] < t]), cap=16
        ).collect()
    }
    assert prefix == {d: v for d, v in full.items() if d < t}


def test_pack_shard_chars_widens(spark):
    """shard_chars is the scale knob (VERDICT r10 #3): wider shards split
    the same docs into more groups, per-shard packing stays next-fit and
    every doc keeps one placement row."""
    from airstrik_py_spark.operators.corpus import greedy_bin_pack

    rows = [(i, " ".join(["tok"] * (1 + i % 9))) for i in range(80)]
    out1 = greedy_bin_pack(docs_df(spark, rows), cap=16, shard_chars=1).collect()
    out2 = greedy_bin_pack(docs_df(spark, rows), cap=16, shard_chars=2).collect()
    assert len(out1) == len(out2) == 80
    shards1 = {r["shard"] for r in out1}
    shards2 = {r["shard"] for r in out2}
    assert all(len(s) == 1 for s in shards1)
    assert all(len(s) == 2 for s in shards2)
    assert len(shards2) >= len(shards1)
    # every 2-char shard group is a refinement of a 1-char group, and
    # within it the placements are a valid next-fit run
    by_shard: dict[str, list] = {}
    for r in sorted(out2, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for docs in by_shard.values():
        fill: dict[int, int] = {}
        for r in docs:
            assert r["bin_off"] == fill.get(r["bin_idx"], 0)
            fill[r["bin_idx"]] = r["bin_off"] + r["n_tokens"]


def test_max_multiplicity_matches_bruteforce(spark):
    """r16: top-term counts come from a sorted run-length fold
    (corpus._max_multiplicity) instead of the O(unique x total) nested
    scan — pin exact equality with brute-force multiset counts on the
    edge shapes (ties, all-same, all-unique, single element)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from airstrik_py_spark.operators.corpus import _max_multiplicity

    cases = [
        ["a", "b", "a", "c", "b", "a"],      # clear winner
        ["t", "t", "u", "u"],                 # tie
        ["only"],                             # single
        ["z"] * 9,                            # all same
        ["p", "q", "r", "s"],                 # all unique
        ["b", "a", "b", "a", "c", "b", "a"],  # tie at 3, unsorted input
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, arr array<string>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select("i", _max_multiplicity(F.col("arr")).alias("m")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == max(Counter(c).values()), (i, c)
