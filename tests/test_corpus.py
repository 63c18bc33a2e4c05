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
