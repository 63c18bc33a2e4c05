"""Corpus-cleaning operators: duplicated-n-gram coverage, PII redaction,
event sessionization, mixture weights, shuffle layout."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from airstrik_py_spark.operators.cleaning import (
    dup_ngram_coverage,
    pii_redact,
)
from airstrik_py_spark.operators.corpus import mixture_weights, shuffle_layout
from airstrik_py_spark.operators.events import sessionize_events


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )


def test_dup_ngram_coverage_hand_case(spark):
    # doc0 and doc1 share the 3-gram "a b c"; doc2 is all-unique;
    # doc3 is too short for any 3-gram and must be absent.
    out = {
        r["doc_id"]: r
        for r in dup_ngram_coverage(
            _docs(
                spark,
                ["a b c d", "x a b c", "p q r s", "one two"],
            ),
            3,
        ).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0]["n_shingles"] == 2 and out[0]["n_dup"] == 1
    assert out[0]["dup_coverage"] == 0.5
    assert out[1]["n_dup"] == 1
    assert out[2]["n_dup"] == 0 and out[2]["dup_coverage"] == 0.0


def test_dup_ngram_coverage_counts_distinct_docs_not_instances(spark):
    # a shingle repeated WITHIN one doc only is not "duplicated":
    # shingles() is distinct per doc, so df=1.
    out = dup_ngram_coverage(_docs(spark, ["a b c z a b c"]), 3).collect()
    assert all(r["n_dup"] == 0 for r in out)


def test_pii_redact_masks_and_counts(spark):
    df = _docs(
        spark,
        [
            "mail me at jo.doe@corp.io now",
            "host 192.168.0.1 and 10.0.0.2 up",
            "call 919-555-0100",
            "clean text only",
        ],
    )
    out = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert out[0]["n_emails"] == 1 and "<EMAIL>" in out[0]["redacted"]
    assert "jo.doe" not in out[0]["redacted"]
    assert out[1]["n_ips"] == 2 and out[1]["redacted"].count("<IP>") == 2
    assert out[2]["n_phones"] == 1 and "<PHONE>" in out[2]["redacted"]
    r3 = out[3]
    assert (r3["n_emails"], r3["n_ips"], r3["n_phones"]) == (0, 0, 0)
    assert r3["redacted"] == "clean text only"


def test_sessionize_strict_gap_boundary(spark):
    # gaps: exactly 10s (same session, strict >), 11s (new session)
    rows = [
        (0, 0.0, 7),
        (1, 10.0, 7),
        (2, 21.0, 7),
        (3, 5.0, 8),
    ]
    ev = spark.createDataFrame(
        [
            (eid, datetime.utcfromtimestamp(t), uid, "view", 1.0, None)
            for eid, t, uid in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = sessionize_events(ev, gap_s=10)
    got = {
        (r["user_id"], r["session_n"]): r for r in out.collect()
    }
    assert set(got) == {(7, 1), (7, 2), (8, 1)}
    s1 = got[(7, 1)]
    assert s1["n_events"] == 2 and s1["duration_us"] == 10_000_000
    assert got[(7, 2)]["n_events"] == 1


def test_mixture_weights_normalized_and_monotone(spark):
    docs = _docs(spark, ["w " * 99 + "w", "x"]).withColumn(
        "source", F.concat(F.lit("s"), F.col("doc_id"))
    )
    out = {r["source"]: r for r in mixture_weights(docs, alpha=0.5).collect()}
    assert abs(out["s0"]["mix_weight"] + out["s1"]["mix_weight"] - 1.0) < 1e-6
    # alpha=0.5 compresses: 100 tokens vs 1 token -> 10:1 weights, not 100:1
    ratio = out["s0"]["mix_weight"] / out["s1"]["mix_weight"]
    assert abs(ratio - 10.0) < 0.01


def test_shuffle_layout_is_deterministic_permutation(spark):
    docs = _docs(spark, [f"doc {i}" for i in range(50)])
    a = shuffle_layout(docs, buckets=4).collect()
    b = shuffle_layout(docs, buckets=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every doc placed exactly once; ranks are 1..n within each bucket
    assert sorted(r["doc_id"] for r in a) == list(range(50))
    by_bucket = {}
    for r in a:
        by_bucket.setdefault(r["bucket"], []).append(r["rank_in_bucket"])
    for ranks in by_bucket.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # the order is not the identity order (it is a real shuffle)
    in_order = [r["doc_id"] for r in sorted(a, key=lambda r: (r["bucket"], r["rank_in_bucket"]))]
    assert in_order != list(range(50))


def test_dup_span_tokens_interval_union(spark):
    # doc0/doc1 share "a b c d" -> doc0's shingles (a,b,c) and (b,c,d) are
    # both duplicated; their union covers tokens 0..3 = 4 tokens of 5.
    # doc2 has no duplicated shingle; doc3 too short -> 0 coverage.
    from airstrik_py_spark.operators.cleaning import dup_span_tokens

    out = {
        r["doc_id"]: r
        for r in dup_span_tokens(
            _docs(spark, ["a b c d x", "a b c d", "p q r s", "hi yo"]), 3
        ).collect()
    }
    assert out[0]["n_tokens"] == 5 and out[0]["dup_tokens"] == 4
    assert out[0]["dup_token_frac"] == 0.8
    assert out[1]["dup_tokens"] == 4 and out[1]["dup_token_frac"] == 1.0
    assert out[2]["dup_tokens"] == 0
    assert out[3]["n_tokens"] == 2 and out[3]["dup_tokens"] == 0


def test_bpe_pair_topk_counts_weighted_by_occurrence(spark):
    from airstrik_py_spark.operators.corpus import bpe_pair_topk

    # "ab" appears in 'ab ab abc': pair 'ab' count = 3; 'bc' = 1; single
    # chars contribute nothing.
    out = bpe_pair_topk(_docs(spark, ["ab ab abc x y z"]), k=5).collect()
    got = {r["pair"]: (r["rank"], r["n_occurrences"]) for r in out}
    assert got["ab"] == (1, 3)
    assert got["bc"][1] == 1
    ranks = [r["rank"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranks == list(range(1, len(out) + 1))


def test_vocab_oov_coverage(spark):
    from airstrik_py_spark.operators.cleaning import vocab_oov_coverage

    docs = spark.createDataFrame(
        [
            (0, "a a a b", "s1"),
            (1, "a b c d", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    # k=2 vocab by count: a(4), b(2) -> s1 fully covered, s2 half
    out = {r["source"]: r for r in vocab_oov_coverage(docs, k=2).collect()}
    assert out["s1"]["coverage"] == 1.0 and out["s1"]["oov_rate"] == 0.0
    assert out["s2"]["n_covered"] == 2 and out["s2"]["coverage"] == 0.5
