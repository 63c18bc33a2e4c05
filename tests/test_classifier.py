"""On-engine logistic-regression quality classifier: separation on a
synthetic labeled corpus and determinism."""

from __future__ import annotations

from airstrik_py_spark.operators.classifier import quality_lr_fit_score


def _corpus(spark):
    rows = []
    # "good" docs: 40 distinct 4-letter-ish words incl a stopword -> pass
    # all gates; "bad" docs: 5 words -> fail the word-count gate
    for i in range(30):
        words = ["the"] + [f"w{i}x{j}" for j in range(39)]
        rows.append((i, " ".join(words), "src"))
    for i in range(30, 60):
        rows.append((i, f"a b{i} c{i} d{i} e{i}", "src"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_lr_separates_gate_classes(spark):
    out = quality_lr_fit_score(_corpus(spark)).collect()
    by_label = {0: [], 1: []}
    for r in out:
        by_label[r["label"]].append(r["score"])
    assert len(by_label[1]) == 30 and len(by_label[0]) == 30
    # 3 GD rounds give a small but CLEAN margin on linearly-separable
    # gates: every good doc outscores every bad doc
    assert min(by_label[1]) > max(by_label[0])
    # scores are valid probabilities
    assert all(0.0 <= s <= 1.0 for s in by_label[0] + by_label[1])


def test_lr_is_deterministic(spark):
    a = sorted(map(tuple, quality_lr_fit_score(_corpus(spark)).collect()))
    b = sorted(map(tuple, quality_lr_fit_score(_corpus(spark)).collect()))
    assert a == b


def test_empty_corpus_keeps_zero_weights(spark):
    """Review fix: an empty input must not ZeroDivisionError in the
    driver-side GD update — weights stay zero, output is empty."""
    from airstrik_py_spark.operators.classifier import quality_lr_fit_score

    empty = spark.createDataFrame([], "doc_id long, text string, n_chars long, lang string, source string")
    out = quality_lr_fit_score(empty)
    assert out.count() == 0
