"""Pipeline-op invariants for the quality gates / rollup / split queries
(value-level parity is the DuckDB oracle's job — tools/check.py)."""

from __future__ import annotations

from airstrik_py_spark.registry import text_q

SF = "/root/testdata/sf0.001"


def test_quality_gates_keep_is_and_of_gates(spark):
    rows = text_q.q_text_quality_gates(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (
            r["gate_word_count"]
            and r["gate_avg_word_len"]
            and r["gate_has_stopword"]
            and r["gate_repetition"]
        )
        assert 0.0 <= r["dup_3gram_frac"] <= 1.0


def test_corpus_rollup_totals_cover_all_docs(spark):
    from airstrik_py_spark.sources.tables import load_table

    rollup = text_q.q_corpus_stats_rollup(spark, SF)
    n = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rollup.collect()) == n


def test_split_deterministic_and_roughly_75(spark):
    a = text_q.q_split_train_eval(spark, SF)
    rows = a.collect()
    frac = sum(1 for r in rows if r["split"] == "train") / len(rows)
    assert 0.55 < frac < 0.9  # md5 nibble < 'c' is 12/16 = 0.75 in expectation
    again = text_q.q_split_train_eval(spark, SF).collect()
    assert sorted((r["doc_id"], r["split"]) for r in rows) == sorted(
        (r["doc_id"], r["split"]) for r in again
    )
