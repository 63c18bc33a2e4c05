"""BPE merge training as one unrolled relational plan.

Tokenizer training (Sennrich et al. 2016) is the canonical iterative
algorithm over a corpus: count adjacent symbol pairs, merge the most
frequent pair everywhere, repeat.  `bpe_pair_topk` (operators/corpus.py)
computes the FIRST merge statistic; this operator runs BPE_ROUNDS full
rounds — select AND apply — as a single statically-unrolled DataFrame
plan: no driver loop, no collect, each round = one pair aggregation +
one broadcast of the winning 1-row pair into a string rewrite.

Input compaction: like production tokenizer trainers, rounds run on the
(word, frequency) table, not the raw corpus — at 100 TB the word-count
groupBy is the only corpus-sized job; every merge round then touches
|vocab| rows (millions at worst), and the per-round "apply the merge"
is a broadcast crossJoin of a single-row aggregate (the established
scalar-broadcast pattern), never a shuffle of the corpus.

Symbol-sequence encoding: tokens joined by TWO spaces with single-space
outer boundaries (`'abc'` -> `' a  b  c '`), so replacing the pattern
`' t1  t2 ' -> ' t1t2 '` leaves the invariant intact AND consecutive
occurrences stay matchable — with single-space joins, `replace()`'s
leftmost-nonoverlapping scan consumes the shared boundary space and
misses every second merge ('abab' would merge once, not twice).  Both
engines' `replace` scan identically (verified: ' a  b  a  b ' -> ' ab
ab ', ' a  a  a ' -> ' aa  a ' — greedy leftmost, exactly BPE's rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BPE_ROUNDS = 3


def _word_freqs(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol sequences, weighted by
    word frequency.  Pair id is the two tokens single-space-joined."""
    pairs = F.expr(
        "CASE WHEN size(split(trim(seq), '  ')) > 1 THEN "
        "transform(sequence(1, size(split(trim(seq), '  ')) - 1), "
        "i -> concat(element_at(split(trim(seq), '  '), i), ' ', "
        "element_at(split(trim(seq), '  '), i + 1))) "
        "ELSE array() END"
    )
    return (
        seqs.select(F.col("freq"), F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge(seqs: DataFrame, best: DataFrame) -> DataFrame:
    """Rewrite every sequence with the winning pair merged: broadcast the
    1-row winner, string replace ' t1  t2 ' -> ' t1t2 '."""
    search = F.concat(
        F.lit(" "), F.replace(F.col("pair"), F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    merged = F.concat(
        F.lit(" "), F.replace(F.col("pair"), F.lit(" "), F.lit("")), F.lit(" ")
    )
    return seqs.crossJoin(F.broadcast(best.select("pair"))).select(
        F.replace(F.col("seq"), search, merged).alias("seq"), "freq"
    )


def bpe_train_merges(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """The first `rounds` BPE merges over the corpus: (merge_round, pair,
    pair_count), where pair_count is the pair's weighted frequency at
    selection time.  Ties break lexicographically on the pair for
    cross-engine determinism."""
    seqs = _word_freqs(docs).select(
        F.regexp_replace(F.col("w"), "(.)", " $1 ").alias("seq"), "freq"
    )
    out = None
    for r in range(1, rounds + 1):
        best = (
            _pair_counts(seqs)
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(1)
        )
        row = best.select(
            F.lit(r).alias("merge_round"),
            "pair",
            F.col("n").cast("long").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        if r < rounds:
            seqs = _apply_merge(seqs, best)
    return out
