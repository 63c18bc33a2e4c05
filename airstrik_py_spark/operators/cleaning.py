"""Corpus-cleaning operators: duplicated-n-gram coverage and PII redaction.

Round-4 additions to the training-data extension set (no reference
counterpart — airstrik.py has no text pipeline; these follow the standard
LLM-corpus cleaning recipes):

* ``dup_ngram_coverage`` — the per-document duplicated-substring signal from
  Lee et al. "Deduplicating Training Data Makes Language Models Better"
  (2107.06499): the fraction of a document's distinct n-gram shingles that
  occur in at least one OTHER document.  Unlike the pairwise
  ``dedup_ngram_jaccard`` join this never forms doc x doc pairs — it is two
  linear shuffles on the shingle key (groupBy DF + join back), so there is
  no quadratic blowup to cap at any scale.

* ``pii_redact`` — regex PII scrubbing (emails, IPv4s, US-style phone
  numbers) as pure Catalyst ``regexp_count`` / ``regexp_replace`` — the
  C4/CCNet-style cleaning pass.  Patterns are RE2-compatible (no
  backreferences / lookaround) so the DuckDB oracle runs the IDENTICAL
  regexes; Spark's regexp_replace is global by default and the oracle
  mirrors with the 'g' flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airstrik_py_spark.operators.dedup import _shingle_array, _spread, shingles

# RE2-safe AND java.util.regex-safe; keep in sync with _PII_SQL below.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def dup_ngram_coverage(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document duplicated-n-gram coverage.

    Shape: distinct (doc_id, shingle) long form (map-side array_distinct,
    see dedup.shingles) -> groupBy(shingle) document-frequency -> the
    df>=2 subset joins BACK to the long form on the shingle key.  Both
    shuffles are linear in the shingle count; the join is 1:1 per
    (doc, shingle) row, so — unlike the pairwise jaccard self-join — a hot
    shingle costs d rows, not d^2 pairs, and needs no DF cap.  Shuffled-hash
    hinted: the DF side is vocab-sized (too big to broadcast at corpus
    scale) and neither side profits from a sort.

    Documents shorter than n words have no shingles and are absent from the
    output (coverage is undefined for them), mirrored by the oracle's
    inner-unnest GROUP BY.
    """
    sh = shingles(docs.select("doc_id", "text"), n)
    dup = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
    )
    hit = sh.join(dup.hint("shuffle_hash"), "shingle", "left")
    return (
        hit.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("df").isNotNull(), 1).otherwise(0)).alias("n_dup"),
        )
        .withColumn(
            "dup_coverage", F.round(F.col("n_dup") / F.col("n_shingles"), 6)
        )
    )


def dup_span_tokens(docs: DataFrame, n: int = 3) -> DataFrame:
    """Span-level duplicated-substring coverage: the number (and fraction)
    of each document's TOKENS lying inside at least one corpus-duplicated
    n-gram instance — the interval-union refinement of dup_ngram_coverage
    (what you'd actually delete in Lee-et-al-style substring dedup).

    Shape: positional shingle instances (posexplode) inner-join the df>=2
    shingle set, then each surviving instance explodes to its n covered
    token positions and a per-doc distinct count collapses overlapping
    spans.  All joins are linear on the shingle key; the position explode
    is a bounded n-fold fan-out of the duplicated subset only.  Docs
    shorter than n words have no shingles and are reported with zero
    coverage."""
    base = _spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.split("text", " ").alias("words"),
        _shingle_array(F.col("text"), n).alias("sh"),
    )
    totals = base.select("doc_id", F.size("words").alias("n_tokens"))
    inst = base.select("doc_id", F.posexplode("sh").alias("pos", "shingle"))
    # df table via shingles(): per-doc uniqueness is array_distinct BEFORE
    # the explode (map-side), so no (doc_id, shingle) distinct-shuffle of
    # the full instance stream is ever paid
    dup = (
        shingles(docs.select("doc_id", "text"), n)
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
        .select("shingle")
    )
    covered = (
        inst.join(dup.hint("shuffle_hash"), "shingle")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("tok"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("tok").alias("dup_tokens"))
    )
    return (
        totals.join(covered, "doc_id", "left")
        .withColumn("dup_tokens", F.coalesce(F.col("dup_tokens"), F.lit(0)))
        .withColumn(
            "dup_token_frac",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6),
        )
    )


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and mask PII spans in ``text_col`` — pure Catalyst, no UDF.

    Adds: n_emails / n_ips / n_phones (regexp_count), ``redacted`` (masks
    applied email -> ip -> phone, in that order so an earlier mask can never
    create a later pattern), and redacted_len.  Keeps all other columns.
    """
    redacted = F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_IPV4, "<IP>")
    redacted = F.regexp_replace(redacted, PII_PHONE, "<PHONE>")
    return (
        df.withColumn("n_emails", F.regexp_count(F.col(text_col), F.lit(PII_EMAIL)))
        .withColumn("n_ips", F.regexp_count(F.col(text_col), F.lit(PII_IPV4)))
        .withColumn("n_phones", F.regexp_count(F.col(text_col), F.lit(PII_PHONE)))
        .withColumn("redacted", redacted)
        .withColumn("redacted_len", F.length("redacted"))
    )


VOCAB_COVERAGE_K = 20


def vocab_oov_coverage(docs: DataFrame, k: int = VOCAB_COVERAGE_K) -> DataFrame:
    """Tokenizer-coverage statistic: per source, the fraction of token
    INSTANCES covered by the global top-k vocabulary (by occurrence count,
    token-text tie-break) and the complementary OOV rate — the number you
    check before freezing a vocab/tokenizer on a corpus mix.

    Shape: one word-count aggregate (vocab-sized, map-side combined), a
    TakeOrdered top-k (constant result), then the k-row vocab BROADCASTs
    back onto the token stream for a per-source conditional sum.  The
    token stream is never shuffled on the token key for the coverage pass —
    only on the low-cardinality source key."""
    tok = _spread(docs.select("source", "text")).select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    top = (
        tok.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
        .select("token", F.lit(1).alias("_v"))
    )
    j = tok.join(F.broadcast(top), "token", "left")
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("_v"), F.lit(0))).alias("n_covered"),
        )
        .withColumn(
            "coverage", F.round(F.col("n_covered") / F.col("n_tokens"), 6)
        )
        .withColumn(
            "oov_rate", F.round(1.0 - F.col("n_covered") / F.col("n_tokens"), 6)
        )
    )


def synth_contact_text(docs: DataFrame) -> DataFrame:
    """Deterministic PII-bearing test text: the fixture corpus is a clean
    word soup (no digits / at-signs — verified in TESTDATA), so the redaction
    query plants one email, one private IPv4 and one phone number per doc as
    pure doc_id arithmetic.  This exercises every pattern with nonzero
    counts while staying exactly reproducible on both engines."""
    contact = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".net or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel 919-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select("doc_id", contact.alias("text"))
