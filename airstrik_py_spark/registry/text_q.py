"""t2 queries for text analysis + multimodal plumbing over `documents`:
language-ID heuristic, quality scoring, token counting, rolling-hash
fingerprint, binary-column feature extraction (mapInPandas)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airstrik_py_spark.operators.multimodal import attach_fake_media, extract_features
from airstrik_py_spark.session import pin_session
from airstrik_py_spark.sources.tables import load_table

STOPWORDS = ("the", "a")
FNV_MOD = 1000000007


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram language-ID heuristic: English bigram 'th' density (the
    fixture text is English-ish word soup regardless of its lang tag)."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    th_count = (F.length("text") - F.length(F.regexp_replace("text", "th", ""))) / 2.0
    score = F.round(th_count / F.length("text"), 6)
    return d.select(
        "doc_id",
        F.col("lang").alias("tagged_lang"),
        score.alias("en_score"),
        F.when(score > 0.01, F.lit("en")).otherwise(F.lit("other")).alias("guessed_lang"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, mean token length, stopword ratio, and
    a composite score — all Catalyst expressions."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents").withColumn(
        "words", F.split("text", " ")
    )
    n_tok = F.size("words")
    n_stop = F.size(
        F.filter("words", lambda w: (w == STOPWORDS[0]) | (w == STOPWORDS[1]))
    )
    avg_len = (F.length("text") - (n_tok - 1).cast("double")) / n_tok.cast("double")
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(avg_len * 0.1 + (1.0 - stop_ratio) * 0.9, 6).alias("quality_score"),
    )


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + regex word tokens + chars."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+")).alias("n_word_tokens"),
        F.length("text").alias("n_chars"),
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash over the token stream (order-sensitive
    document fingerprint), exact int64 arithmetic on both engines."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents").withColumn("words", F.split("text", " "))
    terms = F.transform(
        "words",
        lambda w: (F.length(w) + F.lit(7) * F.ascii(F.substring(w, 1, 1))).cast("long"),
    )
    fp = F.aggregate(
        terms,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FNV_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: attach an opaque binary payload,
    extract features via a REAL mapInPandas (Arrow-batched) with a stubbed
    decoder, return the typed metadata (the oracle recomputes the stub's
    byte math in SQL)."""
    pin_session(spark)
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select("doc_id", "media_type", "payload_len", "width", "height")


QUERIES = {
    "text_langid": q_text_langid,
    "text_quality": q_text_quality,
    "text_tokens": q_text_tokens,
    "text_fingerprint": q_text_fingerprint,
    "multimodal_metadata": q_multimodal_metadata,
}

# hex nibble -> int via position in the digit string (1-indexed strpos)
_NIB = "(strpos('0123456789abcdef', {c}) - 1)"
_BYTE0 = (
    _NIB.format(c="substr(md5(text), 1, 1)") + " * 16 + " + _NIB.format(c="substr(md5(text), 2, 1)")
)
_BYTE1 = (
    _NIB.format(c="substr(md5(text), 3, 1)") + " * 16 + " + _NIB.format(c="substr(md5(text), 4, 1)")
)

ORACLES = {
    "text_langid": """
SELECT doc_id, lang AS tagged_lang,
       round(((length(text) - length(replace(text, 'th', ''))) / 2.0) / length(text), 6) AS en_score,
       CASE WHEN ((length(text) - length(replace(text, 'th', ''))) / 2.0) / length(text) > 0.01
            THEN 'en' ELSE 'other' END AS guessed_lang
FROM documents
""",
    "text_quality": """
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents),
m AS (
  SELECT doc_id,
         len(words) AS n_tokens,
         (length(text) - CAST(len(words) - 1 AS DOUBLE)) / CAST(len(words) AS DOUBLE) AS avg_len,
         CAST(len(list_filter(words, w -> w IN ('the', 'a'))) AS DOUBLE)
           / CAST(len(words) AS DOUBLE) AS stop_ratio
  FROM d)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       round(avg_len, 6) AS avg_token_len,
       round(stop_ratio, 6) AS stopword_ratio,
       round(avg_len * 0.1 + (1.0 - stop_ratio) * 0.9, 6) AS quality_score
FROM m
""",
    "text_tokens": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_word_tokens,
       CAST(length(text) AS INTEGER) AS n_chars
FROM documents
""",
    "text_fingerprint": f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
t AS (SELECT doc_id,
             list_transform(words, w -> CAST(length(w) + 7 * ascii(substr(w, 1, 1)) AS BIGINT)) AS terms
      FROM d)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), terms),
                   (a, b) -> (a * 31 + b) % {FNV_MOD}) AS fingerprint
FROM t
""",
    "multimodal_metadata": f"""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
       CAST(octet_length(unhex(md5(text))) AS INTEGER) AS payload_len,
       CAST(1 + ({_BYTE0}) % 64 AS INTEGER) AS width,
       CAST(1 + ({_BYTE1}) % 64 AS INTEGER) AS height
FROM documents
""",
}
