"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
— the MOSS algorithm): select the minimum k-gram hash in every sliding
window of W consecutive k-grams, rightmost-wins on ties.  The guarantee:
any shared run of >= K + W - 1 tokens between two documents yields at
least one IDENTICAL selected fingerprint, at ~2/(W+1) the density of the
full k-gram set — the local, position-robust fingerprint a plagiarism /
near-dup index stores instead of every shingle.

Engine-exactness: the tie rule is encoded IN the comparison key — comp =
md5(kgram) || ':' || zero-padded (10^8 - pos) || ':' || zero-padded pos —
so "min hash, rightmost position" is a plain string MIN on both engines
(ASCII hex/digits/colon compare identically), no argmin builtin with
unspecified tie semantics.  Documents shorter than W k-grams get one
whole-document window (pos=1 is the only valid start and its frame
truncates at the partition end), so every non-empty doc fingerprints.

Scale: per-doc work only — a partitioned window over positions (frame
bounded by W) plus a per-doc aggregate; no joins, no global sort.  The
fingerprint SET (doc_id, fp) is what ships to the inverted index; this
operator emits the per-doc rollup (count + order-canonical digest) so
output stays one row per doc at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airstrik_py_spark.operators.dedup import _shingle_array, bucket_pair_structs

WINNOW_W = 4  # window: W consecutive k-gram hashes
WINNOW_K = 3  # k-gram width in words (shared shingle shape)
_POS_PAD = 100_000_000  # pos < 10^8; keeps the descending key fixed-width


def _winnow_selected(
    docs: DataFrame, w: int, k: int, pos_suffix: bool
) -> DataFrame:
    """Shared winnowing selection (both public entry points ride this so
    the tie-key encodings cannot drift apart): posexplode the k-grams,
    build the tie-encoded comparison key, take the window-min per valid
    window start.  Returns (doc_id, m, fp) where m = per-doc k-gram count.
    pos_suffix appends the ascending-position tail (rollup keys are
    position-distinct; the cross-doc fp set strips positions)."""
    sh = docs.select(
        "doc_id",
        F.posexplode(_shingle_array(F.col("text"), k)).alias("pos0", "shingle"),
    )
    pos = (F.col("pos0") + 1).alias("pos")
    parts = [
        F.md5("shingle"),
        F.lit(":"),
        F.lpad((F.lit(_POS_PAD) - F.col("pos")).cast("string"), 9, "0"),
    ]
    if pos_suffix:
        parts += [F.lit(":"), F.lpad(F.col("pos").cast("string"), 9, "0")]
    rows = sh.select("doc_id", pos, "shingle").select(
        "doc_id", "pos", F.concat(*parts).alias("comp")
    )
    wcount = Window.partitionBy("doc_id")
    wframe = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        rows.withColumn("m", F.count("*").over(wcount))
        .withColumn("fp", F.min("comp").over(wframe))
        .filter(F.col("pos") <= F.greatest(F.col("m") - (w - 1), F.lit(1)))
        .select("doc_id", "m", "fp")
    )


def winnow_fingerprints(docs: DataFrame, w: int = WINNOW_W, k: int = WINNOW_K) -> DataFrame:
    """Per-doc winnowing rollup: (doc_id, n_kgrams, n_fps, fp_digest) —
    n_fps distinct selected fingerprints, digest = md5 of the
    '|'-joined sorted fingerprint keys (order-canonical, engine-free)."""
    sel = _winnow_selected(docs, w, k, pos_suffix=True).distinct()
    return sel.groupBy("doc_id").agg(
        F.max("m").cast("long").alias("n_kgrams"),
        F.count("*").alias("n_fps"),
        F.md5(F.concat_ws("|", F.array_sort(F.collect_list("fp")))).alias("fp_digest"),
    )


WINNOW_PAIR_MIN = 2
WINNOW_DF_MAX = 50  # same inverted-index cap contract as ngram dedup


def winnow_fp_set(docs: DataFrame, w: int = WINNOW_W, k: int = WINNOW_K) -> DataFrame:
    """Distinct (doc_id, fp_hash) winnowing fingerprint set — the sparse
    inverted-index payload (~2/(W+1) the density of the full k-gram set).
    fp_hash is the HASH part of the selected key (position stripped):
    cross-document matching is by content, positions only matter
    within-doc for selection."""
    return (
        _winnow_selected(docs, w, k, pos_suffix=False)
        .select("doc_id", F.substring("fp", 1, 32).alias("fp_hash"))
        .distinct()
    )


def winnow_pairs(
    docs: DataFrame, min_shared: int = WINNOW_PAIR_MIN, df_max: int = WINNOW_DF_MAX
) -> DataFrame:
    """Cross-document winnowing matches: pairs sharing >= min_shared
    selected fingerprints — the MOSS detection join.  The winnowing
    guarantee (any shared run of >= K + W - 1 tokens yields a shared
    fingerprint) makes this a local-similarity detector the global
    minhash/jaccard lanes miss on partial overlap, at ~40% of the shingle
    index volume.

    Scale contract: same DF-capped inverted index as ngram_jaccard_pairs —
    a boilerplate fingerprint shared by more than df_max docs leaves the
    representation (per-key fan-out bounded by C(df_max, 2)).  r16: the
    bucket SELF-JOIN is gone — after the DF-cap join every fp bucket
    holds <= df_max doc_ids, so the C(d,2) ordered pairs are generated
    ROW-LOCALLY from sort_array(collect_list(doc_id)) on the fp_hash
    partitioning the cap join already established (dedup.
    bucket_pair_structs, the shape the driver confirmed at 1.37x for the
    ngram lanes in r15).  Results identical: doc_ids are unique per
    bucket (winnow_fp_set is distinct), and (ids[i], ids[j]) with i < j
    enumerates exactly the `a.doc_id < b.doc_id` join pairs."""
    fps = winnow_fp_set(docs)
    capped = (
        fps.groupBy("fp_hash")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= F.lit(df_max))
        .drop("df")
    )
    sh = fps.join(capped.hint("shuffle_hash"), "fp_hash")
    buckets = sh.groupBy("fp_hash").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    return (
        buckets.select(F.explode(bucket_pair_structs(F.col("ids"), df_max)).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(min_shared))
    )
