"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exactness baseline, sign-random-projection LSH and
label-partitioned IVF as the scale paths.

Scale notes:
  * brute-force is O(Q x N) — fine for small Q (re-rank stage), never the
    full N x N at 100 TB.  The dot product is F.aggregate over zip_with —
    JVM-side, no Python.
  * SRP-LSH buckets by the sign pattern of the first P dimensions; the join
    is bucket-local.  At scale P tunes bucket size ~ N / 2^P.
  * IVF uses a coarse-quantizer cell id (here the fixture's `label` column);
    probes only the query's cell.
  * embedding-cosine near-dup pairs: bucket-joinable the same way; here
    thresholded pairs for the dedup suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airstrik_py_spark.functions.vector import cosine

SRP_BITS = 8


def _with_vec(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "vec", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )


COSINE_BANDS = 8


def srp_band_key(vec: Column, band: Column, bits: int = SRP_BITS) -> Column:
    """Sign pattern of dims [band*bits+1 .. band*bits+bits] — one SRP band
    key.  Out-of-range dims read as NULL -> '0' (mirrors DuckDB list
    indexing), so short vectors still bucket deterministically."""
    start = band * F.lit(bits)
    return F.concat(
        *[
            F.when(F.try_element_at(vec, start + F.lit(i + 1)) >= 0.0, F.lit("1"))
            .otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )


def cosine_dup_pairs(emb: DataFrame, threshold: float, bands: int = COSINE_BANDS) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP-banded candidate
    generation: vectors sharing the sign pattern of ANY 8-dim block become
    candidates (banded LSH, same shape as MinHash bands), exact cosine
    re-rank inside buckets only, DISTINCT collapses multi-band hits.

    NEVER all-pairs: the join is an equi-join on (band, bucket-key), so at
    10^9 vectors work is sum of squared bucket sizes, not N^2/2 — the same
    contract as lsh_candidate_pairs/simhash_pairs.  Recall is the standard
    banded-SRP curve (p_agree^bits per band, 1-(1-p^8)^8 overall): ~0.94
    for true near-dups (cos >= 0.9); lower-cos borderline pairs are
    deliberately candidate-pruned.  Round-then-threshold keeps the verdict
    stable across engines' last-ulp summation differences."""
    base = (
        _with_vec(emb)
        .withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
        .withColumn("bkey", srp_band_key(F.col("vec"), F.col("band")))
    )
    a = base.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"), "band", "bkey")
    b = base.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"), "band", "bkey")
    cos = F.round(cosine(F.col("va"), F.col("vb")), 4)
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= F.lit(threshold))
        .select("id_a", "id_b", "cos")
        .distinct()
    )


def ann_bruteforce(emb: DataFrame, n_queries: int, k: int) -> DataFrame:
    """Exact top-k cosine neighbors for vec_id < n_queries (excluding self),
    rank ties broken by neighbor id."""
    from pyspark.sql import Window

    q = _with_vec(emb.filter(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    c = _with_vec(emb).select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def srp_bucket(vec: Column, bits: int = SRP_BITS) -> Column:
    """Sign-random-projection bucket key: sign pattern of the first `bits`
    dimensions (axis-aligned hyperplanes — deterministic, engine-agnostic)."""
    return F.concat(
        *[
            # try_element_at: out-of-range dims read as NULL -> '0', matching
            # DuckDB's list indexing (vectors shorter than `bits` still work)
            F.when(F.try_element_at(vec, F.lit(i + 1)) >= 0.0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(bits)
        ]
    )


def ann_srp_lsh(emb: DataFrame, n_queries: int, k: int) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's SRP bucket; exact
    cosine re-rank within the bucket only."""
    from pyspark.sql import Window

    base = _with_vec(emb).withColumn("bucket", srp_bucket(F.col("vec")))
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv"), "bucket"
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cv"), "bucket"
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "cos", "rank")
    )


def ann_ivf_label(emb: DataFrame, n_queries: int, k: int) -> DataFrame:
    """IVF-style ANN with the fixture `label` as the coarse cell: probe only
    the query's cell, exact re-rank inside."""
    from pyspark.sql import Window

    base = _with_vec(emb)
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv"), "label"
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cv"), "label"
    )
    scored = (
        q.join(c, "label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("label").alias("cell"), "neighbor_id", "cos", "rank")
    )
