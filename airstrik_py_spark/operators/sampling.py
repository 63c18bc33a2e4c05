"""Weighted sampling for corpus construction at scale.

Training-data pipelines sample documents proportionally to a weight
(length, quality score, domain multiplier).  The classic distributed-exact
scheme is *priority sampling* (Duffield, Lund, Thorup, JACM 2007): give
every item a priority w/u for a uniform u, keep the k largest priorities.
One pass, mergeable across partitions (each partition keeps its local
top-k, the reduce keeps the global top-k), and the inclusion decision is
reproducible from the item alone — no global state.

Engine-exactness: u comes from md5 (identical across engines) and the
rank key is computed with pure BIGINT arithmetic — `key = (h+1) * 2^20
div w`, the *smallest* keys are the *largest* priorities — so Spark and
the DuckDB oracle agree to the bit; no float pow/ln (whose libm ulps
differ across engines) anywhere.

Scale shape: the top-k is a TakeOrdered reduction (per-partition heap +
driver merge of k rows), never a global sort; at 100 TB the only cost is
the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRIORITY_SALT = "prio1"
PRIORITY_K = 200
# h+1 <= 2^32 and weight >= 1, so (h+1) * 2^20 <= 2^52: BIGINT-safe and
# below 2^53, with 20 bits of sub-unit resolution in the rank key.
PRIORITY_SCALE = 1 << 20


def priority_key(id_col: Column, weight: Column, salt: str = PRIORITY_SALT) -> Column:
    """BIGINT rank key: smaller key == larger priority w/u.

    u ~ (h+1)/2^32 from the first 8 md5 hex chars of salt||id; the key is
    the integer floor of u/w scaled by 2^20.  `div` is true integer
    division (IntegralDivide), matching the oracle's `//` exactly."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    return F.call_function("div", (h + 1) * F.lit(PRIORITY_SCALE), weight)


def priority_sample(docs: DataFrame, k: int = PRIORITY_K) -> DataFrame:
    """Exact weighted-without-replacement sample of k documents, weight =
    n_chars + 1 (longer documents proportionally more likely).  Returns
    (doc_id, weight, rank_key) for the k smallest rank keys — deterministic,
    engine-exact, and reproducible on a backfill."""
    weight = (F.col("n_chars") + F.lit(1)).cast("long")
    # Dirty-input guard (mirrored in the oracle WHERE): NULL n_chars would
    # make a NULL rank_key, which sorts NULLS FIRST in Spark asc but NULLS
    # LAST in DuckDB's ORDER BY ASC; n_chars < 0 would hit weight <= 0
    # (div-by-zero: NULL in Spark, error in DuckDB).  Require weight >= 1
    # identically on both engines so the pair stays bit-exact.
    keyed = docs.filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") >= 0)
    ).select(
        "doc_id",
        weight.alias("weight"),
        priority_key(F.col("doc_id"), weight).alias("rank_key"),
    )
    # orderBy().limit() compiles to TakeOrderedAndProject: per-partition
    # top-k heaps + a k-row driver merge, no global sort exchange.
    return keyed.orderBy(F.col("rank_key").asc(), F.col("doc_id").asc()).limit(k)
