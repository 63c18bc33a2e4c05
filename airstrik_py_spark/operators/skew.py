"""Skew-mitigation utilities for hot keys at scale.

ADS-B keys (ICAO24) are naturally well distributed, but the engine's
extension workloads are not: document shingles, LSH buckets and event keys
can be pathologically hot (one shingle in 10% of a 100 TB corpus melts a
single reducer).  Two standard remedies, both pure DataFrame:

  * salted two-phase aggregation — spread each key over S partial groups,
    then combine.  Works for any algebraic aggregate (sum/count/min/max).
  * salted broadcast join — replicate the small side S times so the big
    side's hot key fans across S tasks.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
automatically; these helpers cover aggregations and broadcast paths where
AQE does not apply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partial, then groupBy(keys)
    final.  `aggs` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}.  Equivalent to a direct groupBy for these
    algebraic functions; the salt bounds any single reducer's share of a hot
    key to ~1/salt_buckets."""
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for out, (_, fn) in aggs.items():
        if fn not in partial_fns:
            raise ValueError(f"{out}: non-algebraic fn {fn!r} cannot be salted")

    salted = df.withColumn(
        "_salt", (F.spark_partition_id() + F.crc32(F.concat_ws("", *keys))) % salt_buckets
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[partial_fns[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[combine[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side against a small dim by replicating the dim
    across salt values — every hot-key row lands on a different task."""
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    salted_big = big.withColumn(
        "_salt", F.monotonically_increasing_id() % salt_buckets
    )
    return salted_big.join(
        F.broadcast(salted_small), [key, "_salt"], how
    ).drop("_salt")
