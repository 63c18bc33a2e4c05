"""Runtime Bloom-filter join pruning for selective joins at scale.

The shape: a big fact stream joins a filtered, smaller-but-not-
broadcastable side — e.g. 100 TB of observations joining the flagged 1%
of a dimension.  A plain shuffle join moves the ENTIRE big side; Spark's
runtime row-level Bloom filter (injected by the optimizer since 3.3)
builds a filter from the creation side's join keys and applies it
map-side on the application side BEFORE the exchange, so the shuffle
carries ~(selectivity + false-positive rate) of the big side.

`bloom_filter_agg` is optimizer-internal (not a registered SQL function
in Spark 4.x), so the explicit hand-built form isn't expressible from
the API; the right lever is the injection confs below.  Bloom membership
has no false negatives, so results are identical with or without the
filter — tests/test_bloom.py pins both the plan (`might_contain` present)
and result equality.  Not a registry slug: a DuckDB oracle could only
re-state the plain join.

At 100 TB the defaults (creation side <= 10 MB after filters,
application-side scan >= 10 GB) already fire; locally the scan-size
threshold must drop to 0 because fixture scans are tiny.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

BLOOM_CONFS = {
    # injection master switch (default true since 3.4; pinned explicitly)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local fixtures scan far less than the 10 GB production default
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@contextmanager
def bloom_pruning(spark: SparkSession, force_shuffle_join: bool = True):
    """Enable runtime Bloom pruning on fixture-sized inputs (production
    defaults only fire past 10 GB scans).  `force_shuffle_join` disables
    auto-broadcast so the join actually shuffles — the regime where the
    Bloom filter pays; restores every conf afterwards."""
    touched = dict(BLOOM_CONFS)
    if force_shuffle_join:
        touched["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    saved = {k: spark.conf.get(k, None) for k in touched}
    for k, v in touched.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
