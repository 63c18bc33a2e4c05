"""Bucketed-table co-location: pay the key shuffle ONCE at write time, then
join and aggregate on that key forever with ZERO exchanges.

This is the 100 TB pattern for the hot `hex` key (SCALE.md): land the
observation store bucketed by hex, and every per-plane pipeline stage —
sessionize, trip fold, enrichment join — reads pre-partitioned data.  The
demo query (registry/extras_q.py::join_bucketed_coloc) proves the property:
with broadcast disabled, groupBy + join over two bucketed tables executes
with 0 Exchange nodes (pinned by tests/test_bucketing.py).

Reference parity note: the reference's Mongo layout keyed collections by
plane (dbread.py:41-57) for the same access pattern; bucketing is the
columnar-store equivalent with planner-visible co-location.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_day_partitioned(df: DataFrame, path: str, day_col: str = "day") -> None:
    """Directory-partitioned parquet by day — the time axis of the 100 TB
    layout (bucketing covers the key axis).  A day-ranged query then scans
    only matching directories: tests/test_bucketing.py pins PartitionFilters
    in the scan.  Day files stay append-friendly for the daily stats upsert
    (sink_stats_daily) and TTL deletes are directory drops."""
    df.write.mode("overwrite").partitionBy(day_col).parquet(path)


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
) -> DataFrame:
    """Write `df` as a parquet table bucketed (and sorted) by `key` and
    return the catalog-backed read.  Idempotent: drops and overwrites, so
    repeated driver runs in one session are safe.  The bucket count is the
    write-time parallelism contract — at 100 TB pick buckets ~= cluster
    cores so one bucket ~= one task."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="airstrik_bucketed_"), name)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )
    return spark.table(name)
