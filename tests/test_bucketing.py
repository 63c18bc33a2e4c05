"""Bucketed co-location: the join/agg over hex-bucketed tables must run
with ZERO exchanges (broadcast disabled so a shuffle can't hide behind a
small side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airstrik_py_spark.operators.bucketing import write_bucketed


def test_bucketed_agg_join_has_no_exchange(spark, tmp_path):
    df = spark.range(0, 5000).select(
        (F.col("id") % 40).cast("string").alias("hex"), F.col("id").alias("v")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = write_bucketed(spark, df, "tb_a", "hex", path=str(tmp_path / "a"))
        b = write_bucketed(spark, df, "tb_b", "hex", path=str(tmp_path / "b"))
        ga = a.groupBy("hex").agg(F.count("*").alias("n_a"))
        gb = b.groupBy("hex").agg(F.sum("v").alias("s_b"))
        j = ga.join(gb, "hex")
        assert j.count() == 40
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS tb_a")
        spark.sql("DROP TABLE IF EXISTS tb_b")


def test_write_bucketed_idempotent(spark, tmp_path):
    df = spark.range(0, 100).select(
        (F.col("id") % 5).cast("string").alias("hex"), F.col("id").alias("v")
    )
    for _ in range(2):  # second run must overwrite cleanly
        t = write_bucketed(spark, df, "tb_i", "hex", path=str(tmp_path / "i"))
    assert t.count() == 100
    spark.sql("DROP TABLE IF EXISTS tb_i")


def test_day_partition_pruning(spark, tmp_path):
    """A day-filtered read over day-partitioned parquet must prune at the
    directory level (PartitionFilters in the scan, not a post-scan filter)."""
    from airstrik_py_spark.operators.bucketing import write_day_partitioned

    df = spark.range(0, 1000).select(
        F.col("id").alias("v"),
        F.date_add(F.lit("2026-01-01").cast("date"), (F.col("id") % 7).cast("int")).alias("day"),
    )
    path = str(tmp_path / "byday")
    write_day_partitioned(df, path)
    rd = spark.read.parquet(path).filter(F.col("day") == "2026-01-03")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:80]
    assert rd.count() == df.filter(F.col("day") == "2026-01-03").count()
