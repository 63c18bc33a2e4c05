"""Runtime Bloom join pruning: the filter lands in the plan and never
changes results (no false negatives)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airstrik_py_spark.operators.bloom import bloom_pruning


def _tables(spark, tmp_path):
    big_p, small_p = str(tmp_path / "big"), str(tmp_path / "small")
    spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.mode("overwrite").parquet(big_p)
    spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("tag")
    ).write.mode("overwrite").parquet(small_p)
    return spark.read.parquet(big_p), spark.read.parquet(small_p)


def test_bloom_filter_injected_and_lossless(spark, tmp_path):
    big, small = _tables(spark, tmp_path)
    sel = small.filter(F.col("tag") == 3)
    with bloom_pruning(spark):
        j = big.join(sel, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        got = j.agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        ).collect()[0]
    # without pruning (auto-broadcast back on, bloom thresholds default)
    want = big.join(sel, "k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    ).collect()[0]
    assert (got["n"], got["sv"]) == (want["n"], want["sv"])
    assert got["n"] == 50_000 // 7 + (1 if 3 < 50_000 % 7 else 0)


def test_bloom_confs_restored(spark):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with bloom_pruning(spark):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
