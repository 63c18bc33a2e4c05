"""Regression tests for the plan-audit scale detector (VERDICT r4 #4, r5 #5).

The UNPART-WINDOW flag must fire on the exact shape that made
lm_perplexity_buckets scale-weak for two rounds — a global Window/Sort over
data-sized rows (Exchange SinglePartition with no bounded aggregate below) —
and must NOT fire on the two legitimate shapes the engine uses:
a window partitioned by a key, and a global window over a bounded aggregate.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.audit_plans import unpartitioned_window_flags


def _simple_plan(df) -> str:
    conf = df.sparkSession.conf
    prev = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue()
    finally:
        conf.set("spark.sql.adaptive.enabled", prev)


def test_flags_global_ntile_over_data_rows(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    bad = df.withColumn("b", F.ntile(3).over(Window.orderBy("v")))
    assert unpartitioned_window_flags(_simple_plan(bad)) >= 1


def test_no_flag_for_partitioned_window(spark):
    df = spark.range(100).withColumn("k", F.col("id") % 5)
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert unpartitioned_window_flags(_simple_plan(good)) == 0


def test_no_flag_for_global_window_over_bounded_aggregate(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 3)
    agg = df.groupBy("k").agg(F.count("*").alias("n"))
    cum = agg.withColumn(
        "cum",
        F.sum("n").over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert unpartitioned_window_flags(_simple_plan(cum)) == 0
