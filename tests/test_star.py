"""Star-schema analytics: integer-exact money math and join shapes."""

from __future__ import annotations

import io
import contextlib

from airstrik_py_spark.operators.star import _cents, _pct, pricing_summary


def test_cents_exact_on_cent_values(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(68423.46, 0.05), (0.01, 0.1), (99999.99, 0.0)], "p double, d double"
    )
    out = df.select(
        _cents("p").alias("c"), _pct("d").alias("b")
    ).collect()
    assert [(r["c"], r["b"]) for r in out] == [(6842346, 5), (1, 10), (9999999, 0)]


def test_pricing_summary_money_identity(spark):
    # sum_disc_price_units / sum_base_cents relation: discounted <= base*100
    out = pricing_summary(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        assert r["sum_disc_price_units"] <= r["sum_base_cents"] * 100
        assert r["sum_charge_units"] >= r["sum_disc_price_units"] * 100
        assert 0 < r["avg_qty"] < 60


def test_region_revenue_plan_broadcasts_dims(spark):
    from airstrik_py_spark.operators.star import region_revenue

    df = region_revenue(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
