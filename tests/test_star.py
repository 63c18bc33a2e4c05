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


def test_priority_semijoin_no_duplicate_counting(spark, tmp_path):
    """LEFT SEMI semantics: an order with many returned lines counts ONCE;
    orders with no returned line don't count; out-of-window orders drop."""
    import datetime as dt

    orders = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, dt.datetime(1997, 3, 1), "1-URGENT"),
            (2, 1, "O", 10.0, dt.datetime(1997, 3, 1), "1-URGENT"),
            (3, 1, "O", 10.0, dt.datetime(1996, 3, 1), "1-URGENT"),  # out of window
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, "R"), (1, "R"), (1, "R"), (2, "N"), (3, "R")],
        "l_orderkey long, l_returnflag string",
    )
    d = str(tmp_path / "sf")
    orders.write.parquet(d + "/orders.parquet")
    li.selectExpr(
        "l_orderkey", "CAST(0 AS LONG) l_partkey", "CAST(0 AS LONG) l_suppkey",
        "CAST(0 AS INT) l_linenumber", "CAST(1 AS DOUBLE) l_quantity",
        "CAST(1 AS DOUBLE) l_extendedprice", "CAST(0 AS DOUBLE) l_discount",
        "CAST(0 AS DOUBLE) l_tax", "l_returnflag", "'O' AS l_linestatus",
        "TIMESTAMP '1997-06-01' AS l_shipdate",
    ).write.parquet(d + "/lineitem.parquet")

    from airstrik_py_spark.operators.star import priority_semijoin_counts

    out = priority_semijoin_counts(spark, d).collect()
    # order 1 (3 returned lines) counts once; order 2 has none; order 3 out
    assert len(out) == 1
    assert out[0]["o_orderpriority"] == "1-URGENT" and out[0]["order_count"] == 1


def test_customers_no_orders_anti_semantics(spark, tmp_path):
    """LEFT ANTI: only zero-match probe rows survive; the mean threshold
    is the integer cross-multiply (no float division)."""
    import datetime as dt

    cust = spark.createDataFrame(
        [
            (1, "a", 10, 100.0, "B"),   # above mean, has urgent order -> out
            (2, "b", 10, 90.0, "B"),    # above mean, no urgent order -> in
            (3, "c", 20, 5.0, "B"),     # below mean -> out
            (4, "d", 20, -50.0, "B"),   # nonpositive balance -> out
        ],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (100, 1, "O", 10.0, dt.datetime(1997, 1, 1), "1-URGENT"),
            (101, 2, "O", 10.0, dt.datetime(1997, 1, 1), "3-MEDIUM"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    nation = spark.createDataFrame(
        [(10, "ALPHA", 1), (20, "BETA", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    d = str(tmp_path / "sf")
    cust.write.parquet(d + "/customer.parquet")
    orders.write.parquet(d + "/orders.parquet")
    nation.write.parquet(d + "/nation.parquet")

    from airstrik_py_spark.operators.star import customers_without_orders

    out = customers_without_orders(spark, d).collect()
    # mean positive balance = (100+90+5)/3 = 65 -> custs 1,2 above; only 2
    # lacks an urgent order
    assert len(out) == 1
    assert out[0]["n_name"] == "ALPHA"
    assert out[0]["n_customers"] == 1
    assert out[0]["total_acctbal_cents"] == 9000
