"""Classic star-schema analytics over the TPC-H-ish fixture tables
(lineitem / orders / customer / supplier / nation / region) — the
multi-table join-planning breadth the flight engine itself never
exercises: fact-fact shuffles on the orderkey, broadcast dimension
chains, and aggregate pushdown, in the Q1 / Q3 / Q5 shapes.

Exactness contract: the fixture's monetary columns are cent-exact and
discounts/taxes are percent-exact (verified), so all money math runs in
integer units — cents, cents x (100 - disc), cents x (100 - disc) x
(100 + tax) — making every SUM an exact BIGINT aggregate, order-free
across engines and partitionings.  Averages round half-away in integer
micro-units (ratios of exact integers land exactly on .5e-6 decimal
boundaries where engine float round()s disagree — same lesson as the LR
classifier).

Scale notes (TPC-H at 100 TB ~ SF-100k):
  * Q1 shape — one map-side-combined aggregate on a 6-value key after a
    pushed-down date filter; the scan reads 7 columns of 11.
  * Q3 shape — customer is a broadcast dim; orders<->lineitem is ONE
    hash shuffle on the orderkey (co-partition/bucket both facts on
    orderkey at write time to delete it); top-k is a TakeOrdered, no
    global sort.
  * Q5 shape — region->nation->customer/supplier chain all broadcast;
    the only data-sized exchange is again the orderkey join; the final
    rollup key is 25 nations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from airstrik_py_spark.functions.exact import ha_micro
from airstrik_py_spark.sources.tables import load_table

Q1_CUTOFF = "1998-09-01"
Q3_DATE = "1998-03-15"
Q3_SEGMENT = "BUILDING"
Q5_REGION = "ASIA"
Q5_START, Q5_END = "1996-01-01", "1997-01-01"


def _cents(col: str) -> Column:
    return F.round(F.col(col) * 100, 0).cast("long")


def _pct(col: str) -> Column:
    return F.round(F.col(col) * 100, 0).cast("long")


# round-half-away micro-unit average — shared helper (functions/exact.py);
# promo_units * 1e6 is already ~1e17 here, hence the decimal(38,0) path.
_ha_micro = ha_micro


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape: per (returnflag, linestatus) pricing rollup with exact
    integer money sums and integer-rounded averages."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit(Q1_CUTOFF).cast("timestamp")
    )
    qty = F.col("l_quantity").cast("long")
    cents = _cents("l_extendedprice")
    disc = _pct("l_discount")
    tax = _pct("l_tax")
    g = li.select(
        "l_returnflag",
        "l_linestatus",
        qty.alias("qty"),
        cents.alias("cents"),
        (cents * (100 - disc)).alias("disc_units"),
        (cents * (100 - disc) * (100 + tax)).alias("charge_units"),
        disc.alias("disc"),
    ).groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        F.sum("cents").alias("sum_base_cents"),
        F.sum("disc_units").alias("sum_disc_price_units"),
        F.sum("charge_units").alias("sum_charge_units"),
        F.count("*").alias("n_rows"),
        F.sum("disc").alias("sum_disc_pct"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_cents",
        "sum_disc_price_units",
        "sum_charge_units",
        (
            _ha_micro(F.col("sum_qty"), F.col("n_rows")).cast("double") / 1e6
        ).alias("avg_qty"),
        (
            _ha_micro(F.col("sum_disc_pct"), F.col("n_rows")).cast("double") / 1e6
        ).alias("avg_disc_pct"),
        "n_rows",
    )


def revenue_topk(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Q3 shape: unshipped-revenue top-k — broadcast customer dim, one
    orderkey shuffle between the two facts, TakeOrdered top-k."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    rev = (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_units")
    j = li.select("l_orderkey", rev).join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = j.groupBy(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    ).agg(F.sum("rev_units").alias("revenue_units"))
    return agg.orderBy(
        F.col("revenue_units").desc(), F.col("l_orderkey").asc()
    ).limit(k)


def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: per-nation revenue inside one region for one year —
    region->nation chain and both entity dims broadcast; the orderkey
    join is the only data-sized exchange; local-supplier predicate
    (s_nationkey == c_nationkey) like the original."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q5_REGION
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_units")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", rev
    )
    oc = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    j = (
        li.join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
    )
    return j.groupBy("n_name").agg(F.sum("rev_units").alias("revenue_units"))


Q18_MIN_QTY = 300


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total lineitem quantity exceeds a threshold
    — the aggregate-then-join pattern: the per-order quantity rollup runs
    FIRST (map-side combined on the orderkey), its small surviving key set
    drives the detail joins.  Customer is broadcast; the rollup and the
    detail scan share the orderkey exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = big.join(
        orders.hint("shuffle_hash"), big.l_orderkey == orders.o_orderkey
    ).join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    return j.select(
        "c_name",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        _cents("o_totalprice").alias("totalprice_cents"),
        "total_qty",
    )


Q14_START, Q14_END = "1997-01-01", "1997-02-01"


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo-type revenue share for one month — conditional
    aggregation over a broadcast part join, exact integer revenue units,
    share rounded half-away in integer micros (house boundary rule)."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_END).cast("timestamp"))
    )
    rev = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    j = li.select("l_partkey", rev.alias("rev_units")).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    g = j.agg(
        F.sum(F.when(F.col("is_promo"), F.col("rev_units")).otherwise(0)).alias(
            "promo_units"
        ),
        F.sum("rev_units").alias("total_units"),
    )
    share = _ha_micro(F.col("promo_units"), F.col("total_units"))
    return g.select(
        "promo_units",
        "total_units",
        (share.cast("double") / 1e6).alias("promo_share"),
    )


Q10_START, Q10_END = "1996-07-01", "1996-10-01"


def returned_revenue_by_customer(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Q10 shape: revenue lost to returned items per customer for one
    quarter — returnflag filter pushed into the lineitem scan, orders
    date-filtered, customer + nation broadcast, top-k customers.  One
    orderkey shuffle; the custkey rollup rides broadcast joins."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev = (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_units")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", _cents("c_acctbal").alias("acctbal_cents")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.select("l_orderkey", rev)
        .join(orders.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name", "acctbal_cents").agg(
        F.sum("rev_units").alias("revenue_units")
    )
    return agg.orderBy(
        F.col("revenue_units").desc(), F.col("c_custkey").asc()
    ).limit(k)


Q12_YEAR_START, Q12_YEAR_END = "1997-01-01", "1998-01-01"
Q12_PRIORITIES = ("1-URGENT", "2-HIGH")


def shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per order-priority bucket, line counts split into
    high/low priority classes for one year — conditional aggregation
    after the orderkey join, priorities classified by set membership
    (the fixture's o_orderpriority domain stands in for TPC-H's).  The
    reference Q12 groups by ship mode; the fixture lineitem has no ship
    mode column, so the rollup key here is the priority bucket itself
    with the count split by linestatus instead."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q12_YEAR_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q12_YEAR_END).cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus")
    j = li.join(orders.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
    high = F.col("o_orderpriority").isin(*Q12_PRIORITIES)
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: the NOT EXISTS anti-join — above-average-balance
    customers who have never placed an URGENT order, counted per nation
    with their total balance (the urgent-order predicate keeps the
    fixture surface non-trivial: every fixture customer has SOME order).
    Completes the join-type coverage next to Q4's LEFT SEMI: a LEFT ANTI
    equi-join on custkey keeps exactly the probe rows with zero matches
    (an outer join + IS NULL filter would materialize the matched
    multiplicity first).

    Exactness: balances quantize to integer cents; the "above the mean
    positive balance" threshold is the integer CROSS-MULTIPLY
    cents * n > total_cents (never a float division), and the output sum
    is an exact BIGINT.  Scale: the 1-row (total, n) aggregate
    broadcasts; the anti side prunes to the single o_custkey column;
    nation is a broadcast dim; rollup key is the tiny nation domain."""
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_nationkey", cents.alias("cents"))
    )
    tot = cust.agg(
        F.sum("cents").alias("total_cents"), F.count("*").alias("n_pos")
    )
    rich = cust.crossJoin(F.broadcast(tot)).filter(
        F.col("cents") * F.col("n_pos") > F.col("total_cents")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    anti = rich.join(
        o.hint("shuffle_hash"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        anti.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("total_acctbal_cents"),
        )
    )


Q4_YEAR_START, Q4_YEAR_END = "1997-01-01", "1998-01-01"


def priority_semijoin_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: the EXISTS semi-join — count one year's orders that have
    AT LEAST ONE returned line (l_returnflag = 'R'), per order priority.
    TPC-H Q4's commit<receipt predicate has no fixture columns, so the
    returned-line flag stands in; the join SHAPE is the point: a LEFT
    SEMI equi-join on orderkey (first match wins, probe rows never
    duplicate — an inner join + distinct would shuffle the multiplicity
    it is about to throw away).

    Scale: both sides prune to 2 columns at the scan; the semi side is
    fact-sized, so shuffle-hash (not broadcast, not SMJ) like the other
    fact-fact star joins; the rollup key is the tiny priority domain,
    map-side combined."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(Q4_YEAR_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q4_YEAR_END).cast("timestamp"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    j = orders.join(
        returned.hint("shuffle_hash"),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    return j.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q6_START, Q6_END = "1997-01-01", "1998-01-01"


def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the pure scan query — revenue delta from discounted small
    orders in one year.  No joins at all: the date/discount/quantity
    predicates and the 4-column projection all push into the parquet scan
    (PLANS.md shows the pruned ReadSchema), then one global integer sum."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q6_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_END).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    units = _cents("l_extendedprice") * _pct("l_discount")
    return li.agg(
        F.sum(units).alias("revenue_delta_units"),
        F.count("*").alias("n_lines"),
    )


Q15_START, Q15_END = "1997-01-01", "1997-04-01"


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) with the maximum quarterly revenue —
    aggregate -> global argmax -> dimension join, the scalar-subquery
    pattern (TPC-H 15's CREATE VIEW revenue + WHERE total = (SELECT max)).

    Plan: one suppkey-keyed aggregate over the date-filtered lineitem scan
    (map-side combined), a 1-row max aggregate broadcast back over the
    per-supplier rollup (never a sort), and a broadcast supplier-dim join.
    Ties all survive, like the reference SQL.  Revenue in exact integer
    units (cents x (100 - disc)) so the argmax is order-free.

    Scale: per-supplier rollup is |suppliers| rows (~10^7 at SF-100k) —
    the max broadcast and dim join stay tiny; the only data-sized exchange
    is the suppkey aggregate shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
    )
    rev = (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_units")
    per = li.select("l_suppkey", rev).groupBy("l_suppkey").agg(
        F.sum("rev_units").alias("total_rev_units")
    )
    mx = per.agg(F.max("total_rev_units").alias("max_rev_units"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.join(F.broadcast(mx), F.col("total_rev_units") == F.col("max_rev_units"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_units")
    )


def acctbal_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup of customer account balances over (nation, mktsegment)
    — completes the grouping-set matrix next to corpus_rollup_grouping_sets
    (ROLLUP), events_type_pivot (PIVOT), and star_unpivot_measures
    (UNPIVOT).  Spark plans ONE Expand (each row fans to its 4 grouping
    sets map-side) + one aggregate; the grouping_id bitmask disambiguates
    subtotal rows from genuine NULL groups.  Balances quantize to exact
    integer cents so every sum is order-free."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", _cents("c_acctbal").alias("cents")
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = cust.join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        j.cube("n_name", "c_mktsegment")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("total_acctbal_cents"),
        )
        .select(
            "n_name", "c_mktsegment", F.col("gid").cast("long").alias("gid"),
            "n_customers", "total_acctbal_cents",
        )
    )


Q8_REGION = "ASIA"
Q8_NATION = "NATION_3"


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's revenue per order year —
    the multi-dimension-chain conditional-share query (supplier nation vs
    customer region).

    Joins: lineitem <-> orders is the one data-sized exchange (orderkey);
    customer restricts the market through the broadcast nation -> region
    chain; the supplier -> nation chain tags each line with its seller
    nation.  Shares are conditional integer sums ratioed with the house
    round-half-away micro rule — never a float accumulation.

    Scale: at SF-100k the customer dim no longer broadcasts — o_custkey
    join becomes a shuffle (or pre-bucketed storage, join_bucketed_coloc
    pattern); the nation/region/supplier chain stays broadcast."""
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    market_nations = nat.join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("mkt_nationkey"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(market_nations),
        F.col("c_nationkey") == F.col("mkt_nationkey"),
        "left_semi",
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    mkt_orders = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    sup_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", (F.col("n_name") == Q8_NATION).alias("is_target"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev_units"),
    )
    j = (
        li.join(mkt_orders.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup_nat), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    g = j.groupBy("o_year").agg(
        F.sum(F.when(F.col("is_target"), F.col("rev_units")).otherwise(0)).alias(
            "nation_units"
        ),
        F.sum("rev_units").alias("total_units"),
    )
    share = ha_micro(F.col("nation_units"), F.col("total_units"))
    return g.select(
        F.col("o_year").cast("long").alias("o_year"),
        "nation_units",
        "total_units",
        (share.cast("double") / 1e6).alias("mkt_share"),
    )


def revenue_cumshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue share per region by order month: monthly rollup,
    then a cumulative window over the BOUNDED (region x month) aggregate
    and a broadcast region-total join — the burn-up chart every revenue
    dashboard draws.

    Scale contract: the window runs AFTER aggregation, over |regions| x
    |months| rows (hundreds), partitioned by region — never a window over
    fact rows (the lm_perplexity_buckets lesson).  Cumulative sums stay
    integer cents; the share ratio applies the house half-away micro rule
    at the boundary."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "r_name")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        _cents("o_totalprice").alias("cents"),
    )
    monthly = (
        orders.join(cust.hint("shuffle_hash"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "month")
        .agg(F.sum("cents").alias("month_cents"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("r_name")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = monthly.withColumn("cum_cents", F.sum("month_cents").over(w))
    totals = monthly.groupBy("r_name").agg(F.sum("month_cents").alias("region_cents"))
    share = ha_micro(F.col("cum_cents"), F.col("region_cents"))
    return cum.join(F.broadcast(totals), "r_name").select(
        "r_name",
        "month",
        "month_cents",
        "cum_cents",
        (share.cast("double") / 1e6).alias("cum_share"),
    )
