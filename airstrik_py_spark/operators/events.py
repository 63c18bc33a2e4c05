"""Event-stream analytics over the `events` table: retention cohorts,
ordered funnel conversion, and semi-structured props extraction.

These are the engine-breadth operators a product-analytics consumer of the
same store would run; they follow the house contract — pure Catalyst, every
shuffle accounted for, DuckDB oracle per query (registry/extras_q.py).

Scale notes (100 TB of events ≈ 10^12 rows over ~10^9 users):
  * retention_cohorts — two aggregates keyed on user_id (the second rides
    the first's exchange) and a final rollup on (cohort_day, offset) —
    ~30×90 keys, map-side combined.  countDistinct over users is exact by
    contract here; the documented scale swap is approx_count_distinct.
  * funnel_conversion — ONE lazy plan: a single user-keyed aggregate
    folds each user's time-sorted funnel events into the chained
    first-occurrence stage times (JVM Column fold, state = 3 doubles),
    then a 1-row global count inlined to the 3 stage rows.  One scan,
    one data-sized exchange, no driver-side action anywhere.
  * props_extract — pure map (get_json_object) into a per-type aggregate
    on a tiny key space.  JSON parsing is JVM-side codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

FUNNEL_STAGES = ("view", "click", "purchase")


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Classic D-N retention: cohort = each user's first active day;
    for every (cohort_day, day_offset) count the distinct users active
    that many days after their first day, plus the retention rate against
    the cohort size."""
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    act = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    j = act.join(first, "user_id")
    per = j.groupBy(
        "cohort_day", F.datediff("day", "cohort_day").alias("day_offset")
    ).agg(F.countDistinct("user_id").alias("n_users"))
    size = first.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return per.join(F.broadcast(size), "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("int").alias("day_offset"),
        "n_users",
        "cohort_size",
        F.round(
            F.col("n_users").cast("double") / F.col("cohort_size").cast("double"), 6
        ).alias("retention"),
    )


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Ordered funnel over FUNNEL_STAGES with strict first-occurrence
    subsequence semantics: stage i counts a user iff some stage-i event
    happens strictly after the user's recorded stage-(i-1) time (t_i =
    min event time of stage i after t_{i-1}).  Emits one row per stage
    with the user count and conversion rates vs the previous stage and
    the funnel entry.

    ONE lazy plan (r2 VERDICT fix — the old form ran a driver-side
    .count() per stage, recomputing the scan stages x times): per user,
    the time-sorted funnel events fold (JVM F.aggregate, no Python) into
    the chained stage times — ascending order makes "first stage-i event
    strictly after t_{i-1}" exactly "min stage-i time > t_{i-1}" — then
    one global count aggregate inlined to the 3 stage rows.  Fold state
    is 3 doubles; the collect_list is bounded per user by that user's
    funnel-event count, and events outside FUNNEL_STAGES are filtered
    before the exchange."""
    stages = list(FUNNEL_STAGES)
    if len(stages) != 3:
        # the fold state and output rows are unrolled for exactly 3 stages;
        # a longer FUNNEL_STAGES would silently drop the extra stages
        raise ValueError(
            f"funnel_conversion is unrolled for 3 stages, got {len(stages)}"
        )
    ts_sec = (F.unix_micros("ts").cast("double") / F.lit(1e6))
    base = events.filter(F.col("event_type").isin(*stages)).select(
        "user_id", "event_type", ts_sec.alias("sec")
    )

    def _fold(acc: F.Column, x: F.Column) -> F.Column:
        t1, t2, t3 = acc.getField("t1"), acc.getField("t2"), acc.getField("t3")
        sec, typ = x.getField("sec"), x.getField("event_type")
        return F.struct(
            F.coalesce(t1, F.when(typ == stages[0], sec)).alias("t1"),
            F.coalesce(
                t2, F.when((typ == stages[1]) & (sec > t1), sec)
            ).alias("t2"),
            F.coalesce(
                t3, F.when((typ == stages[2]) & (sec > t2), sec)
            ).alias("t3"),
        )

    d_null = F.lit(None).cast("double")
    zero = F.struct(d_null.alias("t1"), d_null.alias("t2"), d_null.alias("t3"))
    per_user = base.groupBy("user_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("sec", "event_type"))),
            zero,
            _fold,
        ).alias("t")
    )
    n = per_user.agg(
        F.count("t.t1").alias("n1"),
        F.count("t.t2").alias("n2"),
        F.count("t.t3").alias("n3"),
    )

    def _conv(num: F.Column, den: F.Column) -> F.Column:
        return F.round(num.cast("double") / den, 6)

    n1, n2, n3 = F.col("n1"), F.col("n2"), F.col("n3")
    rows = F.array(
        F.struct(
            F.lit(1).alias("stage"),
            F.lit(stages[0]).alias("event_type"),
            n1.alias("n_users"),
            _conv(n1, n1).alias("conv_from_prev"),
            _conv(n1, n1).alias("conv_from_entry"),
        ),
        F.struct(
            F.lit(2).alias("stage"),
            F.lit(stages[1]).alias("event_type"),
            n2.alias("n_users"),
            _conv(n2, n1).alias("conv_from_prev"),
            _conv(n2, n1).alias("conv_from_entry"),
        ),
        F.struct(
            F.lit(3).alias("stage"),
            F.lit(stages[2]).alias("event_type"),
            n3.alias("n_users"),
            _conv(n3, n2).alias("conv_from_prev"),
            _conv(n3, n1).alias("conv_from_entry"),
        ),
    )
    return n.select(F.inline(rows))


RANGE_WINDOW_US = 300_000_000  # 5 minutes, integer microseconds


def preceding_window_counts(events: DataFrame) -> DataFrame:
    """Range join done the scale-safe way: for every `error` event, count
    the same user's click/view events in the strictly-preceding 5-minute
    window.

    A naive `a.join(b, (b.ts >= a.ts - 5m) & (b.ts < a.ts))` is a
    BroadcastNestedLoopJoin — O(N*M) and the classic Spark range-join
    trap.  Instead both sides bin time into window-sized integer buckets
    (all arithmetic in integer microseconds — no float in the bucket
    decision), the probe side explodes each error into its 2 candidate
    bins (window length == bin width, so [t-W, t) spans at most 2), and
    the join becomes an EQUI-join on (user_id, time_bin) with the exact
    window predicate as a post-filter.  tests/test_events.py pins the
    no-BNLJ plan.

    Scale (100 TB): join key cardinality = users × bins — maximal,
    skew-free; per-key fan-out is the window occupancy, never N.  The
    2× probe-side explode is the entire overhead."""
    us = F.unix_micros("ts")
    err = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", us.alias("e_us")
    )
    oth = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("o_user"),
        us.alias("o_us"),
        F.expr(f"unix_micros(ts) div {RANGE_WINDOW_US}").alias("bin"),
    )
    probe = err.withColumn(
        "bin",
        F.explode(
            F.array(
                F.expr(f"e_us div {RANGE_WINDOW_US} - 1"),
                F.expr(f"e_us div {RANGE_WINDOW_US}"),
            )
        ),
    )
    # shuffled-hash, not sort-merge: neither side benefits from a sort and
    # the build side is the smaller filtered stream
    hits = (
        probe.join(
            oth.hint("shuffle_hash"),
            (probe.user_id == oth.o_user) & (probe.bin == oth.bin),
        )
        .filter(
            (F.col("o_us") >= F.col("e_us") - RANGE_WINDOW_US)
            & (F.col("o_us") < F.col("e_us"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n_preceding"))
    )
    return err.join(hits.hint("shuffle_hash"), "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce(F.col("n_preceding"), F.lit(0).cast("long")).alias("n_preceding"),
    )


SESSION_GAP_S = 1800


def sessionize_events(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Generic gap-based sessionization of the event stream: per user, a new
    session starts when the gap to the previous event is STRICTLY greater
    than ``gap_s`` (same open boundary as the flight sessionizer,
    sessions.with_session_id / airstrik.py:482).  Emits one row per session
    with exact microsecond bounds — integer arithmetic end-to-end so the
    oracle hash-matches bit-for-bit.

    Shape: one hash exchange on user_id feeding BOTH the lag window and the
    session rollup (subset clustering — the groupBy(user_id, session_n)
    rides the window's partitioning).  At 10^12 events / 10^9 users the
    per-key row count is the only sort cost; no global sort, no second
    shuffle.  Streaming equivalent: F.session_window (streaming/pipeline.py)
    — the batch form here is the replay/backfill path.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new = (
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > gap_s * 1_000_000),
            1,
        )
        .otherwise(0)
    )
    rows = (
        events.select("event_id", "user_id", us.alias("us"))
        .withColumn("is_new", new)
        .withColumn(
            "session_n",
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return rows.groupBy("user_id", "session_n").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


def props_extract(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull the integer `k` out of the JSON
    `props` column (JVM-side get_json_object, no UDF) and aggregate it
    per event_type — the schema-on-read pattern for sparse event
    payloads."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


MAD_K = 3.0


def value_anomalies_mad(events: DataFrame, k: float = MAD_K) -> DataFrame:
    """Robust per-user outlier detection on the `value` measure: flag events
    whose absolute deviation from the user's median exceeds k x MAD (median
    absolute deviation) — the classic robust z-score, immune to the
    outliers it is hunting (unlike mean/stddev).

    Version-proofed r5 (ORACLES-PORTABILITY.md): no engine median /
    percentile builtin on either side — both medians are the explicit
    half-sum of the two middle order statistics (rank within user, pick
    ranks (n+1)//2 and (n+2)//2; odd n collapses both onto the middle
    row).  (x_lo + x_hi) / 2.0 divides by a power of two, so it is
    IEEE-exact and engine-version-independent.

    Shape: one user-keyed rank window + conditional-sum aggregate for the
    median, a second pair for the MAD (exact by contract —
    approx_percentile is the documented 100 TB swap), then the per-user
    stats join back on user_id (linear equi-join; broadcastable when the
    user dimension fits).  Returns only the anomalous rows.

    NULL/NaN hardening (r6, ORACLES-PORTABILITY.md): NULL `value` rows are
    filtered before the rank window on BOTH engines — the replaced median
    builtin ignored NULLs, and a ranked NULL would diverge anyway (Spark
    ranks NULLS FIRST ascending, DuckDB NULLS LAST).  The middle-row
    contribution is a CASE that emits literal 0 for non-selected rows
    instead of multiplying every row's value by 0/1, so a single NaN/±Inf
    value elsewhere in a group cannot poison the sum (NaN*0 = NaN)."""
    v = events.select("event_id", "user_id", "value").filter(
        F.col("value").isNotNull()
    )

    def exact_median(df: DataFrame, col: str) -> DataFrame:
        grp = Window.partitionBy("user_id")
        ranked = df.select(
            "user_id",
            F.col(col).alias("x"),
            F.row_number().over(grp.orderBy(col)).alias("rn"),
            F.count("*").over(grp).alias("cnt"),
        )
        lo = F.call_function("div", F.col("cnt") + 1, F.lit(2))
        hi = F.call_function("div", F.col("cnt") + 2, F.lit(2))
        contrib = F.when(F.col("rn") == lo, F.col("x")).otherwise(
            F.lit(0.0)
        ) + F.when(F.col("rn") == hi, F.col("x")).otherwise(F.lit(0.0))
        return ranked.groupBy("user_id").agg(
            (F.sum(contrib) / F.lit(2.0)).alias("med")
        )

    med = exact_median(v, "value")
    dev = v.join(med, "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = exact_median(dev, "adev").withColumnRenamed("med", "mad")
    flagged = dev.join(mad, "user_id").filter(
        (F.col("mad") > 0) & (F.col("adev") > F.lit(k) * F.col("mad"))
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        F.round(F.col("adev") / F.col("mad"), 6).alias("robust_z"),
    )


ROLLING_SUM_US = 3_600_000_000  # 1 hour in integer microseconds


def value_rolling_sum(events: DataFrame, window_us: int = ROLLING_SUM_US) -> DataFrame:
    """Per-user trailing-hour activity load: for every event, the count
    and value-sum of the same user's events in the inclusive time RANGE
    [t - 1h, t] — the sliding-aggregate feature both rate limiters and
    behavioral features feed on.

    This is the RANGE-frame window (peers by ORDER VALUE, not row
    position): both engines define the frame identically over the integer
    microsecond key, including tied timestamps joining the same frame.
    Values quantize to exact centi units BEFORE the window sum
    (ORACLES-PORTABILITY.md SS11 — a double sum inside a sliding frame
    would accumulate in engine-owned order), so the rolling sum is pure
    integer arithmetic.

    Scale: hash-partitioned on user_id, sort within partition by time —
    one exchange; frame evaluation is the engine's sliding two-pointer,
    linear per user.  No self-join, no explode."""
    us = F.unix_micros("ts")
    vc = F.round(F.col("value") * 100, 0).cast("long")
    e = events.select(
        "event_id", "user_id", us.alias("us"), vc.alias("value_centi")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-window_us, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "us",
        F.count("*").over(w).alias("n_1h"),
        F.sum("value_centi").over(w).alias("sum_1h_centi"),
    )


ATTRIB_TOUCH = "click"
ATTRIB_CONVERSION = "purchase"


def attribution_last_touch(
    events: DataFrame,
    touch: str = ATTRIB_TOUCH,
    conversion: str = ATTRIB_CONVERSION,
) -> DataFrame:
    """Last-touch attribution: each conversion event joins to the SAME
    user's most recent strictly-earlier touch event — the classic
    marketing-attribution as-of join, expressed as a stream-local window
    instead of a self-join.

    Shape: one window PARTITIONED by user_id ordered by (epoch_us,
    event_id), frame (unbounded preceding, -1): `last(touch-struct,
    ignorenulls)` carries the latest preceding touch to every row, and a
    filter keeps conversions.  Linear in events, hash-partitioned on
    user_id, zero self-joins — the equivalent range self-join would
    shuffle the table against itself.  Unattributed conversions (no prior
    touch) survive with NULL touch columns, so funnel-entry analysis
    keeps them.  Both engines order by the identical (us, event_id) total
    key; DuckDB mirrors with last_value(... IGNORE NULLS)."""
    us = F.unix_micros("ts")
    e = events.select(
        "event_id", "user_id", "event_type", "value", us.alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_struct = F.last(
        F.when(
            F.col("event_type") == touch,
            F.struct(F.col("us").alias("t_us"), F.col("event_id").alias("t_id")),
        ),
        ignorenulls=True,
    ).over(w)
    attributed = e.withColumn("_touch", touch_struct).filter(
        F.col("event_type") == conversion
    )
    return attributed.select(
        F.col("event_id").alias("conversion_id"),
        "user_id",
        F.round("value", 6).alias("value"),
        F.col("_touch.t_id").alias("touch_id"),
        (F.col("us") - F.col("_touch.t_us")).alias("gap_us"),
    )


WAU_DAYS = 7


def rolling_active_users(events: DataFrame, window_days: int = WAU_DAYS) -> DataFrame:
    """DAU + exact rolling W-day active users (WAU) + stickiness per day.

    The sliding DISTINCT window is done the equi-join way: each (user, day)
    activity row fans out to the `window_days` report days it contributes
    to (explode of a date sequence — bounded fan-out), then one
    countDistinct per report day.  No nested-loop range join, no
    day-by-day self-join; report days with no anchor DAU (pure tail of a
    window) are inner-joined away.  At 10^12 events the exact distinct is
    the documented local form; the scale swap is a mergeable HLL sketch
    per (day) bucket (approx_count_distinct), same fan-out shape."""
    act = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    dau = act.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    fan = act.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), window_days - 1)
            )
        ).alias("report_day"),
    )
    wau = fan.groupBy("report_day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, dau.day == wau.report_day)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


PATH_TOPK = 15


def path_trigrams_topk(events: DataFrame, k: int = PATH_TOPK) -> DataFrame:
    """User-journey mining: the top-k most common consecutive 3-event-type
    sequences across all users (lag-window trigrams over each user's
    time-ordered stream), with deterministic (count desc, path asc)
    ranking.

    Shape: one hash exchange on user_id for the two lag windows, a
    map-side-combined count on the trigram string (key space = types^3,
    tiny), and a rank window over that constant-size aggregate."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    t = (
        events.select("event_id", "user_id", "event_type", us.alias("us"))
        .withColumn("p1", F.lag("event_type", 2).over(w))
        .withColumn("p2", F.lag("event_type", 1).over(w))
        .filter(F.col("p1").isNotNull())
        .select(
            F.concat_ws(">", "p1", "p2", "event_type").alias("path")
        )
    )
    agg = t.groupBy("path").agg(F.count("*").alias("n_paths"))
    rank_w = Window.orderBy(F.desc("n_paths"), F.asc("path"))
    return (
        agg.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("rank", "path", "n_paths")
    )


def hourly_timeseries_gapfill(events: DataFrame) -> DataFrame:
    """Dense hourly event-count time series: hours with no events appear
    as explicit zero rows (gap filling) — the materialization dashboards
    and window-based anomaly detectors need.

    Shape: the hour spine generates from the stream's own min/max hour (a
    1-row aggregate exploded via sequence — spine size is time-range
    bound, not data bound), then the per-hour counts hash-join the spine.
    At 10^12 events the count aggregate is the only data-sized exchange;
    the spine join is broadcast."""
    hours = events.select(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    )
    counts = hours.groupBy("hour").agg(F.count("*").alias("n_events"))
    spine = (
        hours.agg(
            F.min("hour").alias("lo"), F.max("hour").alias("hi")
        )
        .select(
            F.explode(
                F.sequence(
                    F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR")
                )
            ).alias("hour")
        )
    )
    return (
        spine.join(F.broadcast(counts), "hour", "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        )
    )


AB_SCALE = 100  # centi-units: BIGINT sumsq headroom to ~10^12 rows


def ab_welch_t(events: DataFrame) -> DataFrame:
    """Experiment analysis: Welch's t between two deterministic variants
    (user_id parity) on the event `value` metric — the readout every
    product-analytics pipeline runs after an A/B assignment.

    Exactness: per-variant moments are EXACT BIGINT sums of centi-quantized
    values (order-free across engines and partitionings, like
    embedding_dim_stats); mean/variance/t derive from those integers with
    the same IEEE double expressions on both engines, rounded 6 dp at the
    very end.  Sample variance uses n-1.  Centi (not micro) because the
    second moment must fit BIGINT: vq^2 <= ~3e9 here leaves headroom to
    ~10^12 rows; past that swap the two sums to DECIMAL(38,0)/HUGEINT
    exactly like embedding_dim_stats documents.

    Scale: one map-side-combined aggregation into two groups; the t-stat
    math runs on a 2-row frame pivoted to one row — no shuffle beyond the
    2-group exchange."""
    vq = F.round(F.col("value") * F.lit(AB_SCALE), 0).cast("long")
    g = (
        events.filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")).alias(
                "variant"
            ),
            vq.alias("vq"),
        )
        .groupBy("variant")
        .agg(
            F.count("*").alias("n"),
            F.sum("vq").alias("sum_q"),
            F.sum(F.col("vq") * F.col("vq")).alias("sumsq_q"),
        )
    )
    # Degenerate-input contract (guarded identically in the _AB_T oracle):
    # a variant with 0 rows would pivot to one row of NULL stats here but
    # zero rows in the oracle's `FROM a, b`, and n=1 hits (n-1)=0 division
    # whose semantics differ across engines.  Require n>=2 per variant —
    # below that Welch's t is undefined anyway — so both paths emit zero
    # rows on degenerate inputs.
    one = (
        g.groupBy()
        .pivot("variant", ["A", "B"])
        .agg(
            F.first("n").alias("n"),
            F.first("sum_q").alias("sum_q"),
            F.first("sumsq_q").alias("sumsq_q"),
        )
        .filter((F.col("A_n") > 1) & (F.col("B_n") > 1))
    )

    def _stats(p: str):
        n = F.col(f"{p}_n").cast("double")
        s = F.col(f"{p}_sum_q").cast("double")
        ss = F.col(f"{p}_sumsq_q").cast("double")
        mean = s / n / AB_SCALE
        # sample variance from exact integer moments: (ss - s^2/n) / (n-1)
        var = (ss - s * s / n) / (n - F.lit(1.0)) / (AB_SCALE * AB_SCALE)
        return n, mean, var

    na, ma, va = _stats("A")
    nb, mb, vb = _stats("B")
    se2 = va / na + vb / nb
    t = (ma - mb) / F.sqrt(se2)
    dfree = (se2 * se2) / (
        (va / na) * (va / na) / (na - F.lit(1.0))
        + (vb / nb) * (vb / nb) / (nb - F.lit(1.0))
    )
    return one.select(
        F.col("A_n").alias("n_a"),
        F.col("B_n").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("welch_t"),
        F.round(dfree, 6).alias("welch_df"),
    )


def new_vs_returning(events: DataFrame) -> DataFrame:
    """Per-day acquisition split: how many of the day's active users are
    NEW (first-ever activity day) vs RETURNING — the growth-accounting
    companion to rolling_active_users.

    Shape: distinct (user, day) activity, one user-keyed min-day
    aggregate, then a user-keyed equi-join back and a per-day conditional
    count — two hash exchanges on user_id (the first-day rollup rides the
    distinct's partitioning), one tiny day rollup.  At 10^12 events the
    first-day frame is exactly the persisted per-user profile a real
    pipeline maintains incrementally (min is merge-able), so the backfill
    and incremental forms agree."""
    act = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = act.join(first, "user_id")
    return (
        j.groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)).alias(
                "n_new"
            ),
            F.sum(F.when(F.col("day") != F.col("first_day"), 1).otherwise(0)).alias(
                "n_returning"
            ),
            F.count("*").alias("dau"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_new", "n_returning", "dau",
        )
    )


def session_bounce_stats(events: DataFrame) -> DataFrame:
    """Per-day session quality: session count, single-event (bounce)
    count, and bounce rate — composed on sessionize_events so the session
    boundary rule lives in ONE place.  The day bucket is the session's
    START day (a session spanning midnight counts once, where it began).

    Shape: everything upstream is the sessionizer's single user_id
    exchange; this adds only a tiny day rollup.  The rate applies the
    house round-half-away micro rule so the ratio is bit-stable across
    engines."""
    from airstrik_py_spark.functions.exact import ha_micro

    s = sessionize_events(events)
    daily = (
        s.select(
            F.date_format(
                F.to_date(F.timestamp_micros(F.col("start_us"))), "yyyy-MM-dd"
            ).alias("day"),
            (F.col("n_events") == 1).alias("is_bounce"),
        )
        .groupBy("day")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("is_bounce"), 1).otherwise(0)).alias("n_bounces"),
        )
    )
    rate = ha_micro(F.col("n_bounces"), F.col("n_sessions"))
    return daily.select(
        "day", "n_sessions", "n_bounces",
        (rate.cast("double") / 1e6).alias("bounce_rate"),
    )
