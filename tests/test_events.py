"""Event-analytics operators: retention cohorts, ordered funnel,
props extraction."""

from __future__ import annotations

from datetime import datetime, timezone

from airstrik_py_spark.operators.events import (
    funnel_conversion,
    props_extract,
    retention_cohorts,
)


def _ev(spark, rows):
    """(event_id, day, user_id, event_type[, props]) -> events frame."""
    out = []
    for r in rows:
        eid, day, uid, et, *p = r
        ts = datetime(2024, 1, day, 12, 0, eid % 60, tzinfo=timezone.utc)
        out.append((eid, ts.replace(tzinfo=None), uid, et, 1.0, p[0] if p else None))
    return spark.createDataFrame(
        out,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_retention_cohorts_hand_case(spark):
    # users 1,2 start day 1; user 1 returns day 3; user 3 starts day 2
    rows = [
        (0, 1, 1, "view"), (1, 1, 2, "view"), (2, 3, 1, "click"),
        (3, 2, 3, "view"), (4, 2, 3, "click"),
    ]
    out = {(r["cohort_day"], r["day_offset"]): r
           for r in retention_cohorts(_ev(spark, rows)).collect()}
    d1 = out[("2024-01-01", 0)]
    assert d1["n_users"] == 2 and d1["cohort_size"] == 2 and d1["retention"] == 1.0
    d13 = out[("2024-01-01", 2)]
    assert d13["n_users"] == 1 and d13["retention"] == 0.5
    d2 = out[("2024-01-02", 0)]
    assert d2["n_users"] == 1 and d2["cohort_size"] == 1
    # same-day multiple events count once
    assert len(out) == 3


def test_funnel_requires_order(spark):
    # user 1: view->click->purchase in order (converts all stages)
    # user 2: click BEFORE view, never after -> does not convert stage 2
    # user 3: view then purchase (skips click) -> stops at stage 1
    rows = [
        (0, 1, 1, "view"), (10, 2, 1, "click"), (20, 3, 1, "purchase"),
        (1, 1, 2, "click"), (11, 2, 2, "view"),
        (2, 1, 3, "view"), (12, 2, 3, "purchase"),
    ]
    out = {r["stage"]: r for r in funnel_conversion(_ev(spark, rows)).collect()}
    assert out[1]["n_users"] == 3
    assert out[2]["n_users"] == 1 and out[2]["event_type"] == "click"
    assert out[3]["n_users"] == 1
    assert out[2]["conv_from_prev"] == round(1 / 3, 6)
    assert out[3]["conv_from_prev"] == 1.0
    assert out[3]["conv_from_entry"] == round(1 / 3, 6)


def test_props_extract_null_and_values(spark):
    rows = [
        (0, 1, 1, "view", '{"k": 5}'),
        (1, 1, 2, "view", '{"k": 7}'),
        (2, 1, 3, "view", '{"other": 1}'),
        (3, 1, 4, "click", None),
    ]
    out = {r["event_type"]: r for r in props_extract(_ev(spark, rows)).collect()}
    v = out["view"]
    assert (v["n_events"], v["n_with_k"], v["sum_k"]) == (3, 2, 12)
    assert (v["min_k"], v["max_k"]) == (5, 7)
    c = out["click"]
    assert (c["n_events"], c["n_with_k"], c["sum_k"]) == (1, 0, None)


def test_range_join_window_semantics(spark):
    from pyspark.sql import functions as F

    from airstrik_py_spark.operators.events import preceding_window_counts

    # error at 12:00:30 (day 2); clicks at 11:55:45 (in window, 285s before),
    # 11:55:25 (out, 305s before), 12:00:30 (out, not strictly before),
    # other user's click in-window (out), view in window (in)
    base = datetime(2024, 1, 2, 12, 0, 30)
    def ev(eid, uid, et, dt_s):
        from datetime import timedelta
        return (eid, base + timedelta(seconds=dt_s), uid, et, 1.0, None)
    rows = [
        ev(0, 1, "error", 0),
        ev(1, 1, "click", -285),
        ev(2, 1, "click", -305),
        ev(3, 1, "click", 0),
        ev(4, 2, "click", -10),
        ev(5, 1, "view", -1),
        ev(6, 2, "error", -400),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_id"]: r["n_preceding"] for r in preceding_window_counts(df).collect()}
    assert out == {0: 2, 6: 0}
    # the plan must be an equi-join, never a nested-loop range join
    plan = preceding_window_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_mad_anomalies_flags_only_outliers(spark):
    from airstrik_py_spark.operators.events import value_anomalies_mad

    # user 1: values clustered at ~10 with one wild point; user 2: constant
    # values (MAD = 0 -> never flagged, by guard)
    rows = [(i, 1, 10.0 + (i % 3) * 0.5) for i in range(8)] + [
        (8, 1, 500.0),
        (9, 2, 7.0),
        (10, 2, 7.0),
        (11, 2, 7.0),
    ]
    ev = spark.createDataFrame(
        [(eid, datetime(2024, 1, 1, 12, 0, eid).replace(tzinfo=None), uid, "view", val, None)
         for eid, uid, val in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = value_anomalies_mad(ev)
    got = out.collect()
    assert [r["event_id"] for r in got] == [8]
    assert got[0]["robust_z"] > 3.0


def test_mad_null_and_nan_hardening(spark):
    """r6 hardening (ADVICE r5): NULL values are dropped before ranking and
    a NaN value elsewhere in a group must not poison the group's median
    (the old sum(x*weight) form made NaN*0 = NaN)."""
    import math

    from airstrik_py_spark.operators.events import value_anomalies_mad

    # user 1: clean cluster + one outlier, plus a NULL and a NaN row.
    # NaN sorts last on both engines, so with 11 non-null values the median
    # ranks stay inside the finite cluster and the outlier is still flagged.
    rows = [(i, 1, 10.0 + (i % 3) * 0.5) for i in range(9)] + [
        (9, 1, 500.0),
        (10, 1, None),
        (11, 1, float("nan")),
    ]
    ev = spark.createDataFrame(
        [(eid, datetime(2024, 1, 1, 12, 0, eid).replace(tzinfo=None), uid,
          "view", val, None) for eid, uid, val in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = value_anomalies_mad(ev).collect()
    flagged = sorted(r["event_id"] for r in got)
    # 500.0 flagged; NaN row has adev = NaN which fails the > k*mad filter;
    # NULL row was dropped; medians are finite (not poisoned by the NaN)
    assert 9 in flagged
    assert 10 not in flagged
    for r in got:
        assert not math.isnan(r["med"]) and not math.isnan(r["mad"])


def test_rolling_wau_counts_window_distinct(spark):
    from airstrik_py_spark.operators.events import rolling_active_users

    # day 1: users {1,2}; day 2: {2}; day 9: {3} (outside day-1..2 window)
    rows = [(0, 1, 1), (1, 1, 2), (2, 2, 2), (3, 9, 3)]
    ev = spark.createDataFrame(
        [(eid, datetime(2024, 1, d, 12, 0, 0), uid, "view", 1.0, None)
         for eid, d, uid in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["day"]: r for r in rolling_active_users(ev).collect()}
    assert out["2024-01-01"]["dau"] == 2 and out["2024-01-01"]["wau"] == 2
    # day 2's 7-day window [Jan 2 back to Dec 27] sees users 1 and 2
    assert out["2024-01-02"]["dau"] == 1 and out["2024-01-02"]["wau"] == 2
    assert out["2024-01-02"]["stickiness"] == 0.5
    # day 9 window reaches back to day 3 only -> just user 3
    assert out["2024-01-09"]["wau"] == 1


def test_path_trigrams_ordering_and_counts(spark):
    from airstrik_py_spark.operators.events import path_trigrams_topk

    # user 1: v,c,p,v -> trigrams v>c>p, c>p>v ; user 2: v,c,p -> v>c>p
    seq = {1: ["view", "click", "purchase", "view"], 2: ["view", "click", "purchase"]}
    rows = []
    eid = 0
    for uid, types in seq.items():
        for j, et in enumerate(types):
            rows.append((eid, datetime(2024, 1, 1, 12, 0, j), uid, et, 1.0, None))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = path_trigrams_topk(ev, k=5).collect()
    got = {r["path"]: (r["rank"], r["n_paths"]) for r in out}
    assert got["view>click>purchase"] == (1, 2)
    assert got["click>purchase>view"][1] == 1
    assert len(out) == 2


def test_gapfill_emits_zero_hours(spark):
    from airstrik_py_spark.operators.events import hourly_timeseries_gapfill

    # events at hours 0 and 3 -> hours 1 and 2 must appear with zero
    rows = [(0, 0, 10), (1, 3, 20)]
    ev = spark.createDataFrame(
        [(eid, datetime(2024, 1, 1, h, 30, 0), uid, "view", 1.0, None)
         for eid, h, uid in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["hour"]: r["n_events"] for r in hourly_timeseries_gapfill(ev).collect()}
    assert out == {
        "2024-01-01 00:00": 1,
        "2024-01-01 01:00": 0,
        "2024-01-01 02:00": 0,
        "2024-01-01 03:00": 1,
    }


def test_ab_welch_t_symmetric_variants(spark):
    """Identical value distributions in both variants -> t == 0 and the
    pooled df reduces to the standard equal-variance form."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from airstrik_py_spark.operators.events import ab_welch_t

    rows = []
    for uid in range(8):  # 4 even (A) + 4 odd (B), same values in each
        for j, v in enumerate([1.0, 2.0, 3.0]):
            rows.append((uid * 10 + j, datetime(2024, 1, 1), uid, "view", v, None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = ab_welch_t(ev).collect()[0]
    assert out["n_a"] == out["n_b"] == 12
    assert out["mean_a"] == out["mean_b"] == 2.0
    assert out["welch_t"] == 0.0
    assert out["welch_df"] == 22.0  # equal n, equal var -> n_a + n_b - 2


def test_ab_welch_t_degenerate_inputs_emit_zero_rows(spark):
    """The n>=2-per-variant contract (ADVICE r3): one empty variant, or a
    variant with a single row, must produce ZERO rows — matching the
    oracle's cross-join + WHERE n>1 semantics — never a row of NULL/inf
    stats."""
    from datetime import datetime

    from airstrik_py_spark.operators.events import ab_welch_t

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    # Only even user_ids -> variant B empty.
    only_a = spark.createDataFrame(
        [(i, datetime(2024, 1, 1), 2 * i, "view", float(i), None) for i in range(6)],
        schema,
    )
    assert ab_welch_t(only_a).count() == 0
    # Variant B has exactly one row -> (n-1)=0 division is engine-dependent;
    # the guard keeps it out entirely.
    one_b = spark.createDataFrame(
        [(i, datetime(2024, 1, 1), 2 * i, "view", float(i), None) for i in range(6)]
        + [(99, datetime(2024, 1, 1), 1, "view", 5.0, None)],
        schema,
    )
    assert ab_welch_t(one_b).count() == 0


def test_attribution_last_touch_hand_case(spark):
    """purchase joins to the latest strictly-earlier click of the SAME
    user; later clicks don't count; no prior click -> NULL touch."""
    from airstrik_py_spark.operators.events import attribution_last_touch

    # (eid, second, uid, type): user 1 click@1, click@3, purchase@4,
    # click@5; user 2 purchase@2 with no prior click
    rows = [
        (0, 1, 1, "click"), (1, 3, 1, "click"), (2, 4, 1, "purchase"),
        (3, 5, 1, "click"), (4, 2, 2, "purchase"), (5, 6, 2, "click"),
    ]
    ev = spark.createDataFrame(
        [(eid, datetime(2024, 1, 1, 0, 0, sec).replace(tzinfo=None), uid,
          et, 10.0, None) for eid, sec, uid, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["conversion_id"]: r for r in attribution_last_touch(ev).collect()}
    assert set(out) == {2, 4}
    assert out[2]["touch_id"] == 1  # latest prior click, not eid 0 or 3
    assert out[2]["gap_us"] == 1_000_000
    assert out[4]["touch_id"] is None and out[4]["gap_us"] is None


def test_value_rolling_sum_range_frame(spark):
    """RANGE frame includes events exactly 1h back (inclusive) and tied
    timestamps as peers; sums are exact centi units."""
    from airstrik_py_spark.operators.events import value_rolling_sum

    # user 1: events at 0s, 1800s, 3600s, 7201s; ties at 1800s
    rows = [
        (0, 0, 1, 10.00), (1, 1800, 1, 5.25), (2, 1800, 1, 2.00),
        (3, 3600, 1, 1.00), (4, 7201, 1, 4.00),
    ]
    ev = spark.createDataFrame(
        [(eid, datetime(2024, 1, 1) + __import__("datetime").timedelta(seconds=sec),
          uid, "view", val, None) for eid, sec, uid, val in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_id"]: r for r in value_rolling_sum(ev).collect()}
    # event 1 and 2 are RANGE peers: both frames include both tied rows
    assert out[1]["n_1h"] == 3 and out[2]["n_1h"] == 3
    assert out[1]["sum_1h_centi"] == 1725 and out[2]["sum_1h_centi"] == 1725
    # event 3 at 3600s still includes event 0 at 0s (inclusive bound)
    assert out[3]["n_1h"] == 4 and out[3]["sum_1h_centi"] == 1825
    # event 4 at 7201s: frame [3601, 7201] excludes even the 3600s event
    assert out[4]["n_1h"] == 1 and out[4]["sum_1h_centi"] == 400


def test_rfm_segment_boundaries(spark):
    """Threshold edges: exactly-7-day recency is still 'recent'; exactly-3
    purchases is 'frequent'; only purchases count."""
    from airstrik_py_spark.registry.extras_q import q_events_rfm_segments

    rows = [
        # user 1: 3 purchases, last on day 23 (recency 7 from max day 30)
        (0, 1, 1, "purchase"), (1, 10, 1, "purchase"), (2, 23, 1, "purchase"),
        # user 2: 1 purchase day 30 (recency 0, freq 1) -> active
        (3, 30, 2, "purchase"),
        # user 3: 3 purchases, last day 1 -> lapsing-whale
        (4, 1, 3, "purchase"), (5, 1, 3, "purchase"), (6, 1, 3, "purchase"),
        # user 4: 1 old purchase -> dormant; clicks must not count
        (7, 2, 4, "purchase"), (8, 30, 4, "click"),
    ]
    ev = spark.createDataFrame(
        [(eid, datetime(2024, 1, day, 12), uid, et, 10.0, None)
         for eid, day, uid, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(td + "/events.parquet")
        out = {r["user_id"]: r for r in q_events_rfm_segments(spark, td).collect()}
    assert out[1]["segment"] == "core" and out[1]["recency_days"] == 7
    assert out[2]["segment"] == "active"
    assert out[3]["segment"] == "lapsing-whale"
    assert out[4]["segment"] == "dormant" and out[4]["frequency"] == 1
    assert out[1]["monetary_centi"] == 3000
