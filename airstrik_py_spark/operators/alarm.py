"""Geofence matching + predictive dead-reckoning alarm — SURVEY.md §2.2 F2,
§2.5 W6, §2.6 D1/D2.

F2/W6 are pure Catalyst predicates.  D1 (get_alarm_info, airstrik.py:223-278)
is the one genuinely custom operator: per plane, simulate positions
t = 0..think_ahead-1 seconds ahead along the current heading at the current
speed and find the first second entering the widest geofence.  We unroll the
simulation relationally — explode(sequence(...)) -> forward-geodesic per
step -> window-based early-exit replication -> aggregate — all whole-stage
codegen, no Python.  The row multiplier (think_ahead) is gated on "heading
and speed available" BEFORE the explode, so Catalyst never materializes steps
for planes that can't simulate.  At 100 TB the unroll is embarrassingly
parallel (partition-local; the step windows repartition on (hex, event_id)
which is finer than hex — no skew possible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from airstrik_py_spark.config import EngineConfig
from airstrik_py_spark.functions.geo import dest_lat_deg, dest_lon_deg, haversine_km

# Reference sentinel: min_radius when the zone is never entered
# (airstrik.py:232 `min_radius = 100000000`).
MIN_RADIUS_SENTINEL = 100000000.0


def matched_filters(dist: Column, alt: Column, cfg: EngineConfig) -> Column:
    """F2 — names of configured geofences matched by (dist, alt), comma
    joined in config order (match_filters, airstrik.py:415-427: dist <= max
    AND (alt unknown OR alt <= max))."""
    parts = [
        F.when(
            (dist <= F.lit(gf.max_dist_km))
            & (alt.isNull() | (alt <= F.lit(gf.max_alt_m))),
            F.lit(gf.name),
        )
        for gf in cfg.filters
    ]
    return F.concat_ws(",", *parts)


def _dead_reckoning_fold(
    df: DataFrame, cfg: EngineConfig, heading: Column, can_sim: Column
) -> DataFrame:
    """The spherical D1 lane as ONE per-row array fold (r15 optimization).

    The former shape — explode(sequence) -> two (hex, event_id) windows ->
    groupBy -> join back onto `df` — made Catalyst evaluate the ENTIRE
    upstream kinematics pipeline twice (two parquet scans, two hex
    exchanges, double window sorts: plans/r15/alarm_dead_reckoning_before
    .txt), because the probe and build subtrees differ and nothing reuses.
    The simulation state for one fix depends only on that row, so the whole
    step loop folds into a single F.aggregate over sequence(0, h-1):
    zero extra passes, zero joins, zero exchanges beyond the kinematics
    one, still whole-stage codegen (the lambda is a runtime loop, not an
    h-times-inlined expression).  Step arithmetic, break order (oob checked
    before growth, breaking step excluded — see dead_reckoning docstring)
    and null propagation are expression-identical to the unrolled form, so
    outputs are bit-identical (oracle-checked at sf0.001/0.01/0.1).
    """
    step_w = F.sequence(F.lit(0), F.lit(int(cfg.think_ahead)) - 1)
    zero = F.struct(
        F.lit(False).alias("broken"),
        F.lit(None).cast("double").alias("prevd"),
        F.lit(False).alias("ll"),
        F.lit(None).cast("int").alias("at"),
        F.lit(None).cast("double").alias("mr"),
    )

    def step(acc: Column, t: Column) -> Column:
        step_km = (F.col("calc_speed") / 3600.0) * t
        slat = dest_lat_deg(F.col("lat"), heading, step_km)
        slon = dest_lon_deg(F.col("lat"), F.col("lon"), slat, heading, step_km)
        sdist = haversine_km(
            F.lit(cfg.home_lat), F.lit(cfg.home_lon), slat, slon
        )
        in_zone = sdist < F.lit(cfg.most_generous_dist_km)
        oob = (F.abs(slat) > 90.0) | (F.abs(slon) > 90.0)
        growth = in_zone & acc["prevd"].isNotNull() & (sdist > acc["prevd"])
        return F.when(
            acc["broken"] | oob | growth,
            F.struct(
                F.lit(True).alias("broken"),
                acc["prevd"].alias("prevd"),
                acc["ll"].alias("ll"),
                acc["at"].alias("at"),
                acc["mr"].alias("mr"),
            ),
        ).otherwise(
            F.struct(
                F.lit(False).alias("broken"),
                F.when(in_zone, sdist).otherwise(acc["prevd"]).alias("prevd"),
                (acc["ll"] | in_zone).alias("ll"),
                F.coalesce(acc["at"], F.when(in_zone, t)).alias("at"),
                F.when(in_zone & acc["mr"].isNotNull(), F.least(acc["mr"], sdist))
                .when(in_zone, sdist)
                .otherwise(acc["mr"])
                .alias("mr"),
            )
        )

    alt_ok = F.col("alt_geom").isNull() | (
        F.col("alt_geom") <= F.lit(cfg.most_generous_alt_m)
    )
    # Materialize the fold ONCE PER ROW behind a Generate barrier (r15 —
    # the round's single biggest win).  `F.aggregate` is a higher-order
    # function: it runs INTERPRETED (CodegenFallback, no whole-stage
    # codegen and no common-subexpression elimination), and a plain
    # `withColumn("_sim", ...)` is a Project that CollapseProject inlines
    # into every downstream expression that references a derived column —
    # alarm_payload's filter/eta alone re-inlined the whole 60-step fold
    # several times over, and each inlined copy re-evaluates the loop per
    # row (measured: alarm_payload noop at sf0.1 was 412 s against 7-13 s
    # for dead_reckoning itself; sink_kafka_alert profiled at 394 s).
    # explode(array(x)) evaluates x exactly once per input row inside a
    # Generate node — a plan barrier CollapseProject cannot cross — so
    # `_sim` becomes a materialized ATTRIBUTE and every downstream
    # reference is a field access, not a fold re-evaluation.  A 1-element
    # array explode never drops or duplicates rows (explode skips only
    # empty arrays; a NULL element passes through as a NULL value).
    return (
        df.withColumn("can_sim", can_sim)
        .withColumn(
            "_sim", F.explode(F.array(F.when(can_sim, F.aggregate(step_w, zero, step))))
        )
        .withColumn("alarm_ll", F.coalesce(F.col("_sim.ll"), F.lit(False)))
        .withColumn("alarm_time", F.coalesce(F.col("_sim.at"), F.lit(-1)))
        .withColumn(
            "min_radius",
            F.when(~F.col("can_sim"), F.lit(0.0)).otherwise(
                F.round(F.coalesce(F.col("_sim.mr"), F.lit(MIN_RADIUS_SENTINEL)), 4)
            ),
        )
        .withColumn("alarm", F.col("alarm_ll") & alt_ok)
        .drop("_sim")
    )


def dead_reckoning(
    df: DataFrame, cfg: EngineConfig, exact_geodesic: bool = False
) -> DataFrame:
    """D1 — relational unroll of get_alarm_info (airstrik.py:223-278).

    `exact_geodesic=True` swaps the spherical forward-geodesic step
    positions for the WGS-84 ellipsoid DIRECT solution
    (functions/geodesic.py::karney_direct) AND the spherical haversine
    zone distance for the ellipsoid INVERSE solution (karney_inverse_km),
    both via Arrow-batched pandas_udfs — the reference-identical lane,
    since geopy's destination() / geodesic() are the same Karney direct /
    inverse problems (airstrik.py:245-259).  Default stays the
    whole-stage-codegen spherical Column expressions (the 100 TB hot path;
    FLOATS.md §D1 quantifies the per-step divergence at < 0.25%).

    Input: one row per plane-fix with `hex, event_id, lat, lon, calc_heading,
    nav_heading, calc_speed, alt_geom, distance`.  Replicated semantics:

      * heading = calc_heading else nav_heading; neither (or no speed) ->
        (alarm=False, alarm_time=-1, min_radius=0) (airstrik.py:244-254);
      * steps t in [0, think_ahead) at (speed/3600)*t km along heading;
      * break BEFORE evaluating a step whose |lat| or |lon| > 90 — the ±90
        longitude clamp is a reference bug kept deliberately (SURVEY §7);
      * zone test is STRICT dist < most_generous_dist (airstrik.py:260);
      * once in zone, break when dist exceeds the previous in-zone dist
        (airstrik.py:266-268) — flags of the breaking step still count;
      * min_radius = min in-zone dist, sentinel 1e8 when never in zone;
      * alarm = alarm_ll AND (alt unknown OR alt <= most_generous_alt)
        (airstrik.py:272-275).
    """
    heading = F.coalesce(F.col("calc_heading"), F.col("nav_heading"))
    can_sim = heading.isNotNull() & F.col("calc_speed").isNotNull()
    horizon = F.lit(int(cfg.think_ahead))

    if not exact_geodesic:
        return _dead_reckoning_fold(df, cfg, heading, can_sim)

    sim = (
        df.select("hex", "event_id", "lat", "lon", "calc_speed", heading.alias("sim_heading"))
        .filter(can_sim)
        .withColumn("t", F.explode(F.sequence(F.lit(0), horizon - 1)))
    )
    step_km = (F.col("calc_speed") / 3600.0) * F.col("t")
    if exact_geodesic:
        from airstrik_py_spark.functions.geodesic import geodesic_dest_pandas_udf

        dest = geodesic_dest_pandas_udf()
        sim = (
            sim.withColumn(
                "sim_pt",
                dest(F.col("lat"), F.col("lon"), F.col("sim_heading"), step_km),
            )
            .withColumn("sim_lat", F.col("sim_pt.lat"))
            .withColumn("sim_lon", F.col("sim_pt.lon"))
            .drop("sim_pt")
        )
    else:
        sim = sim.withColumn(
            "sim_lat", dest_lat_deg(F.col("lat"), F.col("sim_heading"), step_km)
        )
        sim = sim.withColumn(
            "sim_lon",
            dest_lon_deg(
                F.col("lat"), F.col("lon"), F.col("sim_lat"), F.col("sim_heading"), step_km
            ),
        )
    if exact_geodesic:
        # the zone test is ALSO ellipsoid-exact in this lane (ADVICE r12):
        # the reference measures each simulated point's distance to HOME
        # with geopy's ellipsoid geodesic (airstrik.py:259), the same
        # inverse problem karney_inverse_km solves
        from airstrik_py_spark.functions.geodesic import geodesic_km_pandas_udf

        geo_km = geodesic_km_pandas_udf()
        sim = sim.withColumn(
            "sim_dist",
            geo_km(
                F.lit(cfg.home_lat),
                F.lit(cfg.home_lon),
                F.col("sim_lat"),
                F.col("sim_lon"),
            ),
        )
    else:
        sim = sim.withColumn(
            "sim_dist",
            haversine_km(
                F.lit(cfg.home_lat), F.lit(cfg.home_lon), F.col("sim_lat"), F.col("sim_lon")
            ),
        )

    in_zone = F.col("sim_dist") < F.lit(cfg.most_generous_dist_km)
    oob = (F.abs(F.col("sim_lat")) > 90.0) | (F.abs(F.col("sim_lon")) > 90.0)

    step_w = Window.partitionBy("hex", "event_id").orderBy("t")
    before = step_w.rowsBetween(Window.unboundedPreceding, -1)
    full_w = Window.partitionBy("hex", "event_id")

    prev_zone_dist = F.last(F.when(in_zone, F.col("sim_dist")), ignorenulls=True).over(before)
    growth = in_zone & prev_zone_dist.isNotNull() & (F.col("sim_dist") > prev_zone_dist)

    flagged = sim.select(
        "hex",
        "event_id",
        "t",
        "sim_dist",
        in_zone.alias("in_zone"),
        F.min(F.when(oob, F.col("t"))).over(full_w).alias("b_oob"),
        F.min(F.when(growth, F.col("t"))).over(full_w).alias("b_grow"),
    )
    # Steps strictly before the first break survive.  The growth-break step's
    # own flags also count in the reference, but can never change the outputs
    # (it is in-zone with a prior in-zone step, so alarm_ll/alarm_time are
    # already set and its dist > min_radius) — so t < first_break suffices.
    first_break = F.least(
        F.coalesce(F.col("b_oob"), horizon), F.coalesce(F.col("b_grow"), horizon)
    )
    live = flagged.filter(F.col("t") < first_break)

    agg = live.groupBy("hex", "event_id").agg(
        F.max(F.col("in_zone")).alias("sim_alarm_ll"),
        F.min(F.when(F.col("in_zone"), F.col("t"))).alias("sim_alarm_time"),
        F.min(F.when(F.col("in_zone"), F.col("sim_dist"))).alias("sim_min_radius"),
    )

    alt_ok = F.col("alt_geom").isNull() | (
        F.col("alt_geom") <= F.lit(cfg.most_generous_alt_m)
    )
    return (
        df.withColumn("can_sim", can_sim)
        .join(agg, ["hex", "event_id"], "left")
        .withColumn("alarm_ll", F.coalesce(F.col("sim_alarm_ll"), F.lit(False)))
        .withColumn("alarm_time", F.coalesce(F.col("sim_alarm_time"), F.lit(-1)))
        .withColumn(
            "min_radius",
            F.when(~F.col("can_sim"), F.lit(0.0)).otherwise(
                F.round(F.coalesce(F.col("sim_min_radius"), F.lit(MIN_RADIUS_SENTINEL)), 4)
            ),
        )
        .withColumn("alarm", F.col("alarm_ll") & alt_ok)
        .drop("sim_alarm_ll", "sim_alarm_time", "sim_min_radius")
    )


def alarm_payload(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """D2 — alert/warning event assembly (raise_alarm, airstrik.py:318-368;
    field contract README.md:57-68).  Routing (airstrik.py:238-241, 269-271):
    currently inside a configured geofence -> topic `airstrik-alert`, eta 0;
    else predicted entry within the horizon -> `airstrik-warning` with eta."""
    inside_now = matched_filters(F.col("distance"), F.lit(None), cfg) != ""
    warn = (F.col("alarm_time") > -1) & (F.col("alarm_time") < F.lit(cfg.think_ahead))
    return (
        df.filter(inside_now | warn)
        .select(
            F.col("hex").alias("plane_hex"),
            F.col("flight").alias("plane_id"),
            F.round("ts_sec", 6).alias("plane_time"),
            F.round(F.coalesce(F.col("calc_heading"), F.col("nav_heading")), 6).alias(
                "heading"
            ),
            F.col("calc_speed").alias("speed"),
            # reference stringifies missing altitude as 'unknown' at the sink
            # edge (README.md:63) — keep NULL in-engine, cast at the sink
            F.col("alt_geom").alias("altitude"),
            F.round("lat", 6).alias("latitude"),
            F.round("lon", 6).alias("longitude"),
            F.col("distance"),
            F.when(inside_now, F.lit(0)).otherwise(F.col("alarm_time")).alias("eta"),
            F.when(inside_now, F.lit("airstrik-alert"))
            .otherwise(F.lit("airstrik-warning"))
            .alias("topic"),
        )
    )
