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


def _dead_reckoning_steps(
    df: DataFrame, cfg: EngineConfig, heading: Column, can_sim: Column
) -> DataFrame:
    """The spherical D1 lane as ONE explode+window pass (r16 adjudication).

    History of the shape, because this lane has now been measured three
    ways: (r14) explode(sequence) -> windows -> groupBy -> JOIN back onto
    `df` evaluated the ENTIRE upstream kinematics pipeline twice (probe
    and build subtrees differ, nothing reuses: plans/r15/
    alarm_dead_reckoning_before.txt); (r15) one per-row `F.aggregate`
    fold killed the join and the 60x row blowup, but higher-order
    functions are CodegenFallback — the 60-step loop ran INTERPRETED per
    row, which the r15 paired A/B flagged as a bench-scale regression.
    This r16 shape takes the best of both: explode ALL rows (can_sim
    rows fan out to the think_ahead steps, non-sim rows to a single t=0
    row so none are lost), compute every step position/distance/flag in
    whole-stage codegen, resolve the break/alarm aggregates as WINDOW
    functions over (hex, event_id), and keep only the t=0 row — one
    upstream evaluation, zero joins, zero interpreted expressions.  The
    window sort is partition-local: the input is already hash-clustered
    by hex (hashpartitioning(hex) satisfies the window's (hex, event_id)
    clustering requirement), so no new exchange is introduced.

    Replicated break semantics (bit-identical to both prior shapes,
    oracle-checked): steps at or after the first out-of-bounds or
    distance-growth step are dead; the growth-break step's own flags
    can never change the outputs (it is in-zone with a prior in-zone
    step, so alarm_ll/alarm_time are already set and its dist exceeds
    the running min), so `t < first_break` suffices.
    """
    horizon = F.lit(int(cfg.think_ahead))
    sim = (
        df.withColumn("can_sim", can_sim)
        .withColumn("_shdg", heading)
        .withColumn(
            "_t",
            F.explode(
                F.when(F.col("can_sim"), F.sequence(F.lit(0), horizon - 1)).otherwise(
                    F.array(F.lit(0))
                )
            ),
        )
    )
    step_km = (F.col("calc_speed") / 3600.0) * F.col("_t")
    slat = dest_lat_deg(F.col("lat"), F.col("_shdg"), step_km)
    sim = sim.withColumn("_slat", slat)
    sim = sim.withColumn(
        "_slon",
        dest_lon_deg(F.col("lat"), F.col("lon"), F.col("_slat"), F.col("_shdg"), step_km),
    )
    sim = sim.withColumn(
        "_sdist",
        haversine_km(F.lit(cfg.home_lat), F.lit(cfg.home_lon), F.col("_slat"), F.col("_slon")),
    )
    in_zone = F.col("can_sim") & (F.col("_sdist") < F.lit(cfg.most_generous_dist_km))
    oob = (F.abs(F.col("_slat")) > 90.0) | (F.abs(F.col("_slon")) > 90.0)

    step_w = Window.partitionBy("hex", "event_id").orderBy("_t")
    before = step_w.rowsBetween(Window.unboundedPreceding, -1)
    full_w = Window.partitionBy("hex", "event_id")

    prev_zone_dist = F.last(F.when(in_zone, F.col("_sdist")), ignorenulls=True).over(before)
    growth = in_zone & prev_zone_dist.isNotNull() & (F.col("_sdist") > prev_zone_dist)
    flagged = sim.withColumn("_in_zone", in_zone).withColumn(
        "_b_oob", F.min(F.when(oob, F.col("_t"))).over(full_w)
    ).withColumn("_b_grow", F.min(F.when(growth, F.col("_t"))).over(full_w))

    live = F.col("_t") < F.least(
        F.coalesce(F.col("_b_oob"), horizon), F.coalesce(F.col("_b_grow"), horizon)
    )
    agg = (
        flagged.withColumn(
            "_sim_ll", F.max(F.when(live, F.col("_in_zone"))).over(full_w)
        )
        .withColumn(
            "_sim_at", F.min(F.when(live & F.col("_in_zone"), F.col("_t"))).over(full_w)
        )
        .withColumn(
            "_sim_mr",
            F.min(F.when(live & F.col("_in_zone"), F.col("_sdist"))).over(full_w),
        )
    )

    alt_ok = F.col("alt_geom").isNull() | (
        F.col("alt_geom") <= F.lit(cfg.most_generous_alt_m)
    )
    return (
        agg.filter(F.col("_t") == 0)
        .withColumn("alarm_ll", F.coalesce(F.col("_sim_ll"), F.lit(False)))
        .withColumn("alarm_time", F.coalesce(F.col("_sim_at"), F.lit(-1)))
        .withColumn(
            "min_radius",
            F.when(~F.col("can_sim"), F.lit(0.0)).otherwise(
                F.round(F.coalesce(F.col("_sim_mr"), F.lit(MIN_RADIUS_SENTINEL)), 4)
            ),
        )
        .withColumn("alarm", F.col("alarm_ll") & alt_ok)
        .drop(
            "_shdg", "_t", "_slat", "_slon", "_sdist", "_in_zone",
            "_b_oob", "_b_grow", "_sim_ll", "_sim_at", "_sim_mr",
        )
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
        return _dead_reckoning_steps(df, cfg, heading, can_sim)

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
