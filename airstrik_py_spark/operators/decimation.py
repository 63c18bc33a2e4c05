"""Decimated detail-sink gate — SURVEY.md §2.2 F4.

The reference writes every Nth live update per plane, optionally only when
the position actually changed (airstrik.py:584-626: decimation_tracker
counter at :558/:616/:623/:626, change-check at :612-624).  Batch form:
consecutive-dedup (the change gate) then a per-key row counter with the
reference's write phase — one window over the already-key-partitioned
stream, no extra shuffle after kinematics.

Write-phase derivation (per plane, counting unique fixes 1, 2, 3, ...):

  * the tracker starts at 0 (airstrik.py:558) and a packet is ELIGIBLE once
    len(lat_history) > 1, i.e. from fix #2 (airstrik.py:584-586);
  * force_new_data=True: the first eligible packet only records
    last_written (the `elif` at :619 needs a non-empty last_written), so the
    first WRITE is fix #3; the reset to factor-1 (:623) plus one decrement
    per packet (:626) puts later writes every `factor` fixes: 3, 3+N, ...;
  * force_new_data=False: the first eligible packet writes immediately
    (:612-616), so the cadence is 2, 2+N, ....

Replication is EXACT as of r2 (a per-trip Column fold, not the earlier
every-Nth window approximation): unchanged packets burn the reference's
countdown (:626), writes require the sim to have run at least once
(calc_heading non-empty, via the min(len(lat_history), len(lon_history))
>= 2 gate at :578-579 — a constant-longitude track never writes), and
the missing-calc-heading reset branch (:595-600) is reproduced.

Replicated reference BUG (deliberate, same policy as the ±90-lon clamp):
the "if new data" gate at :619-621 compares last_written['lat'] — the
full (value, ts) PAIR stored at :625 — against the SCALAR
lat_history[-1][0]; a tuple never equals a float in Python, so the gate
is vacuously true and the reference writes on EVERY eligible packet once
last_written is non-empty.  decimation_force_new_data therefore only
delays the FIRST write (the :612 branch needs last_written empty); it
never suppresses repeats.  The fold keeps just the lw_set flag — no
position comparison.  The DuckDB oracle mirrors the fold
operation-for-operation (registry/sinks_q.py::_decim_fold_ctes).

decimation_factor = 0 is the documented "only the closest will be stored"
mode (config.yaml:7): no per-update samples pass; callers store the
closest-approach sample instead (`decimate_closest`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airstrik_py_spark.config import EngineConfig


def _decim_zero() -> F.Column:
    """Fold seed = the reference's fresh plane_history entry: tracker 0,
    empty histories, empty last_written (airstrik.py:556-568).  `writes`
    carries the full emitted sample — the write uses lat_history[-1] /
    lon_history[-1] (value, entry-ts) PAIRS (airstrik.py:602-604), i.e.
    the last KNOWN position stamped with when it was first seen, not the
    triggering packet's own possibly-null fields."""
    d_null = F.lit(None).cast("double")
    return F.struct(
        F.lit(0).alias("tracker"),
        F.lit(0).alias("n_lat"),
        F.lit(0).alias("n_lon"),
        d_null.alias("last_la"),
        d_null.alias("last_lo"),
        d_null.alias("la_t"),
        d_null.alias("lo_t"),
        F.lit(False).alias("lw_set"),
        F.lit(False).alias("sim_ran"),
        F.array().cast(
            "array<struct<i:int,t:double,e:bigint,ts:timestamp,"
            "la:double,la_t:double,lo:double,lo_t:double>>"
        ).alias("writes"),
        F.lit(0).alias("i"),
    )


def _decim_step(n: int, force_new: bool):
    """One packet of the reference's write loop (airstrik.py:574-626) as a
    pure Column fold step — see the CASE ladder comments for the branch
    mapping."""

    def step(acc: F.Column, p: F.Column) -> F.Column:
        la, lo = p.getField("la"), p.getField("lo")
        # per-attribute history appends (:574-577)
        lat_new = la.isNotNull() & (
            (acc.getField("n_lat") == 0) | (la != acc.getField("last_la"))
        )
        lon_new = lo.isNotNull() & (
            (acc.getField("n_lon") == 0) | (lo != acc.getField("last_lo"))
        )
        n_lat = acc.getField("n_lat") + F.when(lat_new, 1).otherwise(0)
        n_lon = acc.getField("n_lon") + F.when(lon_new, 1).otherwise(0)
        # calc-heading history becomes non-empty once the sim has run (:578-580)
        sim_ran = acc.getField("sim_ran") | ((n_lat >= 2) & (n_lon >= 2))
        eligible = (acc.getField("tracker") <= 0) & F.lit(n != 0) & (n_lat > 1)
        # branch ladder inside the eligible block:
        #   A (:595-600) no calc_heading yet -> tracker reset, no write, no lw
        #   B (:612-616) not force_new and last_written empty -> WRITE
        #   C (:619-624) last_written set and position moved -> WRITE
        #   D            otherwise -> no write, tracker stays <= 0
        # last_written updates on B/C/D (:625); ineligible packets burn the
        # countdown (:626)
        # history heads AFTER this packet's appends — a write emits the head
        # (value, entry-ts) pairs (airstrik.py:602-604)
        new_la = F.when(la.isNotNull(), la).otherwise(acc.getField("last_la"))
        new_lo = F.when(lo.isNotNull(), lo).otherwise(acc.getField("last_lo"))
        new_la_t = F.when(lat_new, p.getField("t")).otherwise(acc.getField("la_t"))
        new_lo_t = F.when(lon_new, p.getField("t")).otherwise(acc.getField("lo_t"))
        is_a = eligible & ~sim_ran
        is_b = eligible & sim_ran & F.lit(not force_new) & ~acc.getField("lw_set")
        # replicated reference bug: the :619-621 "if new data" comparison
        # pits a (value, ts) tuple against a scalar — vacuously unequal — so
        # once last_written is set EVERY eligible packet writes
        is_c = eligible & sim_ran & acc.getField("lw_set")
        wrote = is_b | is_c
        tracker = (
            F.when(is_a | wrote, F.lit(n - 1))
            .when(eligible, acc.getField("tracker"))
            .otherwise(acc.getField("tracker") - 1)
        )
        idx = acc.getField("i") + 1
        return F.struct(
            tracker.alias("tracker"),
            n_lat.alias("n_lat"),
            n_lon.alias("n_lon"),
            new_la.alias("last_la"),
            new_lo.alias("last_lo"),
            new_la_t.alias("la_t"),
            new_lo_t.alias("lo_t"),
            (acc.getField("lw_set") | (eligible & ~is_a)).alias("lw_set"),
            sim_ran.alias("sim_ran"),
            F.when(
                wrote,
                F.concat(
                    acc.getField("writes"),
                    F.array(
                        F.struct(
                            idx.alias("i"),
                            p.getField("t").alias("t"),
                            p.getField("e").alias("e"),
                            p.getField("ts").alias("ts"),
                            new_la.alias("la"),
                            new_la_t.alias("la_t"),
                            new_lo.alias("lo"),
                            new_lo_t.alias("lo_t"),
                        )
                    ),
                ),
            )
            .otherwise(acc.getField("writes"))
            .alias("writes"),
            idx.alias("i"),
        )

    return step


def decimate(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """The reference's decimated live-write gate, replicated EXACTLY as a
    per-trip fold (airstrik.py:574-626): per-attribute history appends, the
    packet-level countdown, the missing-calc-heading reset, and the
    VACUOUS "if new data" gate (the reference's tuple-vs-scalar comparison
    bug — see module docstring) — so every eligible packet after the
    first-write baseline emits, frozen or not.  `update_seq` = packet
    index within the trip (1-based).

    Trip-scoped: closure deletes the reference's plane_history entry
    (airstrik.py:548), so all state restarts per session.  Scale contract:
    one groupBy per (hex, session) with a trip-bounded collect_list — the
    same memory shape as the A3 trip assembly — then a JVM-side Column
    fold (F.aggregate, no Python); factor=0 passes nothing (closest-only
    mode — use decimate_closest)."""
    from airstrik_py_spark.operators.sessions import with_session_id

    n = int(cfg.decimation_factor)
    if "session_id" not in df.columns:
        df = with_session_id(df, cfg)
    packed = df.groupBy("hex", "session_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("ts_sec").alias("t"),
                    F.col("event_id").alias("e"),
                    F.col("ts").alias("ts"),
                    F.col("lat").alias("la"),
                    F.col("lon").alias("lo"),
                )
            )
        ).alias("ps")
    )
    folded = packed.select(
        "hex",
        "session_id",
        F.aggregate(
            "ps", _decim_zero(), _decim_step(n, cfg.decimation_force_new_data)
        ).getField("writes").alias("w"),
    )
    # the write struct captures everything the emitted row needs, so the
    # trip array is dropped BEFORE the explode (no O(P*W) re-materialization)
    out = folded.select("hex", "session_id", F.explode("w").alias("wr"))
    return out.select(
        "hex",
        F.col("wr.ts").alias("ts"),
        F.col("wr.t").alias("ts_sec"),
        F.col("wr.e").alias("event_id"),
        F.col("wr.la").alias("lat"),
        F.col("wr.la_t").alias("lat_sec"),
        F.col("wr.lo").alias("lon"),
        F.col("wr.lo_t").alias("lon_sec"),
        "session_id",
        F.col("wr.i").alias("update_seq"),
    )


def decimate_closest(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """decimation_factor = 0: store ONLY the closest-approach sample per key
    (config.yaml:7).  `df` needs a `distance` column; ties break
    deterministically on (distance, ts_sec, event_id) — the reference's
    strict-< scan keeps the first minimum (airstrik.py:494-497)."""
    closest = F.min(
        F.struct(
            F.col("distance").alias("d"),
            F.col("ts_sec").alias("t"),
            F.col("event_id").alias("e"),
            F.col("lat").alias("la"),
            F.col("lon").alias("lo"),
        )
    )
    return df.groupBy("hex").agg(
        closest.getField("d").alias("distance"),
        closest.getField("t").alias("ts_sec"),
        closest.getField("la").alias("lat"),
        closest.getField("lo").alias("lon"),
    )
