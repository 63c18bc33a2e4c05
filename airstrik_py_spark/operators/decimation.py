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

Unchanged packets also consume the reference's countdown; this operator
counts unique fixes only — identical behaviour whenever consecutive
duplicates are suppressed upstream (the reference's own dump1090 feed
re-sends positions, but force_new makes non-fix packets write-neutral).

Known deviation (force_new_data=False only): the reference still requires
the position to differ from the LAST WRITTEN sample for every write after
the first (the elif at airstrik.py:619-623 applies regardless of
force_new), so a plane re-sending one frozen position writes once in the
reference but every Nth row here.  Exact replication needs a sequential
fold (write decisions feed back into last_written); with the default
force_new_data=true the change gate subsumes it and the outputs agree.

decimation_factor = 0 is the documented "only the closest will be stored"
mode (config.yaml:7): no per-update samples pass; callers store the
closest-approach sample instead (`decimate_closest`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airstrik_py_spark.config import EngineConfig


def _trip_window() -> Window:
    return Window.partitionBy("hex", "session_id").orderBy("ts_sec", "event_id")


def decimate(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Every Nth unique update per TRIP in the reference's write phase (see
    module docstring); factor=0 passes nothing (closest-only mode — use
    decimate_closest for the sample it stores).

    Trip-scoped, not plane-scoped: trip closure deletes the reference's
    plane_history entry (airstrik.py:548), so the decimation counter AND the
    consecutive-dup memory restart on the next trip — a packet repeating the
    pre-gap position still counts as a fresh fix.  Inputs without a
    session_id column get one from with_session_id (gap = remember)."""
    from airstrik_py_spark.operators.sessions import with_session_id

    n = int(cfg.decimation_factor)
    if "session_id" not in df.columns:
        df = with_session_id(df, cfg)
    w = _trip_window()
    if cfg.decimation_force_new_data:
        gated = (
            df.withColumn("_plat", F.lag("lat").over(w))
            .withColumn("_plon", F.lag("lon").over(w))
            .filter(
                F.col("_plat").isNull()
                | F.col("_plon").isNull()
                | (F.col("lat") != F.col("_plat"))
                | (F.col("lon") != F.col("_plon"))
            )
            .drop("_plat", "_plon")
        )
    else:
        gated = df
    seqd = gated.withColumn("update_seq", F.row_number().over(_trip_window()))
    if n == 0:
        return seqd.filter(F.lit(False))
    first_write = 3 if cfg.decimation_force_new_data else 2
    return seqd.filter(
        (F.col("update_seq") >= first_write)
        & (((F.col("update_seq") - first_write) % F.lit(n)) == 0)
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
