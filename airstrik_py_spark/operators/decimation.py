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

decimation_factor = 0 is the documented "only the closest will be stored"
mode (config.yaml:7): no per-update samples pass; callers store the
closest-approach sample instead (`decimate_closest`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airstrik_py_spark.config import EngineConfig
from airstrik_py_spark.operators.kinematics import dedup_consecutive, key_window


def decimate(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Every Nth unique update per key in the reference's write phase
    (see module docstring); factor=0 passes nothing (closest-only mode —
    use decimate_closest for the sample it stores)."""
    n = int(cfg.decimation_factor)
    gated = dedup_consecutive(df) if cfg.decimation_force_new_data else df
    seqd = gated.withColumn("update_seq", F.row_number().over(key_window()))
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
