"""Decimated detail-sink gate — SURVEY.md §2.2 F4.

The reference writes every Nth live update per plane, optionally only when
the position actually changed (airstrik.py:584-626: decimation_tracker
counter at :558/:616/:623/:626, change-check at :612-624).  Batch form:
consecutive-dedup (the change gate) then a per-key row counter modulo N —
one window over the already-key-partitioned stream, no extra shuffle after
kinematics."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airstrik_py_spark.config import EngineConfig
from airstrik_py_spark.operators.kinematics import dedup_consecutive, key_window


def decimate(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Every Nth update per key (counter starts at 1; row N, 2N, ... pass),
    after the force-new-data change gate when configured."""
    gated = dedup_consecutive(df) if cfg.decimation_force_new_data else df
    n = F.lit(int(cfg.decimation_factor))
    return (
        gated.withColumn("update_seq", F.row_number().over(key_window()))
        .filter((F.col("update_seq") % n) == 0)
    )
