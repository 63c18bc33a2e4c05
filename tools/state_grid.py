#!/usr/bin/env python3
"""State-volume x partition-count grid for the stream-stream interval
join (VERDICT r8 #5): turn the r8 finding "size state partitions to state
VOLUME, not CPU count" into a measured formula.

Grid: shuffle partitions P x key fan-out K.  Fan-out replicates every
user K ways IN-PLAN (explode, like STREAMBENCH's trips state scale), so
state rows on both join sides grow Kx while the tape scan stays fixed —
the cell isolates state-store cost, not source throughput.  Per cell:
best-of-2 availableNow drain sec, join-input rows/s, peak state rows,
cumulative stateCommitMs.

The derived rule (printed at the end, consumed by
streaming/pipeline.py::state_shuffle_partitions): commit overhead is per
partition per micro-batch, so P should be ~ peak_state_rows / R* with R*
the rows-per-partition at the grid's argmin cells — small state wants FEW
partitions; more partitions only win back their keep once per-partition
state is at least R*.

Usage: python tools/state_grid.py [sf_dir] [--quick]
  --quick: 1x/10x fan-outs with two partition points each (smoke mode)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from airstrik_py_spark.session import get_spark, pin_session  # noqa: E402
from airstrik_py_spark.sources.tables import load_table  # noqa: E402
from airstrik_py_spark.streaming.pipeline import (  # noqa: E402
    stream_touch_conversion_pairs,
)

TAPE_FILES = 16
GRID = {1: (4, 8, 16, 32), 10: (4, 8, 16, 32, 64), 100: (8, 32, 64, 128)}


def _drain(make_stream):
    best = None
    peak = commit = 0
    for _ in range(2):
        t0 = time.time()
        q = (
            make_stream()
            .writeStream.format("noop")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
            peak = max(
                (
                    sum(s.get("numRowsTotal", 0) for s in p.get("stateOperators", []))
                    for p in q.recentProgress
                ),
                default=0,
            )
            commit = sum(
                s.get("commitTimeMs", 0)
                for p in q.recentProgress
                for s in p.get("stateOperators", [])
            )
    return best, peak, commit


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--quick"]
    grid = {1: (4, 8), 10: (8, 32)} if "--quick" in sys.argv[1:] else GRID
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = pin_session(get_spark("state_grid"))
    scratch = tempfile.mkdtemp(prefix="state_grid_")
    try:
        ev = load_table(spark, sf_dir, "events")
        tape = f"{scratch}/events"
        ev.repartition(TAPE_FILES).write.parquet(tape)
        schema = spark.read.parquet(tape).schema
        n = spark.read.parquet(tape).count()
        print(f"events tape: {n} rows @ {sf_dir}\n")
        print("| fan-out | partitions | join rows in | sec | rows/s | "
              "peak state rows | state rows/part | stateCommitMs |")
        print("|---|---|---|---|---|---|---|---|")

        best_cells: dict[int, tuple[float, int, int]] = {}
        for fan, parts_list in grid.items():
            def fanned():
                s = spark.readStream.schema(schema).parquet(tape)
                if fan == 1:
                    return s
                return (
                    s.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(fan)])))
                    .withColumn("user_id", F.col("user_id") * fan + F.col("rep"))
                    .withColumn("event_id", F.col("event_id") * fan + F.col("rep"))
                    .drop("rep")
                )

            for parts in parts_list:
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                sec, peak, commit = _drain(
                    lambda: stream_touch_conversion_pairs(fanned())
                )
                rows_in = n * fan
                print(
                    f"| {fan}x | {parts} | {rows_in} | {sec:.2f} | "
                    f"{rows_in / sec:.0f} | {peak} | "
                    f"{peak // max(parts, 1)} | {commit} |"
                )
                if fan not in best_cells or sec < best_cells[fan][0]:
                    best_cells[fan] = (sec, parts, peak)

        print("\nargmin cells (fan-out -> best partitions, rows/part):")
        ratios = []
        for fan, (sec, parts, peak) in sorted(best_cells.items()):
            rpp = peak / max(parts, 1)
            ratios.append(rpp)
            print(f"  {fan}x: P={parts} at {sec:.2f}s, state rows/part={rpp:.0f}")
        print(
            f"\nsuggested STATE_ROWS_PER_PARTITION (geomean of argmin "
            f"rows/part): {int(__import__('math').exp(sum(__import__('math').log(max(r, 1)) for r in ratios) / len(ratios)))}"
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
