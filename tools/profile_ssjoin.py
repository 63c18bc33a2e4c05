#!/usr/bin/env python3
"""Profile stream_ss_interval_join (VERDICT r6 #5 / r7 item 3).

The lane benches at ~11 k rows/s vs 30-59 k for the other state-heavy
pipelines (STREAMBENCH.md).  This harness isolates WHERE the wall-clock
goes and which knob moves it, on the same 16-file events tape the bench
uses:

  variants:
    baseline        — as benched (32 shuffle partitions, 7200 s watermark)
    parts8          — 8 shuffle partitions (state-store commit overhead is
                      per partition per micro-batch; the join keeps TWO
                      keyed stores, left+right)
    wm3700          — near-minimal watermark for the 3600 s join window
                      (state retention span, halved)
    rocksdb         — RocksDB state provider
    nojoin_scan     — the two filtered+watermarked source branches unioned
                      to the sink WITHOUT the join: the tape-scan floor
                      (the tape is scanned once PER SIDE by construction)

  per variant: best-of-2 drain sec, micro-batch count, and the per-batch
  durationMs/stateOperators breakdown (addBatch, commit, state rows).

Usage: python tools/profile_ssjoin.py [sf_dir]
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
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _drain(make_stream):
    best = None
    prog = None
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
            best, prog = dt, q.recentProgress
    return best, prog


def _report(name, sec, prog, n_rows):
    batches = [p for p in prog if p.get("numInputRows", 0) or p.get("stateOperators")]
    print(f"\n== {name}: {sec:.2f} s  ({n_rows / sec:.0f} rows/s, "
          f"{len(prog)} progress events)")
    for p in prog:
        d = p.get("durationMs", {})
        so = p.get("stateOperators", [])
        srows = sum(s.get("numRowsTotal", 0) for s in so)
        supd = sum(s.get("numRowsUpdated", 0) for s in so)
        scommit = sum(s.get("commitTimeMs", 0) for s in so)
        print(
            f"  batch {p.get('batchId')}: in={p.get('numInputRows')} "
            f"addBatch={d.get('addBatch')} getBatch={d.get('getBatch')} "
            f"latestOffset={d.get('latestOffset')} commitOffsets={d.get('commitOffsets')} "
            f"walCommit={d.get('walCommit')} stateRows={srows} stateUpd={supd} "
            f"stateCommitMs={scommit}"
        )
    return batches


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = pin_session(get_spark("profile_ssjoin"))
    scratch = tempfile.mkdtemp(prefix="ssjoin_prof_")
    try:
        ev = load_table(spark, sf_dir, "events")
        tape = f"{scratch}/events"
        ev.repartition(TAPE_FILES).write.parquet(tape)
        schema = spark.read.parquet(tape).schema
        n = spark.read.parquet(tape).count()
        print(f"events tape: {n} rows, {TAPE_FILES} files @ {sf_dir}")

        def ev_stream():
            return spark.readStream.schema(schema).parquet(tape)

        def scan_only():
            s = ev_stream()
            clicks = (
                s.filter(F.col("event_type") == "click")
                .select("event_id", "ts")
                .withWatermark("ts", "7200 seconds")
            )
            s2 = ev_stream()
            purchases = (
                s2.filter(F.col("event_type") == "purchase")
                .select("event_id", "ts")
                .withWatermark("ts", "7200 seconds")
            )
            return clicks.union(purchases)

        sec, prog = _drain(lambda: stream_touch_conversion_pairs(ev_stream()))
        _report("baseline (32 parts, wm 7200)", sec, prog, n)

        sec, prog = _drain(scan_only)
        _report("nojoin_scan (both branches, no join)", sec, prog, n)

        spark.conf.set("spark.sql.shuffle.partitions", "8")
        sec, prog = _drain(lambda: stream_touch_conversion_pairs(ev_stream()))
        _report("parts8", sec, prog, n)
        spark.conf.set("spark.sql.shuffle.partitions", "32")

        sec, prog = _drain(
            lambda: stream_touch_conversion_pairs(ev_stream(), watermark_s=3700)
        )
        _report("wm3700", sec, prog, n)

        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
        sec, prog = _drain(lambda: stream_touch_conversion_pairs(ev_stream()))
        _report("rocksdb", sec, prog, n)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
