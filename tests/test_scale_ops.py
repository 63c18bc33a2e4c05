"""Round-3 scale family: priority sampling, count-min sketch, PageRank,
corpus upsert — operator contracts beyond the oracle hash-match."""

from __future__ import annotations

from pyspark.sql import functions as F

from airstrik_py_spark.operators import graph as G
from airstrik_py_spark.operators import sampling as SAMP
from airstrik_py_spark.operators import sketch as SK


def _docs(spark, n=400, heavy_every=10):
    """Synthetic documents: every heavy_every-th doc is 50x heavier."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % heavy_every == 0, F.lit(5000))
        .otherwise(F.lit(100))
        .alias("n_chars"),
    )


class TestPrioritySample:
    def test_k_rows_sorted(self, spark):
        out = SAMP.priority_sample(_docs(spark), k=50).collect()
        assert len(out) == 50
        keys = [r.rank_key for r in out]
        assert keys == sorted(keys)

    def test_weight_bias(self, spark):
        """50x-heavier docs (10% of corpus) must be strongly over-represented
        in the sample — the point of weighted sampling."""
        out = SAMP.priority_sample(_docs(spark), k=50).collect()
        heavy = sum(1 for r in out if r.weight > 1000)
        assert heavy > 25  # 10% of corpus, >50% of the sample

    def test_mergeable(self, spark):
        """Priority sampling's defining property: merging per-shard top-k
        samples (by rank key) equals the single-pass top-k over the union —
        what makes it one scan + a k-row reduce at 100 TB."""
        docs = _docs(spark)
        shard_a = docs.filter(F.col("doc_id") % 2 == 0)
        shard_b = docs.filter(F.col("doc_id") % 2 == 1)
        merged = (
            SAMP.priority_sample(shard_a, k=30)
            .unionByName(SAMP.priority_sample(shard_b, k=30))
            .orderBy("rank_key", "doc_id")
            .limit(30)
        )
        direct = SAMP.priority_sample(docs, k=30)
        assert [tuple(r) for r in merged.collect()] == [
            tuple(r) for r in direct.collect()
        ]


class TestCountMin:
    def _tokens(self, spark):
        return (
            spark.range(2000)
            .select((F.col("id") % 37).cast("string").alias("token"))
        )

    def test_overestimate_contract(self, spark):
        """CMS never underestimates: est >= true for every token."""
        out = SK.cms_topk(self._tokens(spark), k=37).collect()
        assert len(out) == 37
        assert all(r.est_count >= r.true_count for r in out)

    def test_sketch_bounded(self, spark):
        sk = SK.cms_build(self._tokens(spark))
        assert sk.count() <= SK.CMS_D * SK.CMS_W
        # total mass per row = number of token occurrences
        per_row = sk.groupBy("row_idx").agg(F.sum("cell_count").alias("m")).collect()
        assert {r.m for r in per_row} == {2000}

    def test_merge_by_addition(self, spark):
        """Sketches of disjoint shards merge cell-wise — the incremental
        build path (per-batch sketch + running sum)."""
        tok = self._tokens(spark).withColumn("half", F.monotonically_increasing_id() % 2)
        a = SK.cms_build(tok.filter("half = 0").select("token"))
        b = SK.cms_build(tok.filter("half = 1").select("token"))
        merged = (
            a.unionByName(b)
            .groupBy("row_idx", "bucket")
            .agg(F.sum("cell_count").alias("cell_count"))
        )
        whole = SK.cms_build(tok.select("token"))
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )


class TestPageRank:
    def test_uniform_cycle(self, spark):
        """On a directed cycle every node has indegree = outdegree = 1, so
        pr stays exactly uniform at every iteration."""
        n = 10
        nodes = spark.range(n).select(F.col("id").alias("node"))
        edges = spark.range(n).select(
            F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
        )
        out = G.pagerank(nodes, edges, iters=3).collect()
        # 150000 + (85 * 1_000_000) // 100 = exactly 1_000_000 every round
        assert {r.pr_micro for r in out} == {G.PR_MICRO}
        assert len(out) == n

    def test_sink_attracts_mass(self, spark):
        """A node every other node points at must outrank the pointers."""
        n = 6
        nodes = spark.range(n).select(F.col("id").alias("node"))
        edges = (
            spark.range(1, n)
            .select(F.col("id").alias("src"), F.lit(0).alias("dst"))
        )
        out = {r.node: r.pr_micro for r in G.pagerank(nodes, edges, iters=2).collect()}
        assert out[0] > max(v for k, v in out.items() if k != 0)
        # non-pointed nodes get exactly the base mass
        assert all(out[k] == G.PR_BASE for k in range(1, n))


class TestStreamingSketch:
    def test_incremental_stream_build_equals_batch(self, spark, tmp_path):
        """The production CMS deployment shape: an unbounded token stream
        through foreachBatch, each micro-batch contributing its own D x W
        sketch, merged into a running parquet sketch by cell-wise addition.
        The final merged sketch must equal the one-shot batch sketch —
        the mergeability that makes the sketch a streaming operator."""
        import os

        from pyspark.sql import functions as F

        tape = str(tmp_path / "tok_tape")
        batch = (
            spark.range(3000)
            .select((F.col("id") % 53).cast("string").alias("token"))
        )
        # 3 files -> availableNow processes them as (at least) separate splits
        batch.repartition(3).write.parquet(tape)

        store = str(tmp_path / "sketch_store")

        def merge(batch_df, epoch_id):
            part = SK.cms_build(batch_df)
            if os.path.exists(store):
                prev = batch_df.sparkSession.read.parquet(store)
                part = (
                    part.unionByName(prev)
                    .groupBy("row_idx", "bucket")
                    .agg(F.sum("cell_count").alias("cell_count"))
                )
            part.localCheckpoint().write.mode("overwrite").parquet(store)

        stream = spark.readStream.schema("token string").parquet(tape)
        q = (
            stream.writeStream.foreachBatch(merge)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not drain within timeout"

        got = sorted(map(tuple, spark.read.parquet(store).collect()))
        want = sorted(map(tuple, SK.cms_build(batch).collect()))
        assert got == want


class TestPrioritySampleDirtyInputs:
    def test_null_and_negative_weights_excluded(self, spark):
        """NULL n_chars sorts NULLS FIRST in Spark asc but NULLS LAST in
        DuckDB, and n_chars < 0 divides by zero on one engine only (ADVICE
        r3) — the guard drops both classes identically, so the sample over
        a dirty frame equals the sample over its clean subset."""
        clean = _docs(spark, n=200)
        dirty = clean.unionByName(
            spark.createDataFrame(
                [(1000, None), (1001, -1), (1002, -50)],
                "doc_id long, n_chars long",
            )
        )
        got = [tuple(r) for r in SAMP.priority_sample(dirty, k=40).collect()]
        want = [tuple(r) for r in SAMP.priority_sample(clean, k=40).collect()]
        assert got == want
        assert all(r[1] >= 1 for r in got)  # weight = n_chars + 1 >= 1


def test_rollup_grouping_sets_expand_plan(spark):
    """rollup must plan ONE Expand + aggregate (single pass), and the
    grouping-id bitmask must mark detail/subtotal/grand rows 0/1/3."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("s1", "en", 5), ("s1", "de", 3), ("s2", "en", 2)],
        "source string, lang string, n_chars long",
    )
    out = df.rollup("source", "lang").agg(
        F.grouping_id().alias("gid"), F.count("*").alias("n")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    rows = {(r["source"], r["lang"]): r["gid"] for r in out.collect()}
    assert rows[("s1", "en")] == 0
    assert rows[("s1", None)] == 1
    assert rows[(None, None)] == 3


def test_events_type_pivot_fills_absent_zero(spark):
    from datetime import datetime

    import __spark_entry__ as entrymod

    # day 1 has clicks only -> the other four columns must be 0, not NULL
    ev = spark.createDataFrame(
        [(0, datetime(2024, 1, 1, 1), 1, "click", 1.0, None),
         (1, datetime(2024, 1, 2, 1), 1, "view", 1.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.createOrReplaceTempView("_pivot_probe")
    from pyspark.sql import functions as F
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
        .groupBy("day").pivot("event_type", types).count().na.fill(0, types)
    )
    d1 = {r["day"]: r for r in out.collect()}["2024-01-01"]
    assert d1["click"] == 1 and d1["error"] == 0 and d1["view"] == 0
