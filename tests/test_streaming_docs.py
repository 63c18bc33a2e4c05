"""Stream == batch parity for document ingest dedup: the same new-batch
documents through stream_dedup_docs (stream-static anti-join + watermark
dedup, availableNow drain) and through the batch dedup_incremental rule.

Parity contract: the SET of accepted digests must match exactly (one
accepted row per new unique digest absent from the corpus).  Which doc_id
wins an intra-batch digest group is arrival-order-dependent in streaming
(batch pins min doc_id), so the assertion is on digest sets and
one-winner-per-digest, not on winner identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from airstrik_py_spark.operators.dedup import INCR_SPLIT, dedup_incremental
from airstrik_py_spark.sources.tables import load_table
from airstrik_py_spark.streaming.pipeline import stream_dedup_docs

SF = "/root/testdata/sf0.001"


def test_stream_dedup_docs_matches_batch_incremental(spark, tmp_path):
    base = load_table(spark, SF, "documents")
    # The sf0.001 new batch happens to contain no duplicates at all, so
    # inject them: three corpus texts re-arriving under new doc_ids (the
    # seen_before layer) and one new text arriving twice (the
    # first-arrival layer).  Batch and stream both see this same frame.
    corpus_texts = (
        base.filter(F.col("doc_id") < 3)
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    )
    replay_text = (
        base.filter(F.col("doc_id") == INCR_SPLIT + 50)
        .select(F.lit(20_000).cast("long").alias("doc_id"), "text")
    )
    cols = ["doc_id", "text"]
    docs = base.select(*cols).unionByName(corpus_texts).unionByName(replay_text)
    corpus = docs.filter(F.col("doc_id") < INCR_SPLIT)
    new = docs.filter(F.col("doc_id") >= INCR_SPLIT).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    )
    tape = str(tmp_path / "docs_tape")
    new.orderBy("doc_id").coalesce(1).write.parquet(tape)
    schema = spark.read.parquet(tape).schema

    corpus_digests = corpus.select(F.md5("text").alias("digest"))
    stream = spark.readStream.schema(schema).parquet(tape)
    q = (
        stream_dedup_docs(stream, corpus_digests)
        .writeStream.format("memory")
        .queryName("docs_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("docs_dedup_stream").collect()

    want = {
        r["digest"]
        for r in dedup_incremental(docs).filter("accept").collect()
    }
    assert {r["digest"] for r in got} == want
    assert len(got) == len(want)  # exactly one winner per accepted digest
    # sanity: the injected rows actually exercised both suppression layers
    n_new = new.count()
    assert len(want) <= n_new - 4  # 3 corpus replays + 1 intra-batch dup


def test_stream_dedup_docs_suppresses_corpus_and_replays(spark, tmp_path):
    """Hand-built tape: a corpus hit, an intra-stream duplicate, and a
    fresh doc — only the fresh doc and the first arrival of the dup pass."""
    corpus_digests = spark.createDataFrame(
        [("seen text",)], "text string"
    ).select(F.md5("text").alias("digest"))
    rows = [
        (100, "seen text", 10.0),   # in corpus -> suppressed
        (101, "dup text", 20.0),    # first arrival -> accepted
        (102, "dup text", 30.0),    # replay -> suppressed
        (103, "fresh text", 40.0),  # accepted
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, sec double"
    ).withColumn("ingest_ts", F.timestamp_seconds(F.col("sec")))
    tape = str(tmp_path / "mini_tape")
    df.orderBy("doc_id").coalesce(1).write.parquet(tape)
    schema = spark.read.parquet(tape).schema

    stream = spark.readStream.schema(schema).parquet(tape)
    q = (
        stream_dedup_docs(stream, corpus_digests)
        .writeStream.format("memory")
        .queryName("docs_dedup_mini")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.table("docs_dedup_mini").collect()
    )
    assert got == [101, 103]


def test_docs_ingest_foreach_batch_rejects_late_replay(spark, tmp_path):
    """The durable ingest loop: accepted digests feed the persistent
    store, so a duplicate arriving in a LATER run — far beyond any
    watermark horizon, where dropDuplicatesWithinWatermark state is long
    evicted — is still rejected.  Two availableNow drains share one
    checkpoint (epoch ids continue, as in production restarts)."""
    from airstrik_py_spark.streaming.pipeline import docs_ingest_foreach_batch

    tape = str(tmp_path / "tape")
    out = str(tmp_path / "out")
    store = str(tmp_path / "digests")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, ingest_ts timestamp"

    def _write(rows):
        spark.createDataFrame(
            [(i, t, None) for i, t in rows], schema
        ).withColumn(
            "ingest_ts", F.timestamp_seconds(F.lit(1000) + F.col("doc_id"))
        ).coalesce(1).write.mode("append").parquet(tape)

    def _drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(tape)
            .writeStream.foreachBatch(docs_ingest_foreach_batch(out, store))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # day 1: two distinct docs, plus an intra-batch dup of X (id 2 loses)
    _write([(1, "text X"), (2, "text X"), (3, "text Y")])
    _drain()
    # day 2: late replay of X (any watermark state is long gone between
    # runs) and one genuinely new doc
    _write([(10, "text X"), (11, "text Z")])
    _drain()

    accepted = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()
    )
    assert accepted == [(1, "text X"), (3, "text Y"), (11, "text Z")]
    # the store holds exactly the accepted digests, each once
    digests = [r["digest"] for r in spark.read.parquet(store).collect()]
    assert len(digests) == len(set(digests)) == 3
