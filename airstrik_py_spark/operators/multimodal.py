"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode step is STUBBED
(deterministic fake features derived from the bytes; a clearly-marked
NotImplementedError guards the real path).  Everything Spark-side is real:
schema, batch iteration, partition-preserving UDF shape — swap `_decode_stub`
for a PIL/ffmpeg call on a cluster with the libs installed and nothing else
changes.

At 100 TB: binary payloads dominate row size — keep them in their own
parquet column (columnar pruning skips them unless projected), process with
mapInPandas (Arrow zero-copy batches), and repartition by size not count
(`spark.sql.files.maxPartitionBytes`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REAL_CODECS_AVAILABLE = False  # no PIL/opencv/ffmpeg in this container

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("payload_len", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic opaque binary payload per document (md5 bytes
    of the text) + typed metadata — the fixture stand-in for a real
    image/audio column."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
        F.unhex(F.md5("text")).alias("payload"),
    ).withColumn("payload_len", F.length("payload").cast("int"))


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode.  The real implementation would be
    PIL.Image.open / soundfile.read; guarded because the codecs are not in
    this container."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire PIL/ffmpeg decode here on a full cluster")
    w = 1 + payload[0] % 64
    h = 1 + payload[1] % 64
    feat = [float(b) / 255.0 for b in payload[:8]]
    return w, h, feat


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out,
    partition-preserving (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_len": pdf["payload_len"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)
