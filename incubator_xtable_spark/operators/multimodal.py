"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas transforms.

The actual media decode (PIL/librosa/ffmpeg) is NOT available in this
container, so the decode step is stubbed two ways:
- ``decode_stub`` raises NotImplementedError (the honest production seam —
  swap in a real decoder wired to the same mapInPandas signature);
- ``fake_feature_extract`` is a deterministic stand-in (byte-level
  statistics standing in for embeddings) so the Spark-side plumbing —
  schema, batch shape, partitioning, output contract — is real and tested.

Scale notes: media blobs are large; ``mapInPandas`` streams Arrow batches
so a partition never fully materializes; ``spark.sql.files.maxPartitionBytes``
and explicit repartition on ingest control batch memory. Feature outputs
are narrow (id + vector) and shuffle cheaply.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_stub(df: DataFrame) -> DataFrame:
    """Production seam: same signature/contract as a real decoder.
    Raises at execution time (not plan time) — clearly marked stub."""

    def _decode(batches: Iterator["object"]) -> Iterator["object"]:
        raise NotImplementedError(
            "media decoding requires PIL/librosa/ffmpeg which are not in "
            "this container; wire a real decoder into this mapInPandas seam"
        )

    return df.mapInPandas(_decode, FEATURE_SCHEMA)


def fake_feature_extract(df: DataFrame, n_features: int = 8) -> DataFrame:
    """Deterministic stand-in decoder: per-blob byte statistics as a fake
    feature vector. Exercises the real batch plumbing end-to-end."""

    def _extract(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, mtype, content in zip(pdf["media_id"], pdf["media_type"], pdf["content"]):
                if content is None:
                    rows.append((mid, mtype, None, None))
                    continue
                arr = np.frombuffer(bytes(content), dtype=np.uint8)
                if len(arr) == 0:
                    feats = [0.0] * n_features
                else:
                    # chunked byte means: deterministic, shape-stable
                    chunks = np.array_split(arr.astype(np.float64), n_features)
                    feats = [float(c.mean()) if len(c) else 0.0 for c in chunks]
                rows.append((mid, mtype, int(len(arr)), feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "n_bytes", "features"]
            )

    narrow = df.select("media_id", "media_type", "content")
    # Skew gate: only spread the blobs when the input arrives in FEWER
    # partitions than cores (the single-file test-table case). A well-split
    # big input (maxPartitionBytes-sized scan tasks) must NOT be
    # repartitioned — at 100 TB that unconditional repartition is a
    # full shuffle of every blob byte for nothing (r2 verdict).
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < parallelism:
        narrow = narrow.repartition(parallelism)
    return narrow.mapInPandas(_extract, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests/demos: treat document text bytes as opaque blobs
    (the container has no real media), preserving the MEDIA_SCHEMA contract."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )
