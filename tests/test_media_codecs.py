"""Differentials for the pure-stdlib media container codecs: every encoder's
parameters must round-trip exactly through the matching decoder, corrupt
inputs must fail loudly, and the Spark decode_media seam must agree with the
pure-python path row-for-row. The WAV tier is additionally checked against
the stdlib ``wave`` reader (an independent implementation of the spec)."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from incubator_xtable_spark.operators.media_codecs import (
    MediaDecodeError,
    decode_gif,
    decode_jpeg,
    decode_mp4,
    decode_png,
    decode_wav,
    encode_gif,
    encode_jpeg,
    encode_mp4,
    encode_png,
    encode_wav,
    sniff_media,
)


@pytest.mark.parametrize("w,h", [(1, 1), (17, 3), (640, 480), (300, 1)])
def test_png_roundtrip(w, h):
    info = decode_png(encode_png(w, h, seed=w * h))
    assert (info["width"], info["height"]) == (w, h)
    assert info["bit_depth"] == 8 and info["channels"] == 1
    assert info["mime"] == "image/png"


def test_png_idat_scanlines_are_real():
    # the fixture is a REAL decodable PNG: inflate IDAT and check the
    # filter-byte + row layout the spec mandates for gray8
    data = encode_png(12, 5)
    # IDAT chunk starts after sig(8) + IHDR chunk(25)
    (idat_len,) = struct.unpack(">I", data[33:37])
    assert data[37:41] == b"IDAT"
    raw = zlib.decompress(data[41 : 41 + idat_len])
    assert len(raw) == 5 * (1 + 12)
    for y in range(5):
        assert raw[y * 13] == 0  # filter None


def test_png_crc_corruption_detected():
    data = bytearray(encode_png(10, 10))
    data[20] ^= 0xFF  # flip a width byte inside IHDR, CRC now stale
    with pytest.raises(MediaDecodeError, match="CRC"):
        decode_png(bytes(data))


def test_png_truncated_rejected():
    with pytest.raises(MediaDecodeError):
        decode_png(encode_png(4, 4)[:20])


@pytest.mark.parametrize("w,h,nc", [(1, 1, 1), (100, 60, 3), (65500, 2, 1)])
def test_jpeg_roundtrip(w, h, nc):
    info = decode_jpeg(encode_jpeg(w, h, n_components=nc))
    assert (info["width"], info["height"]) == (w, h)
    assert info["channels"] == nc and info["bit_depth"] == 8
    assert info["mime"] == "image/jpeg"


def test_jpeg_without_sof_rejected():
    with pytest.raises(MediaDecodeError, match="no SOF"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


@pytest.mark.parametrize("w,h,frames", [(1, 1, 1), (8, 5, 3), (20, 20, 7)])
def test_gif_roundtrip(w, h, frames):
    info = decode_gif(encode_gif(w, h, n_frames=frames, delay_cs=4))
    assert (info["width"], info["height"]) == (w, h)
    assert info["n_frames"] == frames
    assert info["duration_ms"] == frames * 40
    assert info["mime"] == "image/gif"


def test_gif_trailing_garbage_block_rejected():
    data = encode_gif(3, 3)[:-1] + b"\x7f"  # replace trailer with junk
    with pytest.raises(MediaDecodeError, match="unknown block"):
        decode_gif(data)


@pytest.mark.parametrize("n_samples,rate,ch", [(8000, 8000, 1), (44100, 44100, 2), (1234, 16000, 1)])
def test_wav_roundtrip_and_stdlib_agreement(n_samples, rate, ch):
    blob = encode_wav(n_samples, sample_rate=rate, channels=ch)
    info = decode_wav(blob)
    assert info["sample_rate_hz"] == rate
    assert info["channels"] == ch
    assert info["bit_depth"] == 16
    assert info["duration_ms"] == n_samples * 2 * ch * 1000 // (rate * ch * 2)
    # independent oracle: the stdlib wave reader
    with wave.open(io.BytesIO(blob), "rb") as wf:
        assert wf.getframerate() == rate
        assert wf.getnchannels() == ch
        assert wf.getnframes() == n_samples
        assert wf.getsampwidth() == 2


def test_wav_missing_data_chunk_rejected():
    blob = encode_wav(100)
    # keep RIFF/WAVE + fmt only (fmt begins at 12, 8+16 bytes long)
    truncated = blob[:36]
    with pytest.raises(MediaDecodeError, match="missing fmt/data"):
        decode_wav(truncated)


@pytest.mark.parametrize("w,h,dur", [(320, 240, 1000), (1920, 1080, 90500), (1, 1, 7)])
def test_mp4_roundtrip(w, h, dur):
    info = decode_mp4(encode_mp4(w, h, duration_ms=dur))
    assert (info["width"], info["height"]) == (w, h)
    assert info["duration_ms"] == dur
    assert info["mime"] == "video/mp4"


def test_sniff_dispatch_and_zlib_probe():
    png = encode_png(9, 4)
    assert sniff_media(png)["mime"] == "image/png"
    wrapped = zlib.compress(png)
    info = sniff_media(wrapped)
    assert info["mime"] == "image/png"
    assert info["container"] == "zlib+image/png"
    assert (info["width"], info["height"]) == (9, 4)
    assert sniff_media(encode_gif(2, 2))["mime"] == "image/gif"
    assert sniff_media(encode_wav(50))["mime"] == "audio/wav"
    assert sniff_media(encode_jpeg(5, 6))["mime"] == "image/jpeg"
    assert sniff_media(encode_mp4(2, 2, duration_ms=10))["mime"] == "video/mp4"


def test_sniff_rejects_unknown_and_corrupt_zlib():
    with pytest.raises(MediaDecodeError, match="unrecognized"):
        sniff_media(b"plain text, not a container")
    broken = bytearray(zlib.compress(b"x" * 100))
    broken[10] ^= 0xFF
    with pytest.raises(MediaDecodeError, match="inflate|unrecognized"):
        sniff_media(bytes(broken))


def test_spark_decode_matches_pure_python(spark):
    """The mapInPandas seam must return exactly what sniff_media returns."""
    from incubator_xtable_spark.operators.multimodal import decode_media

    blobs = {
        1: encode_png(33, 21),
        2: encode_gif(6, 4, n_frames=2),
        3: encode_wav(4000, sample_rate=8000),
        4: encode_jpeg(55, 44),
        5: zlib.compress(encode_png(7, 7)),
        6: encode_mp4(640, 360, duration_ms=2500),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()], "media_id long, content binary"
    )
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert len(rows) == len(blobs)
    for mid, blob in blobs.items():
        want = sniff_media(blob)
        got = rows[mid]
        for key in ("mime", "container", "width", "height", "bit_depth",
                    "channels", "sample_rate_hz", "duration_ms", "n_frames"):
            assert got[key] == want[key], f"media_id={mid} field {key}"
        assert got["n_bytes"] == len(blob)
        assert got["error"] is None


def test_synthesized_media_decodes_to_formula(spark):
    """End-to-end: synthesize_media blobs decode to the documented integer
    formulas of (doc_id, n_chars) — the same contract the SQL oracle checks."""
    from incubator_xtable_spark.operators.multimodal import (
        decode_media,
        synthesize_media,
    )

    docs = spark.createDataFrame(
        [(i, 40 + i * 13) for i in range(24)], "doc_id long, n_chars long"
    )
    rows = {r["media_id"]: r for r in decode_media(synthesize_media(docs)).collect()}
    assert len(rows) == 24
    for i in range(24):
        r = rows[i]
        kind = i % 4
        n_chars = 40 + i * 13
        if kind == 0:
            assert r["mime"] == "image/png"
            assert r["container"] == ("zlib+image/png" if i % 16 == 0 else "image/png")
            assert (r["width"], r["height"]) == (16 + i % 31, 8 + i % 13)
        elif kind == 1:
            assert r["mime"] == "image/gif"
            assert (r["width"], r["height"]) == (4 + i % 9, 3 + i % 7)
            assert r["n_frames"] == 1 + i % 3
            assert r["duration_ms"] == (1 + i % 3) * 40
        elif kind == 2:
            assert r["mime"] == "audio/wav"
            assert r["sample_rate_hz"] == 8000
            assert r["duration_ms"] == 100 + (n_chars % 100) * 5
        else:
            assert r["mime"] == "image/jpeg"
            assert (r["width"], r["height"]) == (10 + i % 50, 10 + i % 40)
