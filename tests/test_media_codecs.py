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


# ---------------------------------------------------------------------------
# pixel decode + dHash (r11)
# ---------------------------------------------------------------------------


def test_png_pixel_roundtrip_and_filters():
    from incubator_xtable_spark.operators.media_codecs import (
        decode_png_pixels,
        encode_png,
        encode_png_from_pixels,
    )

    img = encode_png(20, 16, seed=7)
    rows = decode_png_pixels(img)
    assert len(rows) == 16 and len(rows[0]) == 20
    for y, x in ((0, 0), (3, 5), (15, 19)):
        assert rows[y][x] == (x * 31 + y * 7 + 7) & 0xFF
    # arbitrary-pixel roundtrip (filter None)
    import random

    rnd = random.Random(1)
    pix = [[rnd.randrange(256) for _ in range(9)] for _ in range(7)]
    assert decode_png_pixels(encode_png_from_pixels(pix)) == pix


def test_png_pixel_decode_all_filter_types():
    """A PNG whose rows use every filter type (0-4) must unfilter back to
    the exact source pixels — pin against a hand-built file."""
    import struct
    import zlib

    from incubator_xtable_spark.operators.media_codecs import (
        _PNG_SIG,
        _png_chunk,
        decode_png_pixels,
    )

    width, height = 6, 5
    pix = [[(x * 37 + y * 11) & 0xFF for x in range(width)] for y in range(height)]
    raw = bytearray()
    prev = [0] * width
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        raw.append(ftype)
        line = pix[y]
        for x in range(width):
            left = line[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            if ftype == 0:
                enc = line[x]
            elif ftype == 1:
                enc = line[x] - left
            elif ftype == 2:
                enc = line[x] - up
            elif ftype == 3:
                enc = line[x] - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                enc = line[x] - pred
            raw.append(enc & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    blob = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixels(blob) == pix


def test_png_pixel_decode_refusals():
    import pytest

    from incubator_xtable_spark.operators.media_codecs import (
        MediaDecodeError,
        decode_png_pixels,
        encode_png,
    )

    img = bytearray(encode_png(8, 8, seed=0))
    img[28] = 1  # interlace flag inside IHDR -> CRC now wrong too
    with pytest.raises(MediaDecodeError):
        decode_png_pixels(bytes(img))
    with pytest.raises(MediaDecodeError, match="not a PNG"):
        decode_png_pixels(b"\x00" * 40)


def test_dhash_invariances():
    from incubator_xtable_spark.operators.media_codecs import (
        decode_png_pixels,
        dhash64_audio,
        dhash64_image,
        encode_png,
        encode_wav,
        wav_samples,
    )

    rows = decode_png_pixels(encode_png(24, 18, seed=9))
    h = dhash64_image(rows)
    # brightness shift: gradient directions (and the hash) are invariant
    # under a uniform +40 with no wraparound (halve first so it can't wrap
    # — the invariance claim is about monotone shifts, not mod-256 math)
    base = [[v >> 1 for v in r] for r in rows]
    shifted = [[v + 40 for v in r] for r in base]
    assert dhash64_image(base) == dhash64_image(shifted)
    # small perturbation: a few pixels +3 leaves the hash within 2 bits
    pert = [r[:] for r in rows]
    for i in range(5):
        pert[i][i] = (pert[i][i] + 3) & 0xFF
    assert bin(h ^ dhash64_image(pert)).count("1") <= 2
    # audio: gain scaling preserves the envelope hash
    s = wav_samples(encode_wav(1600))
    assert dhash64_audio(s) == dhash64_audio([v * 2 for v in s])


# ---------------------------------------------------------------------------
# GIF pixel decode: full LZW (r12)
# ---------------------------------------------------------------------------


def test_gif_lzw_roundtrip_exercises_growth_and_reset():
    """The real LZW compressor/decompressor pair must roundtrip streams
    that grow the code table through every width bump (9->12 bits) and
    past 4096 entries (CLEAR-and-reset), plus the degenerate encoder's
    clear-per-literal stream."""
    import random

    from incubator_xtable_spark.operators.media_codecs import (
        _gif_lzw_compress,
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rnd = random.Random(3)
    cases = [
        [rnd.randrange(256) for _ in range(10_000)],  # incompressible
        [7] * 5_000,  # max dictionary reuse (KwKwK path)
        [0, 255] * 3_000,
        [(i * i) % 256 for i in range(30_000)],  # grows past 4096 -> reset
    ]
    for pixels in cases:
        blob = _gif_lzw_compress(pixels, 8)
        assert _gif_lzw_decode(blob, 8) == pixels
    for mcs in (2, 4):
        pix = [rnd.randrange(1 << mcs) for _ in range(4_000)]
        assert _gif_lzw_decode(_gif_lzw_compress(pix, mcs), mcs) == pix
    pix4 = [rnd.randrange(4) for _ in range(500)]
    assert _gif_lzw_decode(_gif_lzw_encode(pix4, 2), 2) == pix4


def test_gif_pixel_roundtrip_and_interlace():
    import random

    from incubator_xtable_spark.operators.media_codecs import (
        decode_gif_pixels,
        encode_gif_from_pixels,
    )

    rnd = random.Random(11)
    rows = [[rnd.randrange(256) for _ in range(24)] for _ in range(18)]
    assert decode_gif_pixels(encode_gif_from_pixels(rows)) == rows
    # interlaced file: rows stored in the 4-pass order must de-weave back
    assert decode_gif_pixels(encode_gif_from_pixels(rows, interlace=True)) == rows


def test_gif_pixel_decode_legacy_fixture_pattern():
    """The 4-color header-tier fixture encoder (encode_gif) must decode
    to the luma of its GCT pattern GCT[(x+y) & 3] — pinning palette
    lookup + luma fold against known bytes."""
    from incubator_xtable_spark.operators.media_codecs import (
        decode_gif_pixels,
        encode_gif,
    )

    px = decode_gif_pixels(encode_gif(9, 7, n_frames=2))
    luma = [0, 255, (255 + 0 + 0) // 3, (0 + 0 + 255) // 3]
    assert px == [[luma[(x + y) & 3] for x in range(9)] for y in range(7)]


def test_gif_pixel_decode_refusals():
    import pytest

    from incubator_xtable_spark.operators.media_codecs import (
        MediaDecodeError,
        decode_gif_pixels,
        encode_gif_from_pixels,
    )

    with pytest.raises(MediaDecodeError, match="not a GIF"):
        decode_gif_pixels(b"\x00" * 20)
    # truncate the LZW data so the frame comes up short on pixels
    blob = bytearray(encode_gif_from_pixels([[1, 2, 3], [4, 5, 6]]))
    # image descriptor sits right after header(13) + 256-entry GCT(768)
    at = 13 + 768
    assert blob[at] == 0x2C
    truncated = bytes(blob[: at + 11]) + b"\x01\x08\x00\x3b"
    with pytest.raises(MediaDecodeError, match="pixels"):
        decode_gif_pixels(truncated)


def test_gif_dhash_joins_perceptual_tier():
    """A perturbed GIF twin must land within 2 Hamming bits of its base
    (same invariance contract as PNG), and the JPEG/MP4 quarantine is
    unchanged."""
    import random

    from incubator_xtable_spark.operators.media_codecs import (
        decode_gif_pixels,
        dhash64_image,
        encode_gif_from_pixels,
    )

    rnd = random.Random(5)
    rows = [[rnd.randrange(256) for _ in range(24)] for _ in range(18)]
    h = dhash64_image(decode_gif_pixels(encode_gif_from_pixels(rows)))
    twin = [r[:] for r in rows]
    for i in range(5):
        twin[i][i] = (twin[i][i] + 3) & 0xFF
    h2 = dhash64_image(decode_gif_pixels(encode_gif_from_pixels(twin)))
    assert bin(h ^ h2).count("1") <= 2


# ---------------------------------------------------------------------------
# JPEG baseline entropy codec (r13)
# ---------------------------------------------------------------------------


def test_jpeg_pixel_roundtrip_dc_exact():
    """encode_jpeg_from_pixels -> decode_jpeg_pixels recovers every 8x8
    block's mean within the DC quantization step (q=16 -> 2 grey
    levels), across grayscale/color frames and restart intervals; the
    header decoder agrees on dims/depth/channels."""
    from incubator_xtable_spark.operators.media_codecs import (
        decode_jpeg,
        decode_jpeg_pixels,
        encode_jpeg_from_pixels,
    )

    W, H = 96, 80
    rows = [[(x * 2 + y * 3) % 256 for x in range(W)] for y in range(H)]
    for color in (False, True):
        for ri in (0, 3):
            blob = encode_jpeg_from_pixels(rows, color=color, restart_interval=ri)
            info = decode_jpeg(blob)
            assert (info["width"], info["height"]) == (W, H)
            assert info["bit_depth"] == 8
            assert info["channels"] == (3 if color else 1)
            thumb = decode_jpeg_pixels(blob)
            assert len(thumb) == H // 8 and len(thumb[0]) == W // 8
            for by in range(H // 8):
                for bx in range(W // 8):
                    mean = (
                        sum(
                            rows[by * 8 + y][bx * 8 + x]
                            for y in range(8)
                            for x in range(8)
                        )
                        / 64
                    )
                    assert abs(thumb[by][bx] - mean) <= 1.0


def test_jpeg_pixel_decode_odd_dims_and_flat_fast_path():
    """Non-multiple-of-8 dims crop the padded MCU grid correctly, and a
    per-block-constant image (the synthesize_media fast path) decodes to
    exactly its block values (flat-block DCT identity F(0,0)=8*v)."""
    from incubator_xtable_spark.operators.media_codecs import (
        decode_jpeg_pixels,
        encode_jpeg_from_pixels,
    )

    W, H = 75, 43  # 10 x 6 blocks after ceil
    blk = [[(bx * 37 + by * 59 + 5) % 256 for bx in range(10)] for by in range(6)]
    rows = [[blk[y // 8][x // 8] for x in range(W)] for y in range(H)]
    thumb = decode_jpeg_pixels(encode_jpeg_from_pixels(rows))
    assert len(thumb) == 6 and len(thumb[0]) == 10
    for by in range(6):
        for bx in range(10):
            assert abs(thumb[by][bx] - blk[by][bx]) <= 1  # quant step /2


def test_jpeg_pixel_decode_refusals():
    """Progressive frames, 16-bit quant tables and truncated entropy
    data refuse loudly (quarantine posture, never a wrong hash)."""
    import struct as _s

    import pytest as _pytest

    from incubator_xtable_spark.operators.media_codecs import (
        MediaDecodeError,
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_from_pixels,
    )

    rows = [[(x + y) % 256 for x in range(32)] for y in range(24)]
    blob = bytearray(encode_jpeg_from_pixels(rows))
    # flip SOF0 -> SOF2 (progressive): the marker byte after 0xFF 0xC0
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with _pytest.raises(MediaDecodeError, match="baseline"):
        decode_jpeg_pixels(bytes(blob))
    # 16-bit precision DQT refuses
    blob2 = bytearray(encode_jpeg_from_pixels(rows))
    j = blob2.find(b"\xff\xdb")
    blob2[j + 4] = 0x10  # Pq=1
    with _pytest.raises(MediaDecodeError, match="quant"):
        decode_jpeg_pixels(bytes(blob2))
    # truncated entropy data
    blob3 = encode_jpeg_from_pixels(rows)[:-40]
    with _pytest.raises(MediaDecodeError):
        decode_jpeg_pixels(blob3)
    # the legacy header-only fixture (fake scan, no AC table) refuses
    with _pytest.raises(MediaDecodeError):
        decode_jpeg_pixels(encode_jpeg(16, 16))


def test_jpeg_dhash_joins_perceptual_tier():
    """The dHash over the 1/8-scale DC luma is stable under pixel-level
    perturbation (invisible to block means) and differs across distinct
    block patterns — JPEG leaves the quarantine tier."""
    import random

    from incubator_xtable_spark.operators.media_codecs import (
        decode_jpeg_pixels,
        dhash64_image,
        encode_jpeg_from_pixels,
    )

    rnd = random.Random(11)
    blk = [[rnd.randrange(256) for _ in range(12)] for _ in range(10)]
    rows = [[blk[y // 8][x // 8] for x in range(96)] for y in range(80)]
    h = dhash64_image(decode_jpeg_pixels(encode_jpeg_from_pixels(rows)))
    twin = [r[:] for r in rows]
    for _ in range(30):
        y, x = rnd.randrange(80), rnd.randrange(96)
        twin[y][x] = max(0, min(255, twin[y][x] + rnd.randint(-10, 10)))
    h2 = dhash64_image(decode_jpeg_pixels(encode_jpeg_from_pixels(twin)))
    assert bin(h ^ h2).count("1") <= 2
    other_blk = [[rnd.randrange(256) for _ in range(12)] for _ in range(10)]
    other = [[other_blk[y // 8][x // 8] for x in range(96)] for y in range(80)]
    h3 = dhash64_image(decode_jpeg_pixels(encode_jpeg_from_pixels(other)))
    assert bin(h ^ h3).count("1") > 8


def test_jpeg_chroma_subsampling_roundtrip():
    """4:2:0 and 4:2:2 frames (the real-world camera-JPEG MCU shapes —
    multiple luma blocks per interleaved MCU) decode to the same exact
    block means as 4:4:4, including non-MCU-aligned dims (padding crop),
    and the dHash is invariant to the sampling choice."""
    from incubator_xtable_spark.operators.media_codecs import (
        decode_jpeg,
        decode_jpeg_pixels,
        dhash64_image,
        encode_jpeg_from_pixels,
    )

    W, H = 100, 84  # not multiples of 16
    rows = [[(x * 2 + y * 3) % 256 for x in range(W)] for y in range(H)]
    hashes = []
    for sub in ((1, 1), (2, 2), (2, 1)):
        blob = encode_jpeg_from_pixels(
            rows, color=True, subsampling=sub, restart_interval=3
        )
        info = decode_jpeg(blob)
        assert (info["width"], info["height"], info["channels"]) == (W, H, 3)
        thumb = decode_jpeg_pixels(blob)
        assert len(thumb) == -(-H // 8) and len(thumb[0]) == -(-W // 8)
        for by in range(H // 8):
            for bx in range(W // 8):
                mean = (
                    sum(rows[by * 8 + y][bx * 8 + x] for y in range(8) for x in range(8))
                    / 64
                )
                assert abs(thumb[by][bx] - mean) <= 1.0, (sub, by, bx)
        hashes.append(dhash64_image(thumb))
    assert len(set(hashes)) == 1  # sampling choice never moves the hash
    # grayscale cannot subsample (no chroma): loud refusal
    import pytest as _pytest

    with _pytest.raises(ValueError, match="color"):
        encode_jpeg_from_pixels(rows, subsampling=(2, 2))


# ---------------------------------------------------------------------------
# r14: MJPEG-in-MP4 — sample-table walk + first-frame JPEG decode
# ---------------------------------------------------------------------------


def test_mjpeg_mp4_roundtrip_and_header_decode():
    """encode_mp4_mjpeg builds a structurally valid ISO-BMFF file: the
    header decoder reads dims/duration, the sample-table walk returns
    the 'jpeg' fourcc and the exact first JPEG, and the frame decode
    recovers the block means."""
    from incubator_xtable_spark.operators.media_codecs import (
        decode_jpeg_pixels,
        decode_mp4,
        decode_mp4_mjpeg_frame,
        encode_jpeg_from_pixels,
        encode_mp4_mjpeg,
        mp4_first_video_sample,
    )

    rows = [[(x * 3 + y * 5) % 256 for x in range(48)] for y in range(32)]
    rows2 = [[255 - v for v in r] for r in rows]
    blob = encode_mp4_mjpeg([rows, rows2], frame_duration=40)
    info = decode_mp4(blob)
    assert (info["width"], info["height"]) == (48, 32)
    assert info["duration_ms"] == 80
    fourcc, sample = mp4_first_video_sample(blob)
    assert fourcc == b"jpeg"
    assert sample == encode_jpeg_from_pixels(rows)  # frame 1, byte-exact
    thumb = decode_mp4_mjpeg_frame(blob)
    assert thumb == decode_jpeg_pixels(encode_jpeg_from_pixels(rows))
    assert len(thumb) == 4 and len(thumb[0]) == 6  # 1/8 scale of 48x32


def test_mjpeg_mp4_non_jpeg_codec_refuses_naming_fourcc():
    """H.264 stays loudly refused: a sample entry with fourcc 'avc1'
    raises naming the codec; headerless tables raise too."""
    import pytest

    from incubator_xtable_spark.operators.media_codecs import (
        MediaDecodeError,
        decode_mp4_mjpeg_frame,
        encode_mp4,
        encode_mp4_mjpeg,
    )

    rows = [[10] * 16 for _ in range(16)]
    blob = encode_mp4_mjpeg([rows])
    avc = blob.replace(b"jpeg", b"avc1", 1)  # first 'jpeg' is the stsd fourcc
    with pytest.raises(MediaDecodeError, match="avc1"):
        decode_mp4_mjpeg_frame(avc)
    # the r13-era header-only skeleton has no sample tables at all
    with pytest.raises(MediaDecodeError, match="sample tables|video track"):
        decode_mp4_mjpeg_frame(encode_mp4(32, 16, duration_ms=100))


def test_mjpeg_mp4_dhash_joins_perceptual_tier():
    """VERDICT r13 #3 done-criterion: planted near-identical MJPEG blobs
    (pixel-level noise twins + a re-encoded q-twin) land within Hamming
    2 of their originals through media_dhash, while distinct videos
    separate — recall over the planted set must be >= 0.9."""
    import random

    from incubator_xtable_spark.operators.media_codecs import (
        decode_mp4_mjpeg_frame,
        dhash64_image,
        encode_mp4_mjpeg,
    )

    rnd = random.Random(23)
    planted = []
    for i in range(6):
        blk = [[rnd.randrange(256) for _ in range(12)] for _ in range(10)]
        rows = [[blk[y // 8][x // 8] for x in range(96)] for y in range(80)]
        twin = [r[:] for r in rows]
        for _ in range(30):
            y, x = rnd.randrange(80), rnd.randrange(96)
            twin[y][x] = max(0, min(255, twin[y][x] + rnd.randint(-9, 9)))
        planted.append(
            (encode_mp4_mjpeg([rows, rows]), encode_mp4_mjpeg([twin], q=16))
        )
    hits = 0
    hashes = []
    for orig, twin in planted:
        h1 = dhash64_image(decode_mp4_mjpeg_frame(orig))
        h2 = dhash64_image(decode_mp4_mjpeg_frame(twin))
        if bin(h1 ^ h2).count("1") <= 2:
            hits += 1
        hashes.append(h1)
    assert hits / len(planted) >= 0.9, f"MJPEG twin recall {hits}/{len(planted)}"
    # distinct videos separate (no hash collapse across the planted set)
    seps = [
        bin(hashes[i] ^ hashes[j]).count("1")
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
    ]
    assert min(seps) > 2, seps


def test_mjpeg_mp4_through_spark_dhash_tier(spark):
    """media_dhash fingerprints MJPEG MP4s next to PNG/GIF/WAV/JPEG and
    quarantines only the non-decodable codec, with the reason naming
    it; media_near_duplicates pairs the planted MJPEG twins."""
    from incubator_xtable_spark.operators.media_codecs import (
        encode_mp4_mjpeg,
        encode_png_from_pixels,
    )
    from incubator_xtable_spark.operators.multimodal import (
        media_dhash,
        media_near_duplicates,
    )

    rows = [[(x * 7 + y * 3) % 256 for x in range(48)] for y in range(40)]
    twin = [r[:] for r in rows]
    twin[5][5] = (twin[5][5] + 4) % 256
    mj1 = encode_mp4_mjpeg([rows])
    mj2 = encode_mp4_mjpeg([twin])
    avc = mj1.replace(b"jpeg", b"avc1", 1)
    png = encode_png_from_pixels(rows)
    df = spark.createDataFrame(
        [(1, mj1), (2, mj2), (3, avc), (4, png)],
        "media_id LONG, content BINARY",
    )
    got = {r["media_id"]: r for r in media_dhash(df).collect()}
    assert got[1]["mime"] == "video/mp4" and got[1]["dhash"] is not None
    assert got[2]["dhash"] is not None
    assert got[3]["dhash"] is None and "avc1" in got[3]["error"]
    assert got[4]["dhash"] is not None
    # the MJPEG pair emerges from the banded near-dup kernel, mime-blocked
    pairs = media_near_duplicates(df, max_hamming=2).collect()
    assert {(r["doc_a"], r["doc_b"], r["mime"]) for r in pairs} == {
        (1, 2, "video/mp4")
    }
