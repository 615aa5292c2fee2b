"""REAL multimodal codecs (no third-party libraries): WAV via the stdlib
``wave`` module, binary netpbm (P5/P6) and uncompressed 24-bit BMP via
numpy.  The tests build genuine files byte-for-byte and assert exact
decoded metadata, content features (RMS/peak, luminance stats), and the
nearest-neighbor resize round trip -- plus that unknown formats still
fall through to the deterministic stub so the pipeline shape never
breaks."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from fetchez_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_metadata,
    encode_ppm,
    extract_features,
    resize_image,
)


def wav_bytes(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def ppm_bytes(pixels: np.ndarray) -> bytes:
    return encode_ppm(pixels)


def pgm_bytes(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    return b"P5\n# a comment\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def bmp_bytes(rgb: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP."""
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):
        row = rgb[y][..., ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows


def test_wav_decode_and_features(spark):
    t = np.arange(1600) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav_bytes(sine)), "audio/wav")], MEDIA_SCHEMA
    )
    row = extract_features(df).collect()[0]
    assert row["decoder"] == "wav"
    assert row["sample_rate"] == 8000 and row["channels"] == 1
    assert row["n_frames"] == 1600
    assert row["duration_s"] == pytest.approx(0.2)
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2); peak ~0.5
    assert row["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=0.01)
    assert row["peak"] == pytest.approx(0.5, rel=0.01)


def test_netpbm_decode_features_and_comments(spark):
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(12, 20, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(7, 9), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(ppm_bytes(rgb)), "image/x-portable-pixmap"),
            (2, "image", bytearray(pgm_bytes(gray)), "image/x-portable-graymap"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in extract_features(df).collect()}
    assert rows[1]["decoder"] == "ppm" and (rows[1]["width"], rows[1]["height"]) == (20, 12)
    assert rows[2]["decoder"] == "pgm" and (rows[2]["width"], rows[2]["height"]) == (9, 7)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert rows[1]["luma_mean"] == pytest.approx(float(luma.mean()), rel=1e-9)
    assert rows[1]["luma_std"] == pytest.approx(float(luma.std()), rel=1e-9)
    assert rows[2]["luma_mean"] == pytest.approx(float(gray.mean()), rel=1e-9)


def test_bmp_decode_matches_source_pixels(spark):
    rgb = np.zeros((5, 3, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0)  # top-left red: catches bottom-up flips
    rgb[4, 2] = (0, 0, 255)
    df = spark.createDataFrame(
        [(1, "image", bytearray(bmp_bytes(rgb)), "image/bmp")], MEDIA_SCHEMA
    )
    row = extract_features(df).collect()[0]
    assert row["decoder"] == "bmp"
    assert (row["width"], row["height"]) == (3, 5)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert row["luma_mean"] == pytest.approx(float(luma.mean()), rel=1e-9)


def test_resize_round_trip(spark):
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(ppm_bytes(rgb)), "image/x-portable-pixmap"),
            (2, "image", bytearray(b"\x89PNG-not-decodable"), "image/png"),
        ],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in resize_image(df, 8, 4).collect()}
    assert out[1]["resized"] is True and (out[1]["width"], out[1]["height"]) == (8, 4)
    # the resized payload is itself a decodable P6 of the new size, and
    # nearest-neighbor at 2:1 / 4:1 picks exact source pixels
    re = {r["media_id"]: r for r in decode_metadata(
        spark.createDataFrame(
            [(1, "image", out[1]["payload"], "image/x-portable-pixmap")], MEDIA_SCHEMA
        )
    ).collect()}
    assert (re[1]["width"], re[1]["height"], re[1]["decoder"]) == (8, 4, "ppm")
    ys = (np.arange(4) * 16 // 4).clip(0, 15)
    xs = (np.arange(8) * 16 // 8).clip(0, 15)
    expect = rgb[np.ix_(ys, xs)]
    got = np.frombuffer(bytes(out[1]["payload"]).split(b"\n255\n", 1)[1], dtype=np.uint8)
    assert np.array_equal(got.reshape(4, 8, 3), expect)
    # non-decodable rows pass through untouched
    assert out[2]["resized"] is False and bytes(out[2]["payload"]).startswith(b"\x89PNG")


def test_malformed_known_magic_falls_to_stub(spark):
    # RIFF/WAVE magic but garbage body: the real decoder raises inside,
    # the dispatch falls back to the stub instead of failing the batch
    junk = b"RIFF\x00\x00\x00\x00WAVEjunkjunkjunk"
    df = spark.createDataFrame([(1, "audio", bytearray(junk), "audio/wav")], MEDIA_SCHEMA)
    row = decode_metadata(df).collect()[0]
    assert row["decoder"] == "stub" and row["byte_len"] == len(junk)


def test_audio_windows_real_slicing(spark):
    from fetchez_spark.functions.multimodal import audio_windows, extract_features

    # 2.5 s at 8 kHz: 1 s windows -> 3 windows (last one 0.5 s)
    t = np.arange(20000) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 100 * t)
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav_bytes(sine)), "audio/wav"),
            (2, "image", bytearray(b"\x89PNG-not-audio00"), "image/png"),
        ],
        MEDIA_SCHEMA,
    )
    wins = sorted(
        audio_windows(df, window_s=1.0).collect(), key=lambda r: r["window_idx"]
    )
    assert [r["media_id"] for r in wins] == [1, 1, 1]  # non-WAV rows dropped
    assert [r["n_frames"] for r in wins] == [8000, 8000, 4000]
    assert [r["start_s"] for r in wins] == [0.0, 1.0, 2.0]
    assert wins[2]["end_s"] == pytest.approx(2.5)
    # each window payload is itself a decodable standalone WAV whose
    # samples are the exact slice of the source
    redec = extract_features(
        spark.createDataFrame(
            [(10 + i, "audio", w["payload"], "audio/wav") for i, w in enumerate(wins)],
            MEDIA_SCHEMA,
        )
    ).collect()
    assert all(r["decoder"] == "wav" for r in redec)
    got = np.frombuffer(bytes(wins[1]["payload"])[44:], dtype="<i2")
    expect = (sine * 32767).astype("<i2")[8000:16000]
    assert np.array_equal(got, expect)
    # overlapping hop: 1 s windows every 0.5 s -> starts 0, .5, 1, 1.5, 2
    ov = audio_windows(df, window_s=1.0, hop_s=0.5).collect()
    assert sorted(r["start_s"] for r in ov) == [0.0, 0.5, 1.0, 1.5, 2.0]


def test_image_dhash64_bit_exact(spark):
    from fetchez_spark.functions.multimodal import dhash64_pixels, image_dhash64

    # a 9x8 grayscale image IS its own downsample: the hash is pure
    # neighbor comparisons, independently recomputed here
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    expect = 0
    for r in range(8):
        for c in range(8):
            if g[r, c] > g[r, c + 1]:
                expect |= 1 << (r * 8 + c)
    if expect >= 1 << 63:
        expect -= 1 << 64
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(pgm_bytes(g)), "image/x-portable-graymap"),
            (2, "image", bytearray(b"\x89PNG-opaque-bytes"), "image/png"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in image_dhash64(df).collect()}
    assert rows[1]["dhash"] == expect and rows[1]["decoder"] == "pgm"
    assert rows[2]["dhash"] is None and rows[2]["decoder"] == "stub"
    assert dhash64_pixels(g.reshape(8, 9, 1)) == expect


def test_image_neardup_pairs(spark):
    from fetchez_spark.functions.multimodal import image_neardup_pairs

    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]  # tiny perturbation
    far = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(ppm_bytes(base)), "image/x-portable-pixmap"),
            (2, "image", bytearray(ppm_bytes(near)), "image/x-portable-pixmap"),
            (3, "image", bytearray(ppm_bytes(far)), "image/x-portable-pixmap"),
        ],
        MEDIA_SCHEMA,
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in image_neardup_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_wav_stereo_and_8bit(spark):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(1)
        w.setframerate(16000)
        w.writeframes(bytes([128, 128, 255, 0] * 100))
    df = spark.createDataFrame(
        [(1, "audio", bytearray(buf.getvalue()), "audio/wav")], MEDIA_SCHEMA
    )
    row = extract_features(df).collect()[0]
    assert row["channels"] == 2 and row["sample_rate"] == 16000
    assert row["n_frames"] == 200
    assert row["peak"] == pytest.approx(1.0, rel=0.01)


def test_zero_rate_wav_yields_no_windows(spark):
    # the stdlib wave module parses a sample_rate=0 header without
    # complaint (setframerate refuses to WRITE one, so craft the bytes):
    # such a file has no time axis -- audio_windows must drop the row,
    # not ZeroDivisionError the whole Arrow batch
    from fetchez_spark.functions.multimodal import audio_windows, decode_metadata

    data = b"\x00\x01" * 100
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(payload), "audio/wav"),
            (2, "audio", bytearray(wav_bytes(np.zeros(100) + 0.25)), "audio/wav"),
        ],
        MEDIA_SCHEMA,
    )
    wins = audio_windows(df, window_s=1.0).collect()
    assert {r["media_id"] for r in wins} == {2}  # rate-0 row dropped, good row windowed
    # decode_metadata on the same row keeps its guarded null duration
    meta = {r["media_id"]: r for r in decode_metadata(df).collect()}
    assert meta[1]["decoder"] == "wav" and meta[1]["duration_s"] is None


def y4m_bytes(frames, fps=(25, 1), csp=b"C420"):
    """Genuine YUV4MPEG2 bytes from (n, h, w) uint8 luma planes (chroma
    planes filled with 128)."""
    n, h, w = frames.shape
    hdr = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (w, h, *fps, csp)
    chroma = b"\x80" * (
        (w // 2) * (h // 2) * 2 if csp.startswith(b"C420")
        else 0 if csp.startswith(b"Cmono") else (w * h * 2)
    )
    body = b"".join(
        b"FRAME\n" + frames[i].astype(np.uint8).tobytes() + chroma
        for i in range(n)
    )
    return hdr + body


def test_y4m_decode_and_luma_stats(spark):
    from fetchez_spark.functions.multimodal import decode_metadata, extract_features

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(5, 6, 8), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "video", bytearray(y4m_bytes(frames)), "video/x-yuv4mpeg")],
        MEDIA_SCHEMA,
    )
    row = decode_metadata(df).collect()[0]
    assert row["decoder"] == "y4m"
    assert (row["width"], row["height"], row["n_frames"]) == (8, 6, 5)
    assert row["duration_s"] == pytest.approx(5 / 25)
    feat = extract_features(df).collect()[0]
    luma = frames.astype(np.float64)
    assert feat["luma_mean"] == pytest.approx(luma.mean())
    assert feat["luma_std"] == pytest.approx(luma.std())


def test_y4m_frame_extraction_round_trip(spark):
    from fetchez_spark.functions.multimodal import (
        _netpbm_pixels,
        video_frames,
    )

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, size=(7, 4, 6), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(y4m_bytes(frames, fps=(30, 1))), "video/x-yuv4mpeg"),
            (2, "image", bytearray(b"\x89PNG-not-video00"), "image/png"),
        ],
        MEDIA_SCHEMA,
    )
    out = sorted(video_frames(df, every_n=2).collect(), key=lambda r: r["frame_idx"])
    assert [r["media_id"] for r in out] == [1, 1, 1, 1]  # non-y4m dropped
    assert [r["frame_idx"] for r in out] == [0, 2, 4, 6]
    assert out[1]["ts_s"] == pytest.approx(2 / 30)
    # each payload is a standalone P5 whose pixels ARE the source luma
    for r in out:
        px = _netpbm_pixels(bytes(r["payload"]), "pgm")[..., 0]
        assert np.array_equal(px, frames[r["frame_idx"]])


def test_y4m_malformed_and_mono(spark):
    from fetchez_spark.functions.multimodal import decode_metadata, video_frames

    good = y4m_bytes(np.full((2, 4, 4), 9, dtype=np.uint8), csp=b"Cmono")
    truncated = y4m_bytes(np.full((2, 4, 4), 9, dtype=np.uint8))[:-5]
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(good), "video/x-yuv4mpeg"),
            (2, "video", bytearray(truncated), "video/x-yuv4mpeg"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in decode_metadata(df).collect()}
    assert rows[1]["decoder"] == "y4m" and rows[1]["n_frames"] == 2
    assert rows[2]["decoder"] == "stub"  # truncated frame: stub, not a crash
    assert {r["media_id"] for r in video_frames(df).collect()} == {1}


# ---------------------------------------------------------------------------
# PNG: the real compressed-image codec (stdlib zlib + numpy unfilter)
# ---------------------------------------------------------------------------

def _png_forward_filter(px: np.ndarray, ftype: int) -> bytes:
    """Independent forward implementation of each PNG scanline filter
    (straight from the spec) to prove the decoder's unfilter against —
    color type 2 (RGB)."""
    import zlib

    from fetchez_spark.functions.multimodal import _PNG_MAGIC, _png_chunk

    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        out.append(ftype)
        for x in range(stride):
            a = int(line[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(flat[y - 1][x - c]) if (x >= c and y > 0) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out.append((int(line[x]) - pred) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def test_png_encode_decode_round_trip_all_channel_counts():
    from fetchez_spark.functions.multimodal import _png_pixels, encode_png

    rng = np.random.RandomState(11)
    for shape in [(5, 4), (6, 3, 3), (4, 4, 4), (3, 7, 2)]:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        got = _png_pixels(encode_png(px))
        exp = px if px.ndim == 3 else px[..., None]
        assert got.shape == exp.shape and (got == exp).all()


def test_png_unfilter_matches_spec_for_all_five_filters():
    from fetchez_spark.functions.multimodal import _png_pixels

    px = np.random.RandomState(3).randint(0, 256, size=(9, 7, 3), dtype=np.uint8)
    for ftype in range(5):
        got = _png_pixels(_png_forward_filter(px, ftype))
        assert (got == px).all(), f"filter {ftype}"


def test_png_decode_features_resize_and_dhash(spark):
    from fetchez_spark.functions.multimodal import (
        dhash64_pixels,
        encode_png,
        image_dhash64,
    )

    rgb = np.random.RandomState(5).randint(0, 256, size=(10, 8, 3), dtype=np.uint8)
    gray = np.arange(48, dtype=np.uint8).reshape(6, 8)
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(rgb)), "image/png"),
         (2, "image", bytearray(encode_png(gray)), "image/png")],
        schema=MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in extract_features(df).collect()}
    assert feats[1]["decoder"] == "png" and feats[1]["width"] == 8
    assert feats[1]["channels"] == 3 and feats[2]["channels"] == 1
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert feats[1]["luma_mean"] == pytest.approx(float(luma.mean()))
    assert feats[2]["luma_std"] == pytest.approx(float(gray.astype(float).std()))
    # stored-deflate size arithmetic: h*(1+w*c) + 68 below 64 KiB
    assert feats[1]["byte_len"] == 10 * (1 + 8 * 3) + 68
    # resize re-encodes PNG input as P6 like every other decodable format
    rs = {r["media_id"]: r for r in resize_image(df, 4, 4).collect()}
    assert rs[1]["resized"] and bytes(rs[1]["payload"]).startswith(b"P6")
    # dhash through the Spark API == dhash over the raw pixels
    hs = {r["media_id"]: r for r in image_dhash64(df).collect()}
    assert hs[1]["decoder"] == "png"
    assert hs[1]["dhash"] == dhash64_pixels(rgb)
    assert hs[2]["dhash"] == dhash64_pixels(gray[..., None])


def test_png_malformed_and_unsupported_fall_to_stub(spark):
    from fetchez_spark.functions.multimodal import _PNG_MAGIC, encode_png

    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    truncated = good[:20]
    # interlaced: IHDR is still a real header (metadata decodes, like an
    # unsupported-bpp BMP), but the PIXEL path must refuse Adam7 and the
    # features stay null
    interlaced = bytearray(good)
    interlaced[8 + 8 + 12] = 1  # IHDR data byte 12 (interlace method)
    rows = [
        (1, "image", bytearray(truncated), "image/png"),
        (2, "image", bytearray(interlaced), "image/png"),
        (3, "image", bytearray(_PNG_MAGIC + b"\x00" * 16), "image/png"),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_features(df).collect()}
    assert out[1]["decoder"] == "stub"
    assert out[3]["decoder"] == "stub"
    assert out[2]["decoder"] == "png" and out[2]["width"] == 4
    assert out[2]["luma_mean"] is None  # Adam7 pixel decode refused
