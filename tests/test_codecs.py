"""Real stdlib codecs (operators/codecs.py) and their Spark wiring."""

from __future__ import annotations

import math
import struct
import wave
import zlib
from io import BytesIO

import numpy as np
import pytest

from ig_etl_sync_spark.operators import codecs
from ig_etl_sync_spark.operators.multimodal import StdlibCodecBackend, audio_features


def gradient_png(w=8, h=4, channels=3):
    pix = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                pix.append((x * 30 + y * 10 + c * 5) % 256)
    return codecs.png_encode(w, h, channels, bytes(pix)), bytes(pix)


def sine_wav(rate=8000, seconds=1.0, freq=440.0, amp=0.5):
    n = int(rate * seconds)
    buf = BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        samples = (
            (amp * 32767 * np.sin(2 * np.pi * freq * np.arange(n) / rate))
            .astype("<i2")
            .tobytes()
        )
        wv.writeframes(samples)
    return buf.getvalue(), n


def test_png_roundtrip_exact():
    payload, pix = gradient_png()
    w, h, c, decoded = codecs.png_decode(payload)
    assert (w, h, c) == (8, 4, 3)
    assert decoded == pix  # bit-exact decode of our own encode


def test_png_all_filters_decode():
    """Decode a PNG whose rows use filters 0-4 — built by hand so every
    unfilter branch runs. Reference pixels computed by inverting each
    filter independently."""
    w, h, c = 4, 5, 1
    rows = [bytes([10, 20, 30, 40]),    # row content AFTER unfiltering
            bytes([15, 25, 35, 45]),
            bytes([20, 30, 40, 50]),
            bytes([25, 35, 45, 55]),
            bytes([30, 40, 50, 60])]
    # re-filter them with filters 0..4 (the encoder side of the spec)
    filtered = bytearray()
    prev = bytes(w * c)
    for y, (f, row) in enumerate(zip([0, 1, 2, 3, 4], rows)):
        filtered.append(f)
        for i in range(w * c):
            a = row[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if f == 0:
                v = row[i]
            elif f == 1:
                v = (row[i] - a) & 0xFF
            elif f == 2:
                v = (row[i] - b) & 0xFF
            elif f == 3:
                v = (row[i] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = (row[i] - pred) & 0xFF
            filtered.append(v)
        prev = row

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    payload = (codecs.PNG_MAGIC
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(filtered)))
               + chunk(b"IEND", b""))
    got = codecs.png_decode(payload)
    assert got == (w, h, c, b"".join(rows))


def test_png_resize_nearest():
    payload, pix = gradient_png(8, 4, 3)
    small = codecs.png_resize_nearest(payload, 4, 2)
    w, h, c, dec = codecs.png_decode(small)
    assert (w, h, c) == (4, 2, 3)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(4, 8, 3)
    expect = arr[[0, 2]][:, [0, 2, 4, 6]]
    assert dec == expect.tobytes()


def test_png_rejects_non_png_and_exotic():
    with pytest.raises(NotImplementedError, match="not a PNG"):
        codecs.png_decode(b"JFIF....")
    # 16-bit depth PNG → explicit unsupported, not garbage
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
    payload = (codecs.PNG_MAGIC
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
               + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="bitdepth=16"):
        codecs.png_decode(payload)


def test_wav_decode_sine():
    payload, n = sine_wav(rate=8000, seconds=1.0, freq=440.0, amp=0.5)
    got = codecs.wav_decode(payload)
    assert got["sample_rate"] == 8000
    assert got["n_channels"] == 1
    assert got["n_frames"] == n
    assert got["duration_sec"] == pytest.approx(1.0)
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert got["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert got["peak"] == pytest.approx(0.5, rel=1e-3)


def test_spark_decode_and_audio_features(spark):
    png, pix = gradient_png()
    wav, _ = sine_wav()
    from ig_etl_sync_spark.operators.multimodal import decode_features

    imgs = spark.createDataFrame([(1, bytearray(png))], "media_id long, payload binary")
    feats = decode_features(imgs, backend=StdlibCodecBackend()).collect()
    arr = np.frombuffer(pix, dtype=np.uint8)
    assert feats[0]["mean_pixel"] == pytest.approx(float(arr.mean()) / 255.0)

    auds = spark.createDataFrame([(2, bytearray(wav))], "media_id long, payload binary")
    rows = audio_features(auds).collect()
    assert rows[0]["sample_rate"] == 8000
    assert rows[0]["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)


def test_spark_resize_real_png(spark):
    from ig_etl_sync_spark.operators.multimodal import resize_images

    png, _ = gradient_png()
    df = spark.createDataFrame([(1, bytearray(png))], "media_id long, payload binary")
    out = resize_images(df, 4, 2, backend=StdlibCodecBackend()).collect()
    w, h, c, _pix = codecs.png_decode(bytes(out[0]["payload"]))
    assert (w, h) == (4, 2)
