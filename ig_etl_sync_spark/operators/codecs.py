"""Real media codecs implementable with the standard library: PNG
(zlib inflate + per-row unfilter, the public PNG spec) and WAV (RIFF
PCM via the ``wave`` module). No PIL/av/librosa needed.

These back :class:`multimodal.StdlibCodecBackend` — the proof that the
multimodal pipeline's codec seam carries REAL decodes, not only the
deterministic fake. Formats outside PNG/WAV still raise (the honest
seam for PIL/av in richer environments).

Scope (raises ``NotImplementedError`` beyond it): 8-bit-depth PNG,
color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA), no interlacing;
8/16-bit integer PCM WAV.
"""

from __future__ import annotations

import struct
import wave
import zlib
from io import BytesIO

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """PNG → (width, height, channels, raw interleaved 8-bit pixels).

    Implements the spec's decode path: chunk walk → IDAT concat → zlib
    inflate → per-row unfilter (None/Sub/Up/Average/Paeth).
    """
    if payload[:8] != PNG_MAGIC:
        raise NotImplementedError("not a PNG payload")
    pos = 8
    width = height = bitdepth = colortype = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise NotImplementedError("PNG without IHDR")
    if bitdepth != 8 or colortype not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG (bitdepth={bitdepth}, colortype={colortype}, "
            f"interlace={interlace}); full decoders (PIL) cover these"
        )
    channels = _CHANNELS[colortype]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")

    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return width, height, channels, bytes(out)


def png_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Raw interleaved 8-bit pixels → PNG (filter 0 rows)."""
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer length mismatch")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_resize_nearest(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor PNG resize: decode → index-map → re-encode."""
    import numpy as np

    w, h, c, pix = png_decode(payload)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)
    ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    resized = arr[ys][:, xs]
    return png_encode(new_w, new_h, c, resized.tobytes())


def wav_decode(payload: bytes) -> dict:
    """WAV → {sample_rate, n_channels, n_frames, duration_sec, rms,
    peak} with amplitudes normalized to [0, 1]."""
    import numpy as np

    with wave.open(BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n_ch = w.getnchannels()
        n_frames = w.getnframes()
        width = w.getsampwidth()
        frames = w.readframes(n_frames)
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype("float64") / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (np.frombuffer(frames, dtype="u1").astype("float64") - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM; use soundfile/librosa")
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_frames": n_frames,
        "duration_sec": n_frames / rate if rate else 0.0,
        "rms": float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
        "peak": float(np.max(np.abs(samples))) if len(samples) else 0.0,
    }
