"""Pure-numpy media codecs: RIFF/WAVE PCM audio + BI_RGB BMP images.

The container has no media libraries (PIL/av/soundfile), but these two
formats are simple enough to decode with numpy alone from their public
specifications (RIFF/WAVE chunk layout; Windows BITMAPINFOHEADER). They
make :func:`intervalaverage_spark.functions.multimodal.decode_media`'s
REAL-decode branch executable — actual sample/pixel arrays flow through
the mapInPandas plumbing — instead of every real codec being a
NotImplementedError stub. Formats beyond these still raise honestly.

Encoders exist so tests can synthesize payloads; the WAV path is
cross-validated against the stdlib ``wave`` module.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------- WAV

def decode_wav(buf: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE → (sample_rate, n_channels, float64 samples [n, ch]).

    Supports PCM 8/16-bit and IEEE-float32; samples normalized to
    [-1, 1). Chunk walk honors word alignment and ignores unknown chunks
    (LIST/fact/etc.)."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _brate, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if n_ch < 1:
        raise ValueError("WAV with zero channels")
    if audio_fmt == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        arr = (np.frombuffer(data, dtype="u1").astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 3 and bits == 32:
        arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV encoding (fmt={audio_fmt}, bits={bits})")
    n = (len(arr) // n_ch) * n_ch
    return int(rate), int(n_ch), arr[:n].reshape(-1, n_ch)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1) (shape [n] or [n, ch]) → 16-bit PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------------- BMP

def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → uint8 RGB array [h, w, 3].
    Handles bottom-up (positive height) and top-down (negative) layouts
    and the 4-byte row padding."""
    if len(buf) < 54 or buf[0:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(buf[10:14], "little")
    hdr_size = int.from_bytes(buf[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BMP core headers unsupported (need BITMAPINFOHEADER)")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    raw = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8 RGB array [h, w, 3] → uncompressed 24-bit bottom-up BMP."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB→BGR
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + len(info)
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return head + info + data
