"""Pure-numpy WAV/BMP codecs + the real-decode branch of decode_media."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)
from intervalaverage_spark.functions.multimodal import decode_media


def test_wav_roundtrip_and_stdlib_cross_validation():
    rng = np.random.default_rng(0)
    x = np.clip(rng.normal(0, 0.2, (1000, 2)), -0.999, 0.999)
    blob = encode_wav(x, rate=16000)

    # our decoder
    rate, n_ch, y = decode_wav(blob)
    assert (rate, n_ch) == (16000, 2) and y.shape == (1000, 2)
    assert np.max(np.abs(y - x)) <= 1.0 / 32768.0  # 16-bit quantization

    # stdlib `wave` agrees on every header field and every frame byte
    with wave.open(io.BytesIO(blob)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (16000, 2, 2)
        frames = np.frombuffer(w.readframes(w.getnframes()), "<i2").reshape(-1, 2)
    assert np.array_equal(frames / 32768.0, y)


def test_wav_ignores_extra_chunks_and_rejects_garbage():
    x = np.linspace(-0.5, 0.5, 64)
    blob = encode_wav(x, rate=8000)
    # splice a LIST chunk between fmt and data (odd size → word alignment)
    fmt_end = 12 + 8 + 16
    spliced = blob[:fmt_end] + b"LIST" + (5).to_bytes(4, "little") + b"INFOX\x00" + blob[fmt_end:]
    rate, n_ch, y = decode_wav(spliced)
    assert rate == 8000 and y.shape == (64, 1)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE" + bytes(64))


def test_bmp_roundtrip_padding_and_orientation():
    rng = np.random.default_rng(1)
    for w in (1, 2, 3, 5):  # strides 4, 8, 12, 16 — padding paths
        px = rng.integers(0, 256, (4, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px), f"w={w}"
    with pytest.raises(ValueError):
        decode_bmp(b"notabmp")


def test_resize_and_frame_sample_real_paths(spark):
    from intervalaverage_spark.functions.multimodal import (
        frame_sample_media,
        resize_media,
    )

    # 4x6 image with a distinct quadrant pattern → 2x3 nearest-neighbor
    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:2, :3] = 10
    px[:2, 3:] = 20
    px[2:, :3] = 30
    px[2:, 3:] = 40
    img = spark.createDataFrame(
        [(1, "image/bmp", bytearray(encode_bmp(px)), {})],
        "id long, kind string, payload binary, meta map<string,string>",
    )
    r = resize_media(img, width=3, height=2).first()
    assert (r["width"], r["height"]) == (3, 2)
    small = decode_bmp(bytes(r["payload"]))
    assert small.shape == (2, 3, 3)
    assert small[0, 0, 0] == 10 and small[1, 2, 0] == 40

    x = np.linspace(-0.9, 0.9, 100)
    wav = spark.createDataFrame(
        [(2, "audio/wav", bytearray(encode_wav(x, 8000)), {})],
        "id long, kind string, payload binary, meta map<string,string>",
    )
    s = frame_sample_media(wav, every_n=4).first()
    assert (s["n_frames"], s["sample_rate"]) == (25, 2000)
    rate, ch, y = decode_wav(bytes(s["payload"]))
    assert rate == 2000 and y.shape == (25, 1)
    assert np.max(np.abs(y[:, 0] - x[::4])) <= 2.0 / 32768.0

    # wrong kinds raise through the worker
    with pytest.raises(Exception, match="NotImplementedError|needs"):
        resize_media(wav, 2, 2).collect()
    with pytest.raises(Exception, match="NotImplementedError|needs"):
        frame_sample_media(img, 2).collect()


def test_decode_media_real_branch(spark):
    wav = encode_wav(np.full(100, 0.25), rate=44100)
    bmp = encode_bmp(np.full((2, 3, 3), [10, 20, 30], dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, "audio/wav", bytearray(wav), {}), (2, "image/bmp", bytearray(bmp), {})],
        "id long, kind string, payload binary, meta map<string,string>",
    )
    rows = {r["id"]: r for r in decode_media(df, fake=None).collect()}
    wf = rows[1]["feat"]
    assert wf[:3] == [44100.0, 1.0, 100.0]
    assert abs(wf[3] - 0.25) < 1e-3 and abs(wf[4] - 0.25) < 1e-3
    bf = rows[2]["feat"]
    assert bf[:3] == [3.0, 2.0, 3.0]
    assert [round(v) for v in bf[3:6]] == [10, 20, 30]
    # unsupported kind raises honestly through the executor
    bad = spark.createDataFrame(
        [(3, "video/mp4", bytearray(b"xx"), {})],
        "id long, kind string, payload binary, meta map<string,string>",
    )
    with pytest.raises(Exception, match="NotImplementedError|real decoding"):
        decode_media(bad, fake=None).collect()
