"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payloads with typed metadata — the only
sane representation at 100 TB (media bytes never enter the JVM row format
uncompressed; Arrow batches carry them to Python workers in bounded
chunks). The Spark-side plumbing — schema, partitioning, ``mapInPandas``
batch shape — is real and tested. The codec step has two real formats and
honest stubs for the rest: ``kind in {audio/wav, image/bmp}`` decodes to
actual sample/pixel arrays with the pure-numpy codecs in
functions/codecs.py (no media libs in this container); other kinds under
``fake=None`` raise ``NotImplementedError`` unless PIL is importable.
``fake='deterministic'`` (the default) derives features from the payload
bytes alone (length, rolling checksum, head bytes) — deterministic,
engine-portable, and what the SQL-oracled driver query uses.

Batch sizing: ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds rows
per Arrow batch; for media also bound BYTES per batch by pre-bucketing
rows with :func:`size_buckets` and repartitioning on the bucket — the
pattern that keeps a 4 GB video from OOMing a worker that just handled a
thousand 10 kB thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "id long, kind string, payload binary, meta map<string,string>"

#: decoded-feature schema appended by decode_media
FEATURE_SCHEMA = (
    "id long, kind string, n_bytes long, checksum long, head string, "
    "feat array<double>"
)

_HAVE_PIL = False
try:  # pragma: no cover — not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    pass


def size_buckets(df: DataFrame, payload_col: str = "payload", bucket_bytes: int = 4 << 20) -> DataFrame:
    """Append ``size_bucket`` = floor(octet_length/bucket_bytes); repartition
    on it before ``mapInPandas`` so each Arrow batch holds similar-sized
    payloads (bounded worker memory)."""
    return df.withColumn(
        "size_bucket", F.floor(F.octet_length(payload_col) / F.lit(bucket_bytes)).cast("long")
    )


#: 31^k mod 2^31 for k = 0..1023 — precomputed powers for the vectorized
#: rolling checksum (products ≤ 255·2^31 < 2^39 and 1024-term sums < 2^49,
#: both exact in uint64)
_POW31 = np.empty(1024, dtype=np.uint64)
_POW31[0] = 1
for _k in range(1, 1024):
    _POW31[_k] = (_POW31[_k - 1] * np.uint64(31)) % np.uint64(1 << 31)


def _checksum(b: bytes) -> int:
    """Rolling polynomial checksum over the first 1 KiB — numpy-vectorized
    Horner expansion: c = Σ b[i]·31^(m−1−i) mod 2^31 (identical to the
    sequential ``c = c*31 + byte`` fold)."""
    arr = np.frombuffer(b[:1024], dtype=np.uint8).astype(np.uint64)
    m = len(arr)
    if m == 0:
        return 0
    return int((arr * _POW31[m - 1 :: -1]).sum() % np.uint64(1 << 31))


def _fake_features(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding/feature extractor: dims
    byte-histogram moments of the payload, numpy-vectorized (bincount over
    index-mod-dims strides of the first 256 bytes). Pure arithmetic — the
    DuckDB oracle can reproduce n_bytes/checksum/head; `feat` is
    rows-only."""
    n = len(payload)
    if n == 0:
        return [0.0] * dims
    arr = np.frombuffer(payload[:256], dtype=np.uint8)
    sums = np.bincount(
        np.arange(len(arr)) % dims, weights=arr, minlength=dims
    )  # ≤ 256·255: exact in float64
    return [float(int(s) % 997) / 997.0 for s in sums]


def _real_features(kind: str, payload: bytes, dims: int = 8) -> list[float]:
    """REAL decode for the numpy-implementable formats (codecs.py):
    sample/pixel statistics, zero-padded to ``dims``. Other kinds raise
    NotImplementedError (PIL/av not in this container)."""
    from intervalaverage_spark.functions import codecs

    if kind == "audio/wav":
        rate, n_ch, x = codecs.decode_wav(payload)
        flat = x.ravel()
        feat = [
            float(rate), float(n_ch), float(x.shape[0]),
            float(flat.mean()) if flat.size else 0.0,
            float(np.sqrt((flat * flat).mean())) if flat.size else 0.0,
            float(np.abs(flat).max()) if flat.size else 0.0,
        ]
    elif kind == "image/bmp":
        px = codecs.decode_bmp(payload)
        feat = [
            float(px.shape[1]), float(px.shape[0]), 3.0,
            float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()),
        ]
    elif _HAVE_PIL:  # pragma: no cover — PIL absent in this container
        raise NotImplementedError("PIL decode path not wired")
    else:
        raise NotImplementedError(
            f"real decoding for kind={kind!r} needs PIL/av/soundfile — not "
            "in this container; audio/wav and image/bmp decode natively "
            "(functions/codecs.py), or use fake='deterministic'"
        )
    return (feat + [0.0] * dims)[:dims]


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    fake: str | None = "deterministic",
    feat_dims: int = 8,
) -> DataFrame:
    """Decode/feature-extract media payloads via ``mapInPandas``.

    ``fake='deterministic'`` → byte-derived features (no codec needed).
    ``fake=None`` → real decode: audio/wav and image/bmp via the
    pure-numpy codecs; anything else raises ``NotImplementedError``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes, checksum, head, feats = [], [], [], []
            for raw, kind in zip(payloads, pdf["kind"]):
                b = bytes(raw) if raw is not None else b""
                n_bytes.append(len(b))
                checksum.append(_checksum(b))
                head.append(b[:8].hex())
                if fake == "deterministic":
                    feats.append(_fake_features(b, feat_dims))
                else:
                    feats.append(_real_features(kind, b, feat_dims))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    "head": head,
                    "feat": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "id long, kind string, payload binary, width int, height int"
SAMPLED_SCHEMA = "id long, kind string, payload binary, n_frames long, sample_rate int"


def resize_media(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL image resize for ``kind='image/bmp'`` payloads: decode with the
    pure-numpy codec, nearest-neighbor index remap, re-encode — all inside
    one Arrow-batched ``mapInPandas`` (pair with :func:`size_buckets` +
    a repartition on ``size_bucket`` to bound worker memory). Other kinds
    raise NotImplementedError in the worker (PIL absent in container)."""
    import numpy as np  # noqa: F811 — worker-side import

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from intervalaverage_spark.functions import codecs

        for pdf in batches:
            out_payload = []
            for raw, kind in zip(pdf[payload_col], pdf["kind"]):
                if kind != "image/bmp":
                    raise NotImplementedError(
                        f"resize for kind={kind!r} needs PIL — only image/bmp "
                        "resizes natively in this container"
                    )
                px = codecs.decode_bmp(bytes(raw))
                h0, w0 = px.shape[:2]
                yi = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                xi = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                out_payload.append(codecs.encode_bmp(px[yi][:, xi]))
            yield pd.DataFrame(
                {"id": pdf["id"], "kind": pdf["kind"], "payload": out_payload,
                 "width": width, "height": height}
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_media(
    df: DataFrame, every_n: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL frame sampling for ``kind='audio/wav'``: keep every Nth frame
    (all channels), re-encode at rate/N — the audio analog of video frame
    sampling, through the same mapInPandas plumbing. Video kinds raise
    honestly (no container codec here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from intervalaverage_spark.functions import codecs

        for pdf in batches:
            payloads, frames, rates = [], [], []
            for raw, kind in zip(pdf[payload_col], pdf["kind"]):
                if kind != "audio/wav":
                    raise NotImplementedError(
                        f"frame sampling for kind={kind!r} needs a video codec "
                        "(av) — only audio/wav samples natively in this container"
                    )
                rate, _n_ch, x = codecs.decode_wav(bytes(raw))
                kept = x[::every_n]
                new_rate = max(rate // every_n, 1)
                payloads.append(codecs.encode_wav(kept, new_rate))
                frames.append(len(kept))
                rates.append(new_rate)
            yield pd.DataFrame(
                {"id": pdf["id"], "kind": pdf["kind"], "payload": payloads,
                 "n_frames": frames, "sample_rate": rates}
            )

    return df.mapInPandas(run, schema=SAMPLED_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Kept for the general-image case: resize beyond BMP needs PIL —
    :func:`resize_media` is the real path for the natively-decodable
    format."""
    raise NotImplementedError(
        "resize needs an image codec (PIL) for non-BMP kinds — use "
        "resize_media for image/bmp payloads (pure-numpy, real pixels)."
    )


def frame_sample_stub(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling stub — see :func:`frame_sample_media` for the
    real audio-frame path."""
    raise NotImplementedError(
        "frame sampling needs a video codec (av) — not in this container."
    )
