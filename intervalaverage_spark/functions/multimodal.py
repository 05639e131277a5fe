"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payloads with typed metadata — the only
sane representation at 100 TB (media bytes never enter the JVM row format
uncompressed; Arrow batches carry them to Python workers in bounded
chunks). The Spark-side plumbing — schema, partitioning, ``mapInPandas``
batch shape — is real and tested; the actual codec step is STUBBED: the
image/audio libraries are not in this container, so ``decode_media``
raises ``NotImplementedError`` for real decoding unless
``fake='deterministic'`` (the default here), which derives features from
the payload bytes alone (length, rolling checksum, head/tail bytes) —
deterministic, engine-portable, and enough to exercise the full pipeline.

Batch sizing: ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds rows
per Arrow batch; for media also bound BYTES per batch by pre-bucketing
rows with :func:`size_buckets` and repartitioning on the bucket — the
pattern that keeps a 4 GB video from OOMing a worker that just handled a
thousand 10 kB thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def _fake_features(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding/feature extractor: dims
    byte-histogram moments of the payload. Pure arithmetic — the DuckDB
    oracle can reproduce n_bytes/checksum/head; `feat` is rows-only."""
    n = len(payload)
    if n == 0:
        return [0.0] * dims
    out = []
    for d in range(dims):
        s = 0
        for i in range(d, min(n, 256), dims):
            s += payload[i]
        out.append(float(s % 997) / 997.0)
    return out


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    fake: str | None = "deterministic",
    feat_dims: int = 8,
) -> DataFrame:
    """Decode/feature-extract media payloads via ``mapInPandas``.

    ``fake='deterministic'`` → byte-derived features (no codec libs).
    ``fake=None`` → real decode; raises ``NotImplementedError`` unless the
    codec libraries are importable (they are not in this container).
    """
    if fake is None and not _HAVE_PIL:
        raise NotImplementedError(
            "real media decoding needs PIL/av/soundfile — not available in "
            "this container; use fake='deterministic' for the pipeline path"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes, checksum, head, feats = [], [], [], []
            for raw in payloads:
                b = bytes(raw) if raw is not None else b""
                n_bytes.append(len(b))
                # rolling polynomial checksum over the first 1 KiB — cheap,
                # deterministic, SQL-replicable
                c = 0
                for by in b[:1024]:
                    c = (c * 31 + by) % (1 << 31)
                checksum.append(c)
                head.append(b[:8].hex())
                feats.append(_fake_features(b, feat_dims))
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


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes (payload, target dims) through the same
    batch machinery; the pixel work is NotImplemented without codec libs."""
    raise NotImplementedError(
        "resize needs an image codec (PIL) — not in this container. The "
        "decode_media(fake='deterministic') path exercises the identical "
        "mapInPandas plumbing (schema, batching, partitioning)."
    )


def frame_sample_stub(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling plumbing stub — see :func:`resize_stub`."""
    raise NotImplementedError(
        "frame sampling needs a video codec (av) — not in this container."
    )
