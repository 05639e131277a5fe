"""Streaming seasonal anomaly detection — the E79 baseline AT INGEST.

Deployment shape (the cusum_stream/streaming-trend pattern): the
per-(key, phase) mean/σ profile is computed OFFLINE
(:func:`~intervalaverage_spark.operators.analytics.seasonal_profile`,
keys × buckets rows — the nightly artifact) and the stream is a
STATELESS map against it: phase arithmetic, one stream-static equi
join (Catalyst broadcasts the tiny profile), and the decimal flag
compare. No state store, no watermark, no custom operator — of the
streaming members this is the cheapest possible: restart-safe by
construction because there is nothing to restore.

Contract difference from the batch detector, stated precisely: the
batch operator collapses duplicate (key, ts) observations to their
decimal mean BEFORE testing; a stream cannot collapse across
micro-batches, so THIS operator tests every arriving observation row
individually — "observation-level detection", which is what a live
alert wants anyway (two simultaneous spikes are two alerts, not one
averaged non-event). The driver oracle replays exactly that
observation-level semantics over the same rows, so an availableNow
replay equals the oracle row-for-row; equality against the batch
RUN of this same function is pinned in tests (the function is pure
expressions + a static join, so it runs identically on batch input).

Keys absent from the profile (or with σ NULL — single-point phases)
emit nothing: the monitored-key contract shared by every
calibrate-offline member.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intervalaverage_spark.validation import IntervalDataError, IntervalSchemaError


def streaming_seasonal_anomalies(
    stream_df: DataFrame,
    profile_df: DataFrame,
    ts_col: str,
    value_col: str,
    group_vars: Sequence[str],
    period: int = 86400,
    buckets: int = 24,
    k: float = 3.0,
) -> DataFrame:
    """Flag observations deviating > ``k``·σ from their phase bucket's
    offline baseline. ``profile_df`` must carry ``(*group_vars, phase,
    mean_v, sd_v)`` (:func:`seasonal_profile`'s schema; ``n_obs`` is
    ignored if present). Output: ``(*group_vars, ts_col, phase, x,
    mean_v, sd_v, rz)`` per anomalous OBSERVATION (see module
    docstring for the observation-level contract). Works identically
    on a batch ``stream_df`` — pure expressions + one static join."""
    if buckets < 1 or period < 1 or period % buckets != 0:
        raise IntervalDataError(
            "streaming_seasonal_anomalies: need period >= buckets >= 1 "
            f"with period % buckets == 0, got period={period} "
            f"buckets={buckets}")
    if not (k == k) or k < 0:
        raise IntervalDataError(
            f"streaming_seasonal_anomalies: k must be >= 0, got {k}")
    g = list(group_vars)
    if not g:
        raise IntervalSchemaError(
            "streaming_seasonal_anomalies: group_vars must be non-empty")
    for c in (ts_col, value_col, *g):
        if c not in stream_df.columns:
            raise IntervalSchemaError(
                f"streaming_seasonal_anomalies: missing column {c!r}")
    for c in (*g, "phase", "mean_v", "sd_v"):
        if c not in profile_df.columns:
            raise IntervalSchemaError(
                "streaming_seasonal_anomalies: profile missing column "
                f"{c!r}")
    width = period // buckets
    t = F.col(ts_col).cast("timestamp").cast("long")
    obs = stream_df.where(F.col(value_col).isNotNull()).select(
        *g,
        ts_col,
        (F.pmod(t, F.lit(period)) / F.lit(width)).cast("long").alias("phase"),
        F.round(F.col(value_col).cast("double"), 6)
        .cast("decimal(18,6)").alias("x"),
    )
    prof = profile_df.select(*g, "phase", "mean_v", "sd_v")
    kd = F.lit(round(float(k), 6)).cast("decimal(18,6)")
    md = F.col("mean_v").cast("decimal(18,6)")
    sd = F.col("sd_v").cast("decimal(18,6)")
    dev = F.abs(F.col("x") - md)
    rz = F.when(
        sd > 0,
        (F.col("x") - md).cast("double") / sd.cast("double"),
    )
    return (
        obs.join(prof, [*g, "phase"])
        .where(F.when(sd.isNull(), F.lit(False)).otherwise(dev > kd * sd))
        .select(
            *g, ts_col, "phase",
            F.col("x").cast("double").alias("x"),
            "mean_v", "sd_v",
            (F.round(rz, 6) + F.lit(0.0)).alias("rz"),
        )
    )
