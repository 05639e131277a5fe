"""Streaming CUSUM: per-key drift alarms at ingest, exact-equal to the
batch detector.

The batch operator (operators/changepoint.py) rewrites Page's
max-reset recurrence as prefix-sum-minus-running-min over the FULL
history; a stream cannot window over history it hasn't kept, but the
recurrence itself needs only the pair ``(s+, s-)`` per key — the
textbook case for ``applyInPandasWithState``. Within a micro-batch the
recurrence is vectorized with the carry-in generalisation of the batch
identity:

    s_i = max(carry + P_i,  P_i - min_{1<=r<=i} P_r)

(one cumsum + one cummin per side; the second operand covers every
reset inside the batch, the first the no-reset-yet path; both are
monotone in the carry, so state is exactly two numbers per key).

Exactness: the batch path accumulates in DECIMAL(18,6). Floats in
pandas would drift from it, so the stream carries INTEGER MICRO-UNITS
end-to-end — ``x``, ``mu``, ``kappa``, ``h`` are converted to 10^-6
grid integers by EXACT decimal arithmetic in Spark expressions before
the stateful operator, the pandas recurrence is pure int64, and the
emitted statistics divide by 10^6 once (a correctly-rounded quotient,
bit-identical to the batch decimal→double cast). A bounded
availableNow replay therefore equals the batch operator row-for-row —
the driver oracle is the SAME SQL as the batch CUSUM row.

Calibration (``mu``/``kappa``/``h``) is SUPPLIED as a static
DataFrame — the deployment shape: calibrate offline on history, then
monitor the stream against that calibration; keys without calibration
are ignored. State: two longs per key, however long the stream runs.

Ordering: within a micro-batch a key's rows are sorted (ts, x) — the
batch window's total order; ACROSS micro-batches correctness assumes
event-time-ordered arrival per key, the same documented boundary as
every stateful operator here (streaming/churn_stream.py) — the batch
detector is the reconciliation path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from intervalaverage_spark.validation import IntervalSchemaError

_DEC = "decimal(18,6)"
_MICRO = 1_000_000

_OUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("ts", TimestampType()),
    StructField("x", DoubleType()),
    StructField("s_pos", DoubleType()),
    StructField("s_neg", DoubleType()),
    StructField("h", DoubleType()),
    StructField("alarm", BooleanType()),
])

#: keyed state: the two CUSUM statistics in integer micro-units
_STATE_SCHEMA = StructType([
    StructField("sp", LongType()),
    StructField("sn", LongType()),
])


def _carry_scan(d: np.ndarray, carry: int) -> np.ndarray:
    """Vectorized max-reset recurrence with carry-in (int64 exact)."""
    p = np.cumsum(d)
    return np.maximum(carry + p, p - np.minimum.accumulate(p))


def _cusum_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    sp, sn = (state.get if state.exists else (0, 0))
    out = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "xi"], kind="mergesort")
        xi = pdf["xi"].to_numpy(np.int64)
        mu = pdf["mui"].to_numpy(np.int64)
        ka = pdf["ki"].to_numpy(np.int64)
        hi = pdf["hi"].to_numpy(np.int64)
        spv = _carry_scan(xi - mu - ka, sp)
        snv = _carry_scan(mu - ka - xi, sn)
        sp, sn = int(spv[-1]), int(snv[-1])
        alarm = (spv > hi) | (snv > hi)
        if alarm.any():
            out.append(pd.DataFrame({
                "key": pdf["key"].to_numpy()[alarm],
                "ts": pdf["ts"].to_numpy()[alarm],
                "x": xi[alarm] / _MICRO,
                "s_pos": spv[alarm] / _MICRO,
                "s_neg": snv[alarm] / _MICRO,
                "h": hi[alarm] / _MICRO,
                "alarm": True,
            }))
    state.update((sp, sn))
    if out:
        yield pd.concat(out)


def streaming_cusum(
    src: DataFrame,
    calibration: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sided CUSUM alarms over a STREAMING DataFrame.

    ``calibration`` must be a static DataFrame with columns
    ``(key_col, mu, kappa, h)`` — ``mu``/``kappa``/``h`` numeric, 6-dp
    quantities (e.g. the batch calibration aggregate of
    :func:`intervalaverage_spark.operators.changepoint.cusum`).
    Returns the streaming DataFrame of ALARM rows ``(key, ts, x,
    s_pos, s_neg, h, alarm)`` — append mode; state is two longs per
    key. NULL values are dropped; keys missing from the calibration
    are ignored (inner join).
    """
    if calibration.isStreaming:
        raise IntervalSchemaError(
            "streaming_cusum: calibration must be a static DataFrame"
        )
    for c in ("mu", "kappa", "h"):
        if c not in calibration.columns:
            raise IntervalSchemaError(
                f"streaming_cusum: calibration missing column {c!r}"
            )

    def micro(col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        # exact: 6-dp decimal × 10^6 is an integer by construction
        return (c.cast("double").cast(_DEC) * _MICRO).cast("long")

    cal = calibration.select(
        F.col(key_col).cast("string").alias("key"),
        micro("mu").alias("mui"),
        micro("kappa").alias("ki"),
        micro("h").alias("hi"),
    )
    keyed = (
        src.where(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).cast("timestamp").alias("ts"),
            micro(F.round(F.col(value_col).cast("double"), 6)).alias("xi"),
        )
        .join(cal, "key")
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _cusum_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
