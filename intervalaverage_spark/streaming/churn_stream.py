"""Streaming delta storage: keyed last-fingerprint state over a crawl
stream.

The streaming twin of :func:`intervalaverage_spark.functions.churn
.snapshot_changes` + ``filter(is_changed)``: as snapshots of a key
arrive, emit only those whose payload fingerprint differs from the
key's PREVIOUS snapshot — unchanged re-crawls are dropped at ingest,
before they cost storage or a tier rollup.

This is the engine's first ``applyInPandasWithState`` operator — the
one semantics the built-in stateful operators cannot express:
``dropDuplicatesWithinWatermark`` dedups by VALUE (it would drop the
second A of A→B→A; delta storage must keep it, because A is a NEW
version after B), and windowed aggregation has no "compare to previous
row" notion across micro-batches. Custom keyed state is exactly one
fingerprint string per key:

* state size: O(distinct keys), 32 hex chars each — the minimal state
  any change detector can carry; no timeline, no buffer;
* within a micro-batch, a key's rows are sorted (ts, fingerprint) —
  the same total order as the batch operator — and scanned
  vectorized-per-group (Arrow batches in, one pandas sort + shift per
  key, no per-row Python in the hot loop);
* ACROSS micro-batches, correctness assumes event-time-ordered arrival
  per key (true for replay/backfill and for an ingest stream
  partitioned by fetch time). Out-of-order arrival ACROSS batches is
  the documented boundary — the batch operator is the reconciliation
  path, exactly like the streaming 1h tier hands off to the batch
  tiers (streaming/rollup_stream.py).

Determinism: emitted rows are a pure function of the per-key ordered
snapshot sequence, so an availableNow bounded replay equals the batch
operator row-for-row — pinned in tests/test_round7.py and by the
driver oracle (same SQL as the batch delta row).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: output rows: the kept (changed) snapshots
_OUT_SCHEMA = StructType([
    StructField("key", LongType()),
    StructField("ts", TimestampType()),
    StructField("fingerprint", StringType()),
])

#: keyed state: the last fingerprint seen (one 32-char string per key)
_STATE_SCHEMA = StructType([StructField("last_fp", StringType())])


def _delta_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_fp = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "fingerprint"], kind="mergesort")
        # vectorized run-head scan: a row survives if it differs from the
        # previous row in the sorted batch; the first row compares to the
        # fingerprint carried in state (None = no prior snapshot -> keep)
        prev = pdf["fingerprint"].shift(1)
        prev.iloc[0] = last_fp
        mask = prev.isnull() | (prev != pdf["fingerprint"])
        keep = pdf.loc[mask, ["key", "ts", "fingerprint"]]
        if len(keep) > 0:
            out.append(keep)
        last_fp = pdf["fingerprint"].iloc[-1]
    if last_fp is not None:
        state.update((last_fp,))
    if out:
        yield pd.concat(out)


def streaming_snapshot_deltas(
    src: DataFrame,
    key_col: str,
    ts_col: str,
    payload_col: str,
    watermark_delay: str = "1 day",
) -> DataFrame:
    """Changed-snapshot filter over a STREAMING DataFrame.

    ``src`` must be a streaming DataFrame with a long key, a timestamp,
    and a string payload. Returns the streaming DataFrame of kept rows
    ``(key, ts, fingerprint)`` — append mode; pair with any sink. The
    watermark bounds state-store eviction bookkeeping only (state here
    never grows past one fingerprint per key regardless).
    """
    keyed = (
        src.select(
            F.col(key_col).cast("long").alias("key"),
            # NTZ sources (plain parquet timestamps) cast to session-tz
            # TIMESTAMP: event-time watermarks reject TIMESTAMP_NTZ
            F.col(ts_col).cast("timestamp").alias("ts"),
            F.md5(F.col(payload_col).cast("string")).alias("fingerprint"),
        )
        .withWatermark("ts", watermark_delay)
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _delta_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
