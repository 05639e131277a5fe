"""Streaming sessionization: native event-time session windows.

The streaming twin of operators/sessions.py. Spark's ``session_window``
is the engine's native merging-window state machine — windows extend
``gap`` past each event and merge on overlap, state is bounded by the
watermark, sessions emit (append mode) once the watermark passes their
close. No ``applyInPandasWithState`` needed: the built-in operator IS
the custom-stateful-session implementation, with JVM state store,
exactly-once sinks and watermark GC for free — a second hand-rolled
state machine could only drift from it.

Boundary semantics: ``session_window(ts, gap)`` merges two events iff
their gap is STRICTLY less than ``gap``; the batch operator merges on
``<= gap``. Batch ``sessionize(df, t, gap-1)`` therefore equals
streaming ``stream_sessions(…, gap)`` — cross-validated in
tests/test_streaming_sessions.py (and the batch operators against each
other in tests/test_coalesce.py).

Emission caveat (inherent to event-time streaming, not this code): a
session emits only once the watermark passes ``session_end + gap``. On a
finite ``availableNow`` replay the final watermark is the max event time
seen, so each key's LAST session is still open at shutdown and stays in
the state store for the next trigger — batch-vs-stream comparisons must
either bound event time (a later event elsewhere advances the global
watermark) or compare on the sealed prefix. Production streams never
"end", so this is a test-harness concern only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessions(
    events: DataFrame,
    gap_seconds: int,
    group_vars: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    value_col: str | None = None,
    delay: str = "0 seconds",
) -> DataFrame:
    """events (streaming DF) → streaming per-key session aggregates.

    Output: group_vars…, session_start/session_end (epoch seconds of the
    first/last EVENT — the window's trailing ``gap`` padding is trimmed
    off via max(ts)), n_events, and sum_<value_col> if given. Append-mode
    compatible (watermarked); caller picks the sink."""
    gv = list(group_vars)
    src = events.withWatermark(ts_col, delay)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.max(ts_col).alias("__t_last"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    out = (
        src.groupBy(*gv, F.session_window(ts_col, f"{gap_seconds} seconds").alias("w"))
        .agg(*aggs)
    )
    cols = [
        *gv,
        F.unix_timestamp("w.start").alias("session_start"),
        F.unix_timestamp("__t_last").alias("session_end"),
        "n_events",
    ]
    if value_col is not None:
        cols.append(f"sum_{value_col}")
    return out.select(*cols)
