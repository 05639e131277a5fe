"""Gap-based sessionization — the crawl-burst / user-session operator.

The dual of the engine's maxgap statistic: where ``interval_average``
reports the longest uncovered run inside a window, sessionization
materializes the covered runs themselves — consecutive observations per
key whose gaps stay ≤ ``gap`` become one session (gaps-and-islands).

Plan: one window per key (lag + running sum of session-break flags) and,
for bounds, one aggregate sharing the SAME (key) partitioning — Catalyst
plans a single exchange for both. All codegen, no join, no UDF. The
``bucket_width`` caveat of operators/asof.py does not apply: a session
is defined by consecutive rows, so the window cannot be time-sliced
without a carry pass; hot-key mitigation is the key model itself
(url-granularity keys are ~uniform after hashing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.validation import IntervalSchemaError


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: int,
    group_vars: Sequence[str],
    out_col: str = "session_id",
) -> DataFrame:
    """Append a 1-based ``session_id`` per key: a new session starts at
    the first row and whenever ``t - previous t > gap``. Rows with equal
    timestamps share a session (distance 0 ≤ gap)."""
    group_vars = list(group_vars)
    for c in (ts_col, *group_vars):
        if c not in df.columns:
            raise IntervalSchemaError(f"missing column {c!r}")
    if out_col in df.columns:
        raise IntervalSchemaError(f"output column {out_col!r} already exists")
    if gap < 0:
        raise IntervalSchemaError(f"gap must be >= 0, got {gap}")
    t = F.col(ts_col).cast("long")
    w = Window.partitionBy(*group_vars).orderBy(t)
    prev = F.lag(t).over(w)
    brk = F.when(prev.isNull() | ((t - prev) > gap), 1).otherwise(0)
    run = (
        Window.partitionBy(*group_vars)
        .orderBy(t)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select("*", F.sum(brk).over(run).alias(out_col))


def session_bounds(
    df: DataFrame,
    ts_col: str,
    gap: int,
    group_vars: Sequence[str],
    value_col: str | None = None,
) -> DataFrame:
    """One row per session: start/end timestamps, event count, duration
    (closed-interval semantics: ``end - start + 1`` time units, matching
    the engine's interval length convention), and optionally the sum of
    ``value_col``. The groupBy reuses the window's (key) partitioning —
    still a single exchange."""
    s = sessionize(df, ts_col, gap, group_vars)
    aggs = [
        F.min(F.col(ts_col).cast("long")).alias("session_start"),
        F.max(F.col(ts_col).cast("long")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        if value_col not in df.columns:
            raise IntervalSchemaError(f"missing column {value_col!r}")
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    out = s.groupBy(*group_vars, "session_id").agg(*aggs)
    return out.withColumn(
        "duration", F.col("session_end") - F.col("session_start") + 1
    )
