"""Gap-based sessionization — the crawl-burst / user-session operator.

The dual of the engine's maxgap statistic: where ``interval_average``
reports the longest uncovered run inside a window, sessionization
materializes the covered runs themselves — consecutive observations per
key whose gaps stay ≤ ``gap`` become one session (gaps-and-islands).

Plan: one window per key (lag + running sum of session-break flags) and,
for bounds, one aggregate sharing the SAME (key) partitioning — Catalyst
plans a single exchange for both. All codegen, no join, no UDF.

Skew (``bucket_width``, round 4): a session is defined by consecutive
rows, so the window cannot be NAIVELY time-sliced — but cross-bucket
merging is itself a gaps-and-islands problem at BUCKET granularity:

1. sessionize within each ``(key, floor(t/width))`` bucket (hot key
   spreads across its time buckets);
2. per (key, bucket) summarize ``(min_t, max_t, n_sessions)`` — ONE row
   per bucket;
3. a bucket's first session continues the previous bucket's last session
   iff ``min_t − prev_max_t ≤ gap`` (exactly the flat break condition
   at the boundary row); a window over the tiny bucket table computes
   that flag plus the running global-id offset
   ``Σ (n_sessions − merged)`` over earlier buckets;
4. join the offsets back on (key, bucket):
   ``session_id = offset + local_id − merged``.

Identical output to the flat path (hypothesis-tested, including the
everything-merges ``gap ≥ width`` regime); two cheap exchanges + one
equi join, every heavy stage keyed by (key, bucket). Same bucket+carry
design as operators/asof.py / fill.py / analytics.rate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.plans.rangejoin import fdiv
from intervalaverage_spark.validation import IntervalSchemaError


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: int,
    group_vars: Sequence[str],
    out_col: str = "session_id",
    bucket_width: int | None = None,
) -> DataFrame:
    """Append a 1-based ``session_id`` per key: a new session starts at
    the first row and whenever ``t - previous t > gap``. Rows with equal
    timestamps share a session (distance 0 ≤ gap). ``bucket_width``
    selects the time-sliced hot-key path (module docstring) — identical
    ids, spread windows."""
    group_vars = list(group_vars)
    for c in (ts_col, *group_vars):
        if c not in df.columns:
            raise IntervalSchemaError(f"missing column {c!r}")
    if out_col in df.columns:
        raise IntervalSchemaError(f"output column {out_col!r} already exists")
    if gap < 0:
        raise IntervalSchemaError(f"gap must be >= 0, got {gap}")
    t = F.col(ts_col).cast("long")

    if bucket_width is None:
        w = Window.partitionBy(*group_vars).orderBy(t)
        prev = F.lag(t).over(w)
        brk = F.when(prev.isNull() | ((t - prev) > gap), 1).otherwise(0)
        run = (
            Window.partitionBy(*group_vars)
            .orderBy(t)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.select("*", F.sum(brk).over(run).alias(out_col))

    if bucket_width <= 0:
        raise IntervalSchemaError(
            f"bucket_width must be positive, got {bucket_width}")
    reserved = ["__sbk", "__lsid", "__soff", "__smrg"]
    clash = [c for c in reserved if c in df.columns]
    if clash:
        raise IntervalSchemaError(f"internal column(s) {clash} already exist in input")
    orig_cols = df.columns

    src = df.withColumn("__sbk", fdiv(t, bucket_width))
    wb = Window.partitionBy(*group_vars, "__sbk").orderBy(t)
    prev = F.lag(t).over(wb)
    brk = F.when(prev.isNull() | ((t - prev) > gap), 1).otherwise(0)
    runb = (
        Window.partitionBy(*group_vars, "__sbk")
        .orderBy(t)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    src = src.withColumn("__lsid", F.sum(brk).over(runb))

    b = src.groupBy(*group_vars, "__sbk").agg(
        F.min(t).alias("__min_t"),
        F.max(t).alias("__max_t"),
        F.max("__lsid").alias("__n_sess"),
    )
    wk = Window.partitionBy(*group_vars).orderBy("__sbk")
    prev_max = F.lag("__max_t").over(wk)
    merged = F.when(
        prev_max.isNotNull() & ((F.col("__min_t") - prev_max) <= gap), 1
    ).otherwise(0)
    b = b.withColumn("__smrg", merged)
    woff = (
        Window.partitionBy(*group_vars)
        .orderBy("__sbk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = b.select(
        *group_vars, "__sbk", "__smrg",
        F.coalesce(F.sum(F.col("__n_sess") - F.col("__smrg")).over(woff),
                   F.lit(0)).alias("__soff"),
    )
    out = src.join(b, on=[*group_vars, "__sbk"], how="left")
    return out.select(
        *orig_cols,
        (F.col("__soff") + F.col("__lsid") - F.col("__smrg")).alias(out_col),
    )


def session_bounds(
    df: DataFrame,
    ts_col: str,
    gap: int,
    group_vars: Sequence[str],
    value_col: str | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """One row per session: start/end timestamps, event count, duration
    (closed-interval semantics: ``end - start + 1`` time units, matching
    the engine's interval length convention), and optionally the sum of
    ``value_col``. The groupBy reuses the window's (key) partitioning —
    still a single exchange (flat path); ``bucket_width`` passes through
    to :func:`sessionize` for the hot-key keying."""
    reserved = ["session_id", "session_start", "session_end", "n_events",
                "duration"] + ([f"sum_{value_col}"] if value_col else [])
    clash = [g for g in group_vars if g in reserved]
    if clash:
        raise IntervalSchemaError(
            f"group_vars {clash} collide with reserved output column names "
            f"{reserved}")
    s = sessionize(df, ts_col, gap, group_vars, bucket_width=bucket_width)
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
