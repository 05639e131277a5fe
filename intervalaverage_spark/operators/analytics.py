"""Series analytics: rate/derivative, time-range rolling aggregates,
exact windowed percentiles.

The read-side toolkit a monitoring/telemetry engine layers over tier
points (PromQL's rate/irate, SQL's RANGE-frame moving aggregates,
percentile panels). All three are single-exchange window/groupBy shapes
— no joins, no UDFs, whole-stage codegen except the percentile buffer
(Spark's exact percentile is an ObjectHashAggregate with a per-group
value buffer — bounded by the bucket's row count; use approx_percentile
for unbounded-cardinality panels at extreme scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.plans.rangejoin import fdiv
from intervalaverage_spark.validation import IntervalSchemaError

_AGGS = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}


def _need(df: DataFrame, *cols: str) -> None:
    for c in cols:
        if c not in df.columns:
            raise IntervalSchemaError(f"missing column {c!r}")


def rate(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_vars: Sequence[str],
    counter_reset: str = "none",
    out_col: str = "rate",
) -> DataFrame:
    """Per-key discrete derivative ``Δv/Δt`` between consecutive points.

    ``counter_reset``:
      * ``"none"``  — gauge semantics: Δv may be negative.
      * ``"zero"``  — monotone-counter semantics (PromQL ``rate``): a
        drop means the counter restarted at 0, so Δv = current value.

    First point per key (no predecessor) and duplicate timestamps
    (Δt = 0) yield NULL — dedup upstream for unique-ts series, same
    contract as operators/asof.py."""
    if counter_reset not in ("none", "zero"):
        raise IntervalSchemaError(
            f"counter_reset must be none/zero, got {counter_reset!r}")
    group_vars = list(group_vars)
    _need(df, ts_col, value_col, *group_vars)
    t = F.col(ts_col).cast("long")
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(*group_vars).orderBy(t)
    pt, pv = F.lag(t).over(w), F.lag(v).over(w)
    dv = (
        F.when(v >= pv, v - pv).otherwise(v)
        if counter_reset == "zero" else v - pv
    )
    return df.select(
        "*", F.when(t > pt, dv / (t - pt)).alias(out_col)
    )


def rolling(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: int,
    group_vars: Sequence[str],
    aggs: Sequence[str] = ("mean",),
) -> DataFrame:
    """Time-RANGE moving aggregates per key: each row sees every point
    with ``t' ∈ [t − window, t]`` (closed, in ``ts_col`` units — event
    spacing doesn't matter, unlike ROWS frames). Appends
    ``<value>_roll_<agg>`` per requested agg. One exchange; all frames
    share the single (key, t) sort."""
    group_vars = list(group_vars)
    _need(df, ts_col, value_col, *group_vars)
    bad = [a for a in aggs if a not in _AGGS]
    if bad:
        raise IntervalSchemaError(f"unknown aggs {bad}; choose from {sorted(_AGGS)}")
    if window < 0:
        raise IntervalSchemaError(f"window must be >= 0, got {window}")
    t = F.col(ts_col).cast("long")
    w = (
        Window.partitionBy(*group_vars)
        .orderBy(t)
        .rangeBetween(-window, 0)
    )
    cols = [
        _AGGS[a](F.col(value_col).cast("double")).over(w)
        .alias(f"{value_col}_roll_{a}")
        for a in aggs
    ]
    return df.select("*", *cols)


def windowed_percentiles(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_width: int,
    percentiles: Sequence[float],
    group_vars: Sequence[str],
) -> DataFrame:
    """Exact linear-interpolation percentiles of ``value_col`` per
    (key, time bucket) — the panel query. Output: group_vars…, bucket,
    ``p<pct>`` per requested percentile, n_points. NULL values excluded
    (bucket of only NULLs → NULL percentiles, n_points still counts)."""
    group_vars = list(group_vars)
    _need(df, ts_col, value_col, *group_vars)
    for p in percentiles:
        if not 0.0 <= p <= 1.0:
            raise IntervalSchemaError(f"percentile {p} outside [0, 1]")
    if bucket_width <= 0:
        raise IntervalSchemaError(f"bucket_width must be positive, got {bucket_width}")
    t = F.col(ts_col).cast("long")
    pct = F.percentile(
        F.col(value_col).cast("double"),
        F.array(*[F.lit(float(p)) for p in percentiles]),
    )
    agg = df.groupBy(*group_vars, fdiv(t, bucket_width).alias("bucket")).agg(
        pct.alias("__p"), F.count(F.lit(1)).alias("n_points")
    )
    names = [f"p{str(p).replace('0.', '').ljust(2, '0')}" for p in percentiles]
    return agg.select(
        *group_vars, "bucket",
        *[F.col("__p").getItem(i).alias(n) for i, n in enumerate(names)],
        "n_points",
    )
