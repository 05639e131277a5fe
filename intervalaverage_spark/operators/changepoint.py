"""CUSUM changepoint detection: two-sided cumulative-sum level-shift
alarms over per-key time series.

Page's CUSUM statistic is a nonlinear recurrence —

    s+_i = max(0, s+_{i-1} + (x_i - mu - kappa))
    s-_i = max(0, s-_{i-1} + (mu - kappa - x_i))

— which looks like it needs a stateful per-row scan (the shape the
reference's C++ kernels do per group; cf. Cintervalaverage's
group-local state walk, src/*.cpp). It does not: with
``P_i = sum_{t<=i} d_t`` the max-reset telescopes to

    s+_i = P_i - min(0, min_{j<=i} P_j)

so the whole detector is ONE exchange on the key partitioning and two
window passes (running sum, then running min of it) — pure JVM window
state, no UDF, no iteration, the same prefix-trick family as the
distributed shard prefix sum (functions/sharding.py).

Cross-engine exactness (the driver's DuckDB gate): every accumulated
quantity is DECIMAL — per-(key, ts) means fold from exact decimal sums
with one IEEE divide; mu/kappa/h are single fixed-order float
expressions over exact decimal aggregates, 6-dp rounded, then cast
back to decimal for the per-row deviations; prefix sums and running
mins run in decimal (exact, order-free). Ties in the order column
cannot exist: input collapses to one row per (key, ts) first, which
also makes the window order total and the output replayable.

Scale shape at 100 TB: the pre-aggregation combines map-side (one row
per (key, ts) survives), the detector is one hash exchange + one sort
per key partition, and a hot key is bounded by its own series length
— no joins, no driver state, no collect.

Reference parity context: no changepoint operator in the reference
(kaufman-lab/intervalaverage) — a time-series payload extension
(SURVEY.md §2.4); the recurrence-to-prefix rewrite is the Spark-first
replacement for a per-group imperative scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.validation import IntervalSchemaError

_DEC = "decimal(18,6)"
_OUT_COLS = ("x", "s_pos", "s_neg", "alarm")


def cusum_points(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_vars: Sequence[str],
) -> DataFrame:
    """One row per (key, ts): the 6-dp decimal mean of ``value_col``
    (exact decimal sum → one IEEE divide → 6-dp round → decimal).
    Collapsing duplicates makes the detector's window order TOTAL —
    the precondition for determinism and the prefix identity."""
    g = list(group_vars)
    xd = F.round(F.col(value_col).cast("double"), 6).cast(_DEC)
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*g, ts_col)
        .agg(F.sum(xd).alias("_sx"), F.count(F.lit(1)).alias("_cn"))
        .select(
            *g,
            ts_col,
            F.round(
                F.col("_sx").cast("double") / F.col("_cn"), 6
            ).cast(_DEC).alias("x"),
        )
    )


def cusum_calibration_from_points(
    pts: DataFrame,
    group_vars: Sequence[str],
    kappa_mult: float = 0.5,
    h_mult: float = 4.0,
) -> DataFrame:
    """Per-key ``(mu, kappa, h)`` as DECIMAL(18,6) from exact decimal
    moments of a :func:`cusum_points` relation — mu/kappa/h are each
    ONE fixed-order float expression, 6-dp rounded. This is the
    offline-calibration artifact the STREAMING detector consumes
    (streaming/cusum_stream.py): calibrate on history, monitor the
    stream against it."""
    g = list(group_vars)
    stats = pts.groupBy(*g).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("x").alias("_s1"),
        F.sum(F.col("x") * F.col("x")).alias("_s2"),
    )
    mean = F.col("_s1").cast("double") / F.col("_n")
    ex2 = F.col("_s2").cast("double") / F.col("_n")
    sigma = F.sqrt(F.greatest(F.lit(0.0), ex2 - mean * mean))
    return stats.select(
        *g,
        F.round(mean, 6).cast(_DEC).alias("mu"),
        F.round(sigma * kappa_mult, 6).cast(_DEC).alias("kappa"),
        F.round(sigma * h_mult, 6).cast(_DEC).alias("h"),
    )


def cusum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_vars: Sequence[str],
    kappa_mult: float = 0.5,
    h_mult: float = 4.0,
    alarms_only: bool = True,
) -> DataFrame:
    """Two-sided CUSUM over ``value_col`` ordered by ``ts_col`` per key.

    Offline (self-calibrating) form: ``mu``/``sigma`` are the per-key
    mean and population std of the per-timestamp series, ``kappa =
    kappa_mult * sigma`` (slack against drift), ``h = h_mult * sigma``
    (alarm threshold). Rows with NULL values are excluded; multiple
    rows per (key, ts) collapse to their mean first (a total window
    order is required for the prefix identity — and for determinism).

    Returns one row per (key, ts) with ``x`` (the series point),
    ``s_pos``/``s_neg`` (the CUSUM statistics, 6-dp), and ``alarm``
    (true when either side exceeds ``h``); ``alarms_only=True`` keeps
    only alarm rows. ``kappa_mult`` ≥ 0, ``h_mult`` > 0 are contracts.
    """
    if kappa_mult < 0:
        raise IntervalSchemaError(
            f"cusum: kappa_mult must be >= 0, got {kappa_mult}"
        )
    if h_mult <= 0:
        raise IntervalSchemaError(
            f"cusum: h_mult must be > 0, got {h_mult}"
        )
    if not group_vars:
        raise IntervalSchemaError("cusum: group_vars must be non-empty")
    for c in (ts_col, value_col, *group_vars):
        if c not in df.columns:
            raise IntervalSchemaError(f"cusum: missing column {c!r}")
    clash = [c for c in _OUT_COLS if c in df.columns]
    if clash:
        raise IntervalSchemaError(
            f"cusum: input columns clash with output names {clash}"
        )

    g = list(group_vars)
    pts = cusum_points(df, ts_col, value_col, g)
    cal = cusum_calibration_from_points(pts, g, kappa_mult, h_mult)
    cal = cal.select(
        *g,
        F.col("mu").alias("_mu"),
        F.col("kappa").alias("_kappa"),
        F.col("h").alias("_h"),
    )

    w = Window.partitionBy(*g).orderBy(ts_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d_pos = F.col("x") - F.col("_mu") - F.col("_kappa")
    d_neg = F.col("_mu") - F.col("_kappa") - F.col("x")
    zero = F.lit(0).cast(_DEC)

    out = (
        pts.join(cal, g)
        .withColumn("_pp", F.sum(d_pos).over(run))
        .withColumn("_pn", F.sum(d_neg).over(run))
        .withColumn(
            "_sp", F.col("_pp") - F.least(zero, F.min("_pp").over(run))
        )
        .withColumn(
            "_sn", F.col("_pn") - F.least(zero, F.min("_pn").over(run))
        )
        .withColumn(
            "alarm",
            (F.col("_sp") > F.col("_h")) | (F.col("_sn") > F.col("_h")),
        )
    )
    if alarms_only:
        out = out.where(F.col("alarm"))
    return out.select(
        *g,
        ts_col,
        F.col("x").cast("double").alias("x"),
        F.round(F.col("_sp").cast("double"), 6).alias("s_pos"),
        F.round(F.col("_sn").cast("double"), 6).alias("s_neg"),
        F.round(F.col("_h").cast("double"), 6).alias("h"),
        "alarm",
    )
