"""Visualization-oriented series downsampling: M4 and LTTB.

A rollup/downsample engine's read path serves dashboards: render a
million-point series into w pixels without losing visual features. Two
published operators:

* **M4** (Jugel et al., VLDB 2014 "M4: A Visualization-Oriented Time
  Series Data Aggregation"): per time bucket keep first/last/min/max
  with their timestamps — error-free line rendering at pixel width.
  Pure groupBy aggregation: ONE shuffle, whole-stage codegen, perfectly
  mergeable (it's a tier-state shape), ideal for Spark. Argmin/argmax
  tie-break = earliest timestamp, via lexicographic ``min(struct(v,t))``
  — deterministic and engine-portable.

* **LTTB** (Steinarsson 2013, "Downsampling Time Series for Visual
  Representation"): sequential greedy triangle maximization — each pick
  depends on the previous pick, so it is inherently per-series
  sequential. Implemented as ``applyInPandas`` per key (numpy inside):
  the right tool when the per-key series fits a task (tier series do:
  a year of 1d points ≈ 365 rows; even 1h ≈ 8.8k), with keys spread
  across executors. For series too long for one task, run M4 first to
  a 2-4× target, then LTTB — the standard cascade.

100 TB: M4 is the scale path (agg-only); LTTB parallelizes across the
(url × var) key space, never within a key — same contract as
encode_segments (functions/gorilla.py).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intervalaverage_spark.plans.rangejoin import fdiv
from intervalaverage_spark.validation import IntervalSchemaError


def m4_downsample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_width: int,
    group_vars: Sequence[str] = (),
) -> DataFrame:
    """Per (group, bucket): first/last/min/max of ``value_col`` with their
    timestamps. NULL values are ignored (a bucket of only NULLs keeps
    NULL aggregates but still reports ``n_points``).

    Output: group_vars…, bucket, t_first, v_first, t_last, v_last,
    t_min, v_min, t_max, v_max, n_points.
    """
    for c in (ts_col, value_col, *group_vars):
        if c not in df.columns:
            raise IntervalSchemaError(f"missing column {c!r}")
    if bucket_width <= 0:
        raise IntervalSchemaError(f"bucket_width must be positive, got {bucket_width}")
    group_vars = list(group_vars)
    t = F.col(ts_col).cast("long")
    v = F.col(value_col)
    nn = v.isNotNull()
    # lexicographic struct min/max: (v, t) orders by value then earliest
    # timestamp — deterministic tie-break; (t, v) orders by time for
    # first/last. NULL structs (null v) are ignored by min/max.
    vt = F.when(nn, F.struct(v.alias("v"), t.alias("t")))
    tv = F.when(nn, F.struct(t.alias("t"), v.alias("v")))
    agg = (
        df.groupBy(*group_vars, fdiv(t, bucket_width).alias("bucket"))
        .agg(
            F.min(tv).alias("__f"),
            F.max(tv).alias("__l"),
            F.min(vt).alias("__mn"),
            F.max(vt).alias("__mx"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
    return agg.select(
        *group_vars, "bucket",
        F.col("__f.t").alias("t_first"), F.col("__f.v").alias("v_first"),
        F.col("__l.t").alias("t_last"), F.col("__l.v").alias("v_last"),
        F.col("__mn.t").alias("t_min"), F.col("__mn.v").alias("v_min"),
        F.col("__mx.t").alias("t_max"), F.col("__mx.v").alias("v_max"),
        "n_points",
    )


def m4_cascade(
    state: DataFrame,
    from_width: int,
    to_width: int,
    group_vars: Sequence[str] = (),
) -> DataFrame:
    """Merge M4 states from ``from_width`` buckets into ``to_width``
    buckets WITHOUT re-reading raw points — M4 state is mergeable the
    same way the tier engine's Σw·v state is (operators/tiers.py):
    first = arg-min over child firsts, min = arg-min over child minima,
    etc., all via the same lexicographic struct aggregates. Exactness
    (``m4_cascade(m4(W1), W2) == m4(W2)``) is property-tested.

    The zoom-out path of a dashboard backend: day → week → month pyramid
    built level-from-level, each level ~W-fold smaller than the last."""
    if to_width % from_width:
        raise IntervalSchemaError(
            f"{to_width} not a multiple of {from_width}: M4 levels must tile")
    group_vars = list(group_vars)
    for c in ("bucket", "t_first", "v_first", "t_last", "v_last",
              "t_min", "v_min", "t_max", "v_max", "n_points", *group_vars):
        if c not in state.columns:
            raise IntervalSchemaError(f"missing M4 state column {c!r}")
    k = fdiv(F.col("bucket") * from_width, to_width)

    def vt(t_c: str, v_c: str):
        nn = F.col(v_c).isNotNull()
        return F.when(nn, F.struct(F.col(v_c).alias("v"), F.col(t_c).alias("t")))

    def tv(t_c: str, v_c: str):
        nn = F.col(v_c).isNotNull()
        return F.when(nn, F.struct(F.col(t_c).alias("t"), F.col(v_c).alias("v")))

    agg = state.groupBy(*group_vars, k.alias("bucket")).agg(
        F.min(tv("t_first", "v_first")).alias("__f"),
        F.max(tv("t_last", "v_last")).alias("__l"),
        F.min(vt("t_min", "v_min")).alias("__mn"),
        F.max(vt("t_max", "v_max")).alias("__mx"),
        F.sum("n_points").alias("n_points"),
    )
    return agg.select(
        *group_vars, "bucket",
        F.col("__f.t").alias("t_first"), F.col("__f.v").alias("v_first"),
        F.col("__l.t").alias("t_last"), F.col("__l.v").alias("v_last"),
        F.col("__mn.t").alias("t_min"), F.col("__mn.v").alias("v_min"),
        F.col("__mx.t").alias("t_max"), F.col("__mx.v").alias("v_max"),
        "n_points",
    )


def lttb_numpy(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Reference LTTB on one series (t sorted ascending, no NaNs).
    Returns the selected row indices, always including both endpoints.
    Sequential by construction — each triangle uses the PREVIOUS pick."""
    n = len(t)
    if n_out >= n or n <= 2:
        return np.arange(n)
    if n_out < 3:
        raise IntervalSchemaError(f"n_out must be >= 3, got {n_out}")
    # bucket boundaries over the interior points (exclusive of endpoints)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0], out[-1] = 0, n - 1
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        if hi <= lo:  # empty bucket (n_out ≈ n): degrade to the boundary
            a = int(min(lo, n - 2))
            out[i + 1] = a
            continue
        # average point of the NEXT bucket (the last bucket's "next" is
        # the final endpoint; an empty next bucket degrades likewise)
        if i == n_out - 3 or edges[i + 2] <= hi:
            bx, by = t[n - 1], v[n - 1]
        else:
            nlo, nhi = hi, edges[i + 2]
            bx, by = t[nlo:nhi].mean(), v[nlo:nhi].mean()
        ax, ay = t[a], v[a]
        area = np.abs(
            (ax - bx) * (v[lo:hi] - ay) - (ax - t[lo:hi]) * (by - ay)
        )
        a = lo + int(np.argmax(area))
        out[i + 1] = a
    return out


def lttb(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    n_out: int,
    group_vars: Sequence[str],
) -> DataFrame:
    """Largest-Triangle-Three-Buckets per key: keep ``n_out`` visually
    dominant points of each (group…) series. NULL values are dropped
    first (they carry no triangle area). Output schema: group_vars…,
    ts_col (long), value_col (double)."""
    for c in (ts_col, value_col, *group_vars):
        if c not in df.columns:
            raise IntervalSchemaError(f"missing column {c!r}")
    if n_out < 3:
        raise IntervalSchemaError(f"n_out must be >= 3, got {n_out}")
    group_vars = list(group_vars)
    if not group_vars:
        raise IntervalSchemaError("lttb needs >=1 group var (per-series operator)")
    slim = df.select(
        *group_vars,
        F.col(ts_col).cast("long").alias(ts_col),
        F.col(value_col).cast("double").alias(value_col),
    ).filter(F.col(value_col).isNotNull())
    schema = T.StructType(
        [slim.schema[g] for g in group_vars]
        + [T.StructField(ts_col, T.LongType()), T.StructField(value_col, T.DoubleType())]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        idx = lttb_numpy(
            pdf[ts_col].to_numpy(np.float64),
            pdf[value_col].to_numpy(np.float64),
            n_out,
        )
        return pdf.iloc[idx][[*group_vars, ts_col, value_col]]

    return slim.groupBy(*group_vars).applyInPandas(_one, schema)
