"""Gap-value fill over regular series: LOCF / NOCB / linear interpolation.

``finalize`` (operators/tiers.py) emits dense tier grids whose uncovered
windows carry NULL values (the reference's unmatched-y semantics,
src/code.cpp:32-50). A retention/rollup engine also needs the standard
fills on top of that grid:

* ``locf``  — last observation carried forward (per key, in order);
  optional ``limit`` bounds how far (in order-units) a value is carried.
* ``nocb``  — next observation carried backward (the mirror).
* ``interpolate_linear`` — interior NULLs get the straight line between
  the surrounding observations; leading/trailing NULLs stay NULL.

All three are single-window codegen expressions
(``last(v, ignorenulls=True)`` over the key partition) — ONE exchange on
the group key, no join, no UDF. At 10^12 rows the window partitions by
the same (url-hash) key the tier tables are already laid out on, so with
a bucketed/partitioned layout the exchange disappears entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.validation import IntervalSchemaError


def _check(df: DataFrame, order_col: str, value_cols: Sequence[str], group_vars: Sequence[str]):
    for c in (order_col, *value_cols, *group_vars):
        if c not in df.columns:
            raise IntervalSchemaError(f"missing column {c!r}")


def locf(
    df: DataFrame,
    order_col: str,
    value_cols: Sequence[str],
    group_vars: Sequence[str] = (),
    limit: int | None = None,
    out_suffix: str = "_filled",
) -> DataFrame:
    """Fill NULLs with the last preceding non-NULL per key; appends
    ``<v><out_suffix>`` per value column. ``limit``: carry at most that
    many order-units past the observation (NULL again beyond it)."""
    group_vars, value_cols = list(group_vars), list(value_cols)
    _check(df, order_col, value_cols, group_vars)
    w = (
        Window.partitionBy(*group_vars)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cols: list[Column] = []
    for v in value_cols:
        filled = F.last(v, ignorenulls=True).over(w)
        if limit is not None:
            src_t = F.last(
                F.when(F.col(v).isNotNull(), F.col(order_col)), ignorenulls=True
            ).over(w)
            filled = F.when(F.col(order_col) - src_t <= F.lit(int(limit)), filled)
        cols.append(filled.alias(f"{v}{out_suffix}"))
    return df.select("*", *cols)


def nocb(
    df: DataFrame,
    order_col: str,
    value_cols: Sequence[str],
    group_vars: Sequence[str] = (),
    limit: int | None = None,
    out_suffix: str = "_filled",
) -> DataFrame:
    """Next observation carried backward — :func:`locf` on the mirrored
    order axis (same single-exchange plan, descending sort)."""
    group_vars, value_cols = list(group_vars), list(value_cols)
    _check(df, order_col, value_cols, group_vars)
    w = (
        Window.partitionBy(*group_vars)
        .orderBy(F.desc(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cols: list[Column] = []
    for v in value_cols:
        filled = F.last(v, ignorenulls=True).over(w)
        if limit is not None:
            src_t = F.last(
                F.when(F.col(v).isNotNull(), F.col(order_col)), ignorenulls=True
            ).over(w)
            filled = F.when(src_t - F.col(order_col) <= F.lit(int(limit)), filled)
        cols.append(filled.alias(f"{v}{out_suffix}"))
    return df.select("*", *cols)


def interpolate_linear(
    df: DataFrame,
    order_col: str,
    value_cols: Sequence[str],
    group_vars: Sequence[str] = (),
    out_suffix: str = "_filled",
) -> DataFrame:
    """Interior NULLs become the linear interpolation between the nearest
    preceding and following observations (weighted by order distance);
    rows outside the observed span stay NULL; observed rows pass through.

    Two windows (ascending + descending) over the SAME key partitioning —
    Catalyst plans one exchange and two sorts, still zero joins."""
    group_vars, value_cols = list(group_vars), list(value_cols)
    _check(df, order_col, value_cols, group_vars)
    t = F.col(order_col).cast("double")
    wb = (
        Window.partitionBy(*group_vars)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*group_vars)
        .orderBy(F.desc(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cols: list[Column] = []
    for v in value_cols:
        nn = F.col(v).isNotNull()
        pv = F.last(v, ignorenulls=True).over(wb)
        pt = F.last(F.when(nn, t), ignorenulls=True).over(wb)
        nv = F.last(v, ignorenulls=True).over(wf)
        nt = F.last(F.when(nn, t), ignorenulls=True).over(wf)
        interp = pv + (nv - pv) * (t - pt) / (nt - pt)
        cols.append(
            F.when(nn, F.col(v).cast("double"))
            .when(pv.isNotNull() & nv.isNotNull(), interp)
            .alias(f"{v}{out_suffix}")
        )
    return df.select("*", *cols)
