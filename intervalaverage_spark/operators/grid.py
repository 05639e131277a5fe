"""Grid construction: cartesian joins and tier-aligned averaging grids.

``cj`` reproduces ``CJ.dt`` (reference R/intervalaverage_functions.R:37-78):
the cartesian product of n tables, optionally restricted to matching values
of shared ``groups`` columns (inner semantics via the ``!is.na`` filter at
:75). Spark: ``crossJoin`` / inner equi-join — Catalyst broadcasts the
small side automatically.

``tier_grid`` builds the y-table for continuous aggregates: one closed
integer interval per (key, tier window) covering ``[lo, hi]`` — the
``CJ(year-grid × persons)`` pattern of vignettes/intervalaverage-intro.Rmd:247-258
generalized to 1h/1d/30d tiers. Generated with ``sequence``+``explode``
(no driver-side loop), so a 10^12-scale grid never touches the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intervalaverage_spark.plans.rangejoin import fdiv


def cj(*dfs: DataFrame, groups: Sequence[str] = ()) -> DataFrame:
    """Cartesian (grid) join of n DataFrames; with ``groups``, the product
    is taken within matching group values (inner join on the shared
    columns). Non-group column names must be globally unique."""
    if not dfs:
        raise ValueError("cj needs at least one DataFrame")
    groups = list(groups)
    non_group = [c for df in dfs for c in df.columns if c not in groups]
    if len(set(non_group)) != len(non_group):
        raise ValueError("cj requires globally-unique non-group column names")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.join(df, on=groups, how="inner") if groups else out.crossJoin(df)
    return out


def tier_grid(
    keys: DataFrame,
    lo: int,
    hi: int,
    width: int,
    start_col: str = "start",
    end_col: str = "end",
    align: int = 0,
) -> DataFrame:
    """One row per (key row, tier window): closed intervals
    ``[align + k*width, align + (k+1)*width - 1]`` covering ``[lo, hi]``.

    ``keys`` is typically ``df.select(group_vars).distinct()``. Windows are
    epoch-aligned (``align=0``) so 24 one-hour windows tile each one-day
    window exactly — the property the tier cascade relies on.
    """
    if width <= 0 or hi < lo:
        raise ValueError("need width > 0 and hi >= lo")
    k0 = fdiv(F.lit(lo) - F.lit(align), width)
    k1 = fdiv(F.lit(hi) - F.lit(align), width)
    k = F.explode(F.sequence(k0, k1)).alias("__k")
    return keys.select("*", k).select(
        *keys.columns,
        (F.lit(align) + F.col("__k") * width).cast("long").alias(start_col),
        (F.lit(align) + (F.col("__k") + 1) * width - 1).cast("long").alias(end_col),
    )
