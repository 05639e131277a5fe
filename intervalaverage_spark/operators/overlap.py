"""Overlap detection — ``is.overlapping`` (reference R/isoverlapping.R:51-87).

Existence-only check: does ANY pair of intervals within a group overlap
(closed intervals — touching endpoints count, test-Cisoverlapping.R:8)?
The reference deliberately avoids a full self-join (R/isoverlapping.R:17-21);
so do we: sort within group, compare each start to the previous end via a
``lag`` window (kernel src/Cisoverlapping.cpp:16-21), then ``limit 1``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.operators.average import _prep
from intervalaverage_spark.validation import check_intervals, check_schema


def _overlap_scan(
    x: DataFrame,
    interval_vars: Sequence[str],
    group_vars: Sequence[str],
    validate: bool,
) -> DataFrame:
    """THE overlap kernel (shared by :func:`is_overlapping` and
    :func:`overlap_flags`): per row, does it overlap its predecessor in
    (start, end) order within its group? One sorted lag-window pass
    (src/Cisoverlapping.cpp:16-21) — sufficient because if ANY pair
    overlaps, some adjacent-in-sort-order pair does."""
    iv = list(interval_vars)
    gv = list(group_vars)
    is_date = check_schema(x, iv, gv, reserved_ok=True)
    if validate:
        check_intervals(x, iv[0], iv[1], gv, label="x")
    xp = _prep(x, iv, "__s", "__e", gv, is_date)
    w = Window.partitionBy(*gv).orderBy("__s", "__e")
    return xp.select(*gv, (F.col("__s") <= F.lag("__e").over(w)).alias("__ov"))


def is_overlapping(
    x: DataFrame,
    interval_vars: Sequence[str],
    group_vars: Sequence[str] = (),
    validate: bool = True,
    verbose: bool = False,
) -> bool:
    if verbose:
        # reference hints about pre-sorting (R/isoverlapping.R:80); Spark
        # sorts inside the window, so the hint is about the plan instead
        print("is_overlapping: one lag-window pass over "
              f"(groups={list(group_vars)}, {list(interval_vars)}), early-out limit 1")
    hits = (
        _overlap_scan(x, interval_vars, group_vars, validate)
        .filter(F.col("__ov"))
        .limit(1)
    )
    return len(hits.collect()) > 0


def overlap_flags(
    x: DataFrame,
    interval_vars: Sequence[str],
    group_vars: Sequence[str] = (),
    validate: bool = True,
) -> DataFrame:
    """Per-group overlap existence flags: ``(*group_vars, any_overlap)``.
    Same kernel as :func:`is_overlapping`, aggregated instead of
    early-outed — the grouped-report flavor of the reference's boolean."""
    scan = _overlap_scan(x, interval_vars, group_vars, validate)
    return scan.groupBy(*group_vars).agg(
        F.coalesce(F.max("__ov"), F.lit(False)).alias("any_overlap")
    )
