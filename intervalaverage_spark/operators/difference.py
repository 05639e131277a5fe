"""Interval difference — subtract one interval set from another per key.

Closes the interval algebra: intersect (∩, operators/intersect.py),
coalesce (∪, operators/coalesce.py), gaps (complement within span),
and now difference (−): for every x row, the maximal sub-intervals NOT
covered by ANY y interval of the same key.

Spark-first by COMPOSITION, not by a new kernel:

    x − y  ==  x ∩ free(y)      where
    free(y) = gaps( coalesce(y) ∪ span-sentinels )

``coalesce(y)`` fuses y into disjoint islands (one window);
sentinel single-point intervals at ``span_lo − 1`` and ``span_hi + 1``
(the key's x-span bounds) turn :func:`interval_gaps` into the bounded
complement — including the leading/trailing free runs and the whole
span for keys y never touches; the final clip is
:func:`interval_intersect`, which is the engine's bucketed range join
— so the one join in the operator is the audited scale path (salted
buckets, no per-key hot task), and everything else is key-partitioned
windows and tiny per-key aggregates.

The reference has no difference operator; its users compose it from
``intervalintersect`` + manual anti-logic per group. Here it is three
audited operators glued by ~40 lines (SURVEY.md §2.4 extension).

Closed-interval semantics match every other operator: subtracting
[4,6] from [1,9] leaves [1,3] and [7,9]; DATE intervals coerce and
restore likewise; mixed int/date classes raise.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intervalaverage_spark.operators.average import _from_int_days, _prep
from intervalaverage_spark.operators.coalesce import (
    interval_coalesce,
    interval_gaps,
)
from intervalaverage_spark.operators.intersect import interval_intersect
from intervalaverage_spark.validation import check_schema


def interval_difference(
    x: DataFrame,
    y: DataFrame,
    interval_vars: Sequence[str] | Mapping[str, str],
    group_vars: Sequence[str] | Mapping[str, str] = (),
    interval_vars_out: tuple[str, str] = ("start", "end"),
    strategy: str = "auto",
    bucket_width: int | None = None,
    sort: bool = True,
) -> DataFrame:
    """Per-key ``x − union(y)``: uncovered pieces of every x row.

    ``interval_vars``/``group_vars`` accept the same x→y name mappings
    as :func:`interval_intersect`. Output columns: ``(*group_vars
    (x names), *interval_vars_out, *other x cols)`` — one row per
    maximal uncovered piece; x rows fully covered by y emit nothing;
    x rows in keys without any y emit themselves whole. Duplicate /
    overlapping rows are fine on BOTH sides (each x row subtracts the
    same fused y cover independently).
    """
    if isinstance(interval_vars, Mapping):
        x_iv = list(interval_vars.keys())
        y_iv = list(interval_vars.values())
    else:
        x_iv = y_iv = list(interval_vars)
    if isinstance(group_vars, Mapping):
        x_gv, y_gv = list(group_vars.keys()), list(group_vars.values())
    else:
        x_gv = y_gv = list(group_vars)

    x_dates = check_schema(x, x_iv, x_gv, reserved_ok=True)
    y_dates = check_schema(y, y_iv, y_gv, reserved_ok=True)
    if x_dates != y_dates:
        raise ValueError(
            "x and y interval columns must share a class (int vs date)"
        )

    # key's x-span (int domain): the universe the complement is bounded by
    xp = _prep(x, x_iv, "__d_xs", "__d_xe", x_gv, x_dates)
    span = xp.groupBy(*x_gv).agg(
        F.min("__d_xs").alias("__d_lo"), F.max("__d_xe").alias("__d_hi")
    )

    # y fused to disjoint islands, renamed to x key names, clipped to span
    yc = interval_coalesce(
        y, y_iv, y_gv, interval_vars_out=("__d_is", "__d_ie"), sort=False
    ).select(*y_gv, "__d_is", "__d_ie")
    yc = _prep(yc, ("__d_is", "__d_ie"), "__d_s", "__d_e", y_gv, y_dates)
    yc = yc.select(
        *[F.col(g).alias(a) for g, a in zip(y_gv, x_gv)], "__d_s", "__d_e"
    )
    clipped = (
        yc.join(span, x_gv)
        .where(
            (F.col("__d_e") >= F.col("__d_lo"))
            & (F.col("__d_s") <= F.col("__d_hi"))
        )
        .select(
            *x_gv,
            F.greatest("__d_s", "__d_lo").alias("__d_s"),
            F.least("__d_e", "__d_hi").alias("__d_e"),
        )
    )
    # sentinels just outside the span: gaps() then yields the bounded
    # complement INCLUDING leading/trailing free runs (and the whole
    # span when the key has no y at all)
    sentinels = span.select(
        *x_gv,
        (F.col("__d_lo") - 1).alias("__d_s"),
        (F.col("__d_lo") - 1).alias("__d_e"),
    ).unionByName(
        span.select(
            *x_gv,
            (F.col("__d_hi") + 1).alias("__d_s"),
            (F.col("__d_hi") + 1).alias("__d_e"),
        )
    )
    free = interval_gaps(
        clipped.unionByName(sentinels),
        ("__d_s", "__d_e"),
        x_gv,
        interval_vars_out=("__d_fs", "__d_fe"),
        sort=False,
    ).select(*x_gv, "__d_fs", "__d_fe")
    if x_dates:
        free = free.select(
            *x_gv,
            _from_int_days(F.col("__d_fs")).alias("__d_fs"),
            _from_int_days(F.col("__d_fe")).alias("__d_fe"),
        )

    # the one real join: the engine's bucketed range join via intersect
    out = interval_intersect(
        x,
        free,
        {x_iv[0]: "__d_fs", x_iv[1]: "__d_fe"},
        group_vars=dict(zip(x_gv, x_gv)),
        interval_vars_out=interval_vars_out,
        validate=False,
        strategy=strategy,
        bucket_width=bucket_width,
        sort=False,
    )
    if sort:
        out = out.orderBy(*x_gv, *interval_vars_out)
    return out
