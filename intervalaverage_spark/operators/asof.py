"""As-of (point-in-time) join — the lead/lag construction generalized.

The reference derives validity windows from visit timestamps with an
as-of/lead construction (SURVEY §1.5; sources/webts.py mirrors it). This
module exposes the underlying operator directly: for every left row at
time ``t``, attach the most recent right row at ``rt <= t`` (backward; or
the earliest ``rt >= t`` forward), per key, optionally within a
``tolerance``.

Spark-first design — **zero join in the default path**:

* tag both sides, UNION them, and run ONE window per key ordered by
  ``(t, side)`` with ``last(payload, ignorenulls=True)``. Right rows sort
  before left rows at equal ``t``, so the match is inclusive. One
  exchange, one sort, whole-stage codegen; no range join, no broadcast,
  no per-key binary search. (A join-based as-of needs an equi+range
  non-equi join and a per-pair argmax — strictly more shuffles.)

* ``bucket_width`` (the skew path): a window partitioned only by key puts
  an entire hot key in one task. Bucketing partitions the window by
  ``(key, floor(t/width))`` so a hot key spreads across its time buckets;
  cross-bucket carry (a left row whose bucket holds no earlier right row)
  is resolved by the SAME union-window trick run at bucket granularity —
  per (key, bucket) the right side collapses to its last payload first,
  so the carry scan touches ~n_buckets rows per key, not n_rows. Two
  exchanges + one equi join on (key, bucket) — all spread. Equality with
  the flat path is property-tested (tests/test_pipeline_ops.py).

100 TB: both paths shuffle each row exactly once on a composite key the
data model already spreads (url-hash × time); no driver collect, no
state larger than one window partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.plans.rangejoin import fdiv
from intervalaverage_spark.validation import IntervalSchemaError


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    bucket_width: int | None = None,
    suffix: str = "_right",
    validate: bool = False,
) -> DataFrame:
    """For each left row, attach the closest right row per key.

    backward: latest right with ``rt <= t``; forward: earliest right with
    ``rt >= t``. Unmatched (or out-of-``tolerance``) left rows keep NULL
    right columns — left rows are never dropped (left-join semantics,
    matching DuckDB ``ASOF LEFT JOIN``).

    Output: every left column, then ``<right_ts><suffix>`` (the matched
    timestamp) and ``<c><suffix>`` for each of ``right_cols`` (default:
    all non-key, non-ts right columns).

    Right rows must be unique per (key, ``right_ts``) — the analogue of
    the reference's non-overlapping-x requirement
    (R/intervalaverage_functions.R:324-338): with duplicates the matched
    payload is sort-order-dependent. ``validate=True`` checks it eagerly
    (one aggregate + a single-row head, the reference's skippable
    eager-validation philosophy); default off — dedup upstream.
    """
    if direction not in ("backward", "forward"):
        raise IntervalSchemaError(f"direction must be backward/forward, got {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_ts)]
    right_cols = list(right_cols)
    for c in on + [left_ts]:
        if c not in left.columns:
            raise IntervalSchemaError(f"left is missing column {c!r}")
    for c in on + [right_ts, *right_cols]:
        if c not in right.columns:
            raise IntervalSchemaError(f"right is missing column {c!r}")
    clash = [f"{c}{suffix}" for c in (right_ts, *right_cols) if f"{c}{suffix}" in left.columns]
    if clash:
        raise IntervalSchemaError(f"suffix {suffix!r} collides with left columns {clash}")
    if validate:
        from intervalaverage_spark.operators.analytics import check_unique_ts

        check_unique_ts(right, right_ts, on)

    pay = F.struct(
        F.col(right_ts).cast("long").alias("__rt"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    left_pay_cols = [c for c in left.columns]
    # field list built as ONE join so an empty right_cols yields the valid
    # "struct<__rt:bigint>" (not a trailing comma → opaque DDL parse error)
    rpay_ddl = "struct<" + ",".join(
        ["__rt:bigint"]
        + [f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in right_cols]
    ) + ">"
    l2 = left.select(
        *on,
        F.col(left_ts).cast("long").alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in left_pay_cols]).alias("__lpay"),
        F.lit(None).cast(rpay_ddl).alias("__rpay"),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).cast("long").alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l2.schema["__lpay"].dataType.simpleString()).alias("__lpay"),
        pay.alias("__rpay"),
    )
    u = l2.unionByName(r2)

    # forward = backward on the mirrored time axis: negate t (right rows
    # still sort first at equal |t| via __side) and every comparison below
    # is unchanged.
    if direction == "forward":
        u = u.withColumn("__t", -F.col("__t"))

    if bucket_width is None:
        w = (
            Window.partitionBy(*on)
            .orderBy("__t", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.select(
            "*", F.last("__rpay", ignorenulls=True).over(w).alias("__m")
        ).filter(F.col("__side") == 1)
    else:
        bk = fdiv(F.col("__t"), bucket_width)
        u = u.withColumn("__bk", bk)
        wb = (
            Window.partitionBy(*on, "__bk")
            .orderBy("__t", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        inb = u.select(
            "*", F.last("__rpay", ignorenulls=True).over(wb).alias("__inb")
        ).filter(F.col("__side") == 1)

        # cross-bucket carry at bucket granularity: right collapses to its
        # per-(key, bucket) last payload (max mirrored __t — unique per the
        # input contract), left collapses to its distinct buckets; left bucket
        # rows sort BEFORE right bucket rows at equal bucket, so the carry
        # a left row sees is "last right payload in any bucket < mine".
        rb = (
            u.filter(F.col("__side") == 0)
            .groupBy(*on, "__bk")
            .agg(F.max_by("__rpay", F.col("__t")).alias("__blast"))
            .select(*on, "__bk", F.lit(1).alias("__bs"), "__blast")
        )
        lb = (
            u.filter(F.col("__side") == 1)
            .select(*on, "__bk").distinct()
            .select(*on, "__bk", F.lit(0).alias("__bs"),
                    F.lit(None).cast(rb.schema["__blast"].dataType.simpleString())
                    .alias("__blast"))
        )
        wc = (
            Window.partitionBy(*on)
            .orderBy("__bk", "__bs")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = (
            lb.unionByName(rb)
            .select("*", F.last("__blast", ignorenulls=True).over(wc).alias("__carry"))
            .filter(F.col("__bs") == 0)
            .select(*on, "__bk", "__carry")
        )
        matched = inb.join(carry, on=[*on, "__bk"], how="left").withColumn(
            "__m", F.coalesce(F.col("__inb"), F.col("__carry"))
        )

    m = F.col("__m")
    if tolerance is not None:
        # distance on the (possibly mirrored) axis: __t - __rt >= 0 always
        dist = F.col("__t") - (m.getField("__rt") * (-1 if direction == "forward" else 1))
        m = F.when(dist <= F.lit(int(tolerance)), m)
    out = [F.col(f"__lpay.{c}").alias(c) for c in left_pay_cols]
    out.append(m.getField("__rt").alias(f"{right_ts}{suffix}"))
    out += [m.getField(c).alias(f"{c}{suffix}") for c in right_cols]
    return matched.select(*out)
