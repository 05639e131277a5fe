"""Overlap isolation — fragment a self-overlapping interval set into atomic
pieces (``isolateoverlaps``, reference R/intervalaverage_functions.R:756-828).

Every input row maps to ≥1 output fragments that are mutually
non-overlapping or exactly coinciding, and whose union reproduces the
original row's interval exactly. Algorithm (endpoint sweep, Spark-first):

  1. unpivot each row's (start,end) into an endpoint stream   (:788-791)
  2. per group, sort endpoints with starts before ends at equal value and
     take the lead() endpoint                                  (:796-801)
  3. boundary algebra for closed intervals (±1 shifts): a start opens a
     fragment at ``value``, an end opens at ``value+1``; the fragment closes
     at ``next_value-1`` for a next-start and ``next_value`` for a next-end
     (:806-809); drop inverted candidates (:811)
  4. inner range join of candidate fragments back onto the original rows
     (``foverlaps`` :817) — fragments inherit every covering source row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.operators.average import _from_int_days, _prep
from intervalaverage_spark.plans.rangejoin import range_join
from intervalaverage_spark.validation import check_intervals, check_schema


def isolate_overlaps(
    x: DataFrame,
    interval_vars: Sequence[str],
    group_vars: Sequence[str] = (),
    interval_vars_out: tuple[str, str] = ("start", "end"),
    validate: bool = True,
    strategy: str = "auto",
    bucket_width: int | None = None,
    sort: bool = True,
) -> DataFrame:
    """Returns ``(*group_vars, interval_vars_out[0], interval_vars_out[1],
    *original interval_vars, *other x columns)`` — one row per (fragment,
    covering source row), sorted like the reference (:818-826);
    ``sort=False`` drops that final global sort for order-insensitive
    callers (saves a full range-exchange pass at scale)."""
    iv = list(interval_vars)
    gv = list(group_vars)
    out_s, out_e = interval_vars_out
    if out_s in x.columns or out_e in x.columns:
        raise ValueError(f"interval_vars_out {interval_vars_out} collide with x columns")
    is_date = check_schema(x, iv, gv, reserved_ok=True)
    if validate:
        check_intervals(x, iv[0], iv[1], gv, label="x")

    rest = [c for c in x.columns if c not in (*iv, *gv)]
    xp = _prep(x, iv, "__io_s", "__io_e", [*gv, *rest], is_date)

    # endpoint sweep: starts (is_end=0) before ends (is_end=1) at same value
    pts = xp.select(
        *gv,
        F.explode(
            F.array(
                F.struct(F.col("__io_s").alias("value"), F.lit(0).alias("is_end")),
                F.struct(F.col("__io_e").alias("value"), F.lit(1).alias("is_end")),
            )
        ).alias("p"),
    ).select(*gv, F.col("p.value").alias("value"), F.col("p.is_end").alias("is_end")).distinct()

    w = Window.partitionBy(*gv).orderBy("value", "is_end")
    swept = pts.select(
        *gv, "value", "is_end",
        F.lead("value").over(w).alias("nxt_value"),
        F.lead("is_end").over(w).alias("nxt_is_end"),
    ).filter(F.col("nxt_value").isNotNull())

    frag_s = F.when(F.col("is_end") == 0, F.col("value")).otherwise(F.col("value") + 1)
    frag_e = F.when(F.col("nxt_is_end") == 1, F.col("nxt_value")).otherwise(
        F.col("nxt_value") - 1
    )
    frags = (
        swept.select(*gv, frag_s.alias("__io_fs"), frag_e.alias("__io_fe"))
        .filter(F.col("__io_fs") <= F.col("__io_fe"))
        .distinct()
    )

    fg = [f"__io_fg{i}" for i in range(len(gv))]
    frags_r = frags.select(*[F.col(g).alias(a) for g, a in zip(gv, fg)], "__io_fs", "__io_fe")
    joined = range_join(
        frags_r, xp,
        ("__io_fs", "__io_fe"), ("__io_s", "__io_e"),
        group_vars=dict(zip(fg, gv)),
        strategy=strategy, bucket_width=bucket_width,
    ).drop(*fg)

    fs, fe = F.col("__io_fs"), F.col("__io_fe")
    s0, e0 = F.col("__io_s"), F.col("__io_e")
    if is_date:
        fs, fe, s0, e0 = map(_from_int_days, (fs, fe, s0, e0))
    else:
        st = x.schema[iv[0]].dataType.simpleString()
        et = x.schema[iv[1]].dataType.simpleString()
        fs, fe, s0, e0 = fs.cast(st), fe.cast(et), s0.cast(st), e0.cast(et)
    out = joined.select(
        *gv, fs.alias(out_s), fe.alias(out_e), s0.alias(iv[0]), e0.alias(iv[1]), *rest
    )
    return out.orderBy(*gv, out_s, out_e, iv[0], iv[1]) if sort else out
