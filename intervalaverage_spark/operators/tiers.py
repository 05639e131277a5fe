"""Tiered continuous aggregates: 1h → 1d → 30d rollup with mergeable state.

The north-star pipeline (BASELINE.json north_rule) generalizes
``intervalaverage`` onto fixed retention tiers. Two design decisions make
it scale to 10^12 rows:

1. **No range join in the cascade.** Tier windows ARE the range-join
   buckets: each x interval explodes across the windows it covers
   (``sequence(floor(s/W), floor(e/W))``, ≤ len/W + 1 rows), then ONE
   shuffled aggregate per tier. Equivalent to
   ``interval_average(x, tier_grid(...))`` — property-tested — but with
   zero join, zero grid materialization.

2. **State, not points, between tiers.** Weighted means don't merge;
   their numerators/denominators do (Σw·v, Σw). The maxgap statistic
   merges via classic longest-run segment algebra: per (window, value
   var) keep ``(prefix, suffix, best)`` = (uncovered run touching the
   left edge, touching the right edge, best anywhere). Parent windows
   fold their children in ws order; children absent from the state table
   are implicitly all-gap (that's the gap-fill). 30d-from-1d therefore
   EQUALS 30d-from-raw exactly (integer gap/weight math; float Σ up to
   addition order).

State schema per (group_vars…, ws, we):
    xduration, xminstart, xmaxend            — shared bookkeeping
    sum_wv_<v>, nobs_<v>                     — weighted-mean state
    prefix_<v>, suffix_<v>, best_<v>         — maxgap state

``finalize`` turns state into reference-semantics points (same columns as
:func:`interval_average`), optionally gap-filling empty windows against a
dense per-key grid (unmatched-y semantics, src/code.cpp:32-50).

Reference parity: weighted means/nobs per src/code.cpp:133-144; maxgap per
src/code.cpp:91-167 (the (prefix,suffix,best) fold is equivalent to the
reference's single-pass run accumulation — differential-tested).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from intervalaverage_spark.operators.grid import tier_grid
from intervalaverage_spark.plans.rangejoin import fdiv

#: tier name → window width in integer time units (seconds)
TIER_WIDTHS: dict[str, int] = {"1h": 3600, "1d": 86400, "30d": 30 * 86400}


def _gapstate_fold(items: Column, ws: Column, we: Column) -> Column:
    """Fold sorted coverage items ``struct(cs, ce, ib)`` (absolute coverage
    span + internal best run) into ``struct(prefix, suffix, best)`` for the
    window [ws, we]. Items must be sorted by cs, non-overlapping, and only
    contain real coverage (callers filter all-gap items out)."""
    nil = F.lit(None).cast("long")
    zero = F.lit(0).cast("long")
    init = F.struct(nil.alias("first"), (ws - 1).alias("last"), zero.alias("best"))

    def merge(acc: Column, it: Column) -> Column:
        run = it["cs"] - acc["last"] - 1  # gap run ending at this coverage
        return F.struct(
            F.coalesce(acc["first"], it["cs"]).alias("first"),
            it["ce"].alias("last"),
            F.greatest(acc["best"], it["ib"], run).alias("best"),
        )

    def finish(acc: Column) -> Column:
        tail = we - acc["last"]  # inclusive of we, exclusive of last coverage
        ln = we - ws + 1
        return F.struct(
            F.coalesce(acc["first"] - ws, ln).alias("prefix"),
            F.when(acc["first"].isNull(), ln).otherwise(tail).alias("suffix"),
            F.greatest(acc["best"], tail).alias("best"),
        )

    return F.aggregate(items, init, merge, finish)


def _state_agg(
    exploded: DataFrame,
    group_vars: Sequence[str],
    value_vars: Sequence[str],
    width: int,
) -> DataFrame:
    """Shared shape of both cascade steps: groupBy (groups, window-id) over
    rows carrying (os, oe) coverage + per-v payloads, emit the state table."""
    os_, oe_ = F.col("__os"), F.col("__oe")
    w = oe_ - os_ + 1
    null_fields = [f"n{i}" for i in range(len(value_vars))]
    row = F.struct(
        os_.alias("cs"), oe_.alias("ce"),
        *[F.col(f"__ib_{v}").alias(f"ib{i}") for i, v in enumerate(value_vars)],
        *[F.col(f"__na_{v}").alias(nf) for v, nf in zip(value_vars, null_fields)],
    )
    aggs = [
        F.sum(w).alias("xduration"),
        F.min(os_).alias("xminstart"),
        F.max(oe_).alias("xmaxend"),
        F.sort_array(F.collect_list(row)).alias("__rows"),
    ]
    for v in value_vars:
        nn = ~F.col(f"__na_{v}")
        aggs.append(F.sum(F.when(nn, F.col(f"__swv_{v}"))).alias(f"sum_wv_{v}"))
        aggs.append(F.sum(F.when(nn, F.col(f"__nob_{v}"))).alias(f"nobs_{v}"))
    agg = exploded.groupBy(*group_vars, "__k").agg(*aggs)

    ws = (F.col("__k") * width).cast("long")
    we = ((F.col("__k") + 1) * width - 1).cast("long")
    out = [*(F.col(g) for g in group_vars), ws.alias("ws"), we.alias("we"),
           "xduration", "xminstart", "xmaxend"]
    for i, v in enumerate(value_vars):
        items = _items_for(i, "cs", "ce")
        st = _gapstate_fold(items, ws, we)
        out += [
            F.coalesce(F.col(f"sum_wv_{v}"), F.lit(0.0)).alias(f"sum_wv_{v}"),
            F.coalesce(F.col(f"nobs_{v}"), F.lit(0)).cast("long").alias(f"nobs_{v}"),
            st["prefix"].alias(f"prefix_{v}"),
            st["suffix"].alias(f"suffix_{v}"),
            st["best"].alias(f"best_{v}"),
        ]
    return agg.select(*out)


def _items_for(i: int, cs_field: str, ce_field: str) -> Column:
    """Coverage items for value var #i from the collected __rows array.
    NOTE: HOF lambdas must take exactly ONE parameter — a 2-arg lambda is
    given (element, index) by PySpark, which silently rebinds any
    default-arg closure trick."""
    nf, ibf = f"n{i}", f"ib{i}"

    def keep(r: Column) -> Column:
        return ~r[nf]

    def to_item(r: Column) -> Column:
        return F.struct(r[cs_field].alias("cs"), r[ce_field].alias("ce"), r[ibf].alias("ib"))

    return F.transform(F.filter(F.col("__rows"), keep), to_item)


def rollup_from_raw(
    x: DataFrame,
    width: int,
    value_vars: Sequence[str],
    group_vars: Sequence[str] = (),
    interval_vars: tuple[str, str] = ("start", "end"),
) -> DataFrame:
    """Tier-1: raw non-overlapping intervals → per-window state. One
    explode (fan-out ≈ interval_len/width + 1) + one aggregate; no join."""
    group_vars, value_vars = list(group_vars), list(value_vars)
    s, e = (F.col(interval_vars[0]).cast("long"), F.col(interval_vars[1]).cast("long"))
    k = F.explode(F.sequence(fdiv(s, width), fdiv(e, width))).alias("__k")
    base = x.select(*group_vars, *value_vars, s.alias("__xs"), e.alias("__xe"), k)
    ws = (F.col("__k") * width).cast("long")
    we = ((F.col("__k") + 1) * width - 1).cast("long")
    os_ = F.greatest(F.col("__xs"), ws)
    oe_ = F.least(F.col("__xe"), we)
    cols = [*group_vars, "__k", os_.alias("__os"), oe_.alias("__oe")]
    for v in value_vars:
        wt = oe_ - os_ + 1
        cols += [
            (wt * F.col(v)).alias(f"__swv_{v}"),
            wt.alias(f"__nob_{v}"),
            F.lit(0).cast("long").alias(f"__ib_{v}"),
            F.col(v).isNull().alias(f"__na_{v}"),
        ]
    return _state_agg(base.select(*cols), group_vars, value_vars, width)


def rollup_cascade(
    state: DataFrame,
    from_width: int,
    to_width: int,
    value_vars: Sequence[str],
    group_vars: Sequence[str] = (),
) -> DataFrame:
    """Tier-k → tier-(k+1): merge child states into parent windows.
    ``to_width`` must be a multiple of ``from_width`` (epoch-aligned tiling)."""
    if to_width % from_width:
        raise ValueError(f"{to_width} not a multiple of {from_width}: tiers must tile")
    group_vars, value_vars = list(group_vars), list(value_vars)
    k = fdiv(F.col("ws"), to_width).alias("__k")
    cols = [*group_vars, k, F.col("ws"), F.col("we"),
            F.col("xminstart").alias("__os_raw"), F.col("xmaxend").alias("__oe_raw"),
            "xduration"]
    ln = F.col("we") - F.col("ws") + 1
    for v in value_vars:
        # child coverage span for v: [ws+prefix, we-suffix]; all-gap child → NA item
        has_cov = F.col(f"prefix_{v}") < ln
        cols += [
            F.when(has_cov, F.col("ws") + F.col(f"prefix_{v}")).alias(f"__cs_{v}"),
            F.when(has_cov, F.col("we") - F.col(f"suffix_{v}")).alias(f"__ce_{v}"),
            F.col(f"best_{v}").alias(f"__ib_{v}"),
            (~has_cov).alias(f"__na_{v}"),
            F.col(f"sum_wv_{v}").alias(f"__swv_{v}"),
            F.col(f"nobs_{v}").alias(f"__nob_{v}"),
        ]
    child = state.select(*cols)
    # structural coverage span of the child (for xmin/xmax/os sort key):
    # xminstart/xmaxend already absolute; xduration adds linearly.
    # Reuse _state_agg by presenting the child's structural span as (os, oe)
    # — but xduration must ADD, not recompute, so aggregate it separately.
    null_fields = [f"n{i}" for i in range(len(value_vars))]
    row = F.struct(
        F.col("ws").alias("cs"), F.col("we").alias("ce"),
        *[F.col(f"__cs_{v}").alias(f"cs{i}") for i, v in enumerate(value_vars)],
        *[F.col(f"__ce_{v}").alias(f"ce{i}") for i, v in enumerate(value_vars)],
        *[F.col(f"__ib_{v}").alias(f"ib{i}") for i, v in enumerate(value_vars)],
        *[F.col(f"__na_{v}").alias(nf) for v, nf in zip(value_vars, null_fields)],
    )
    aggs = [
        F.sum("xduration").alias("xduration"),
        F.min("__os_raw").alias("xminstart"),
        F.max("__oe_raw").alias("xmaxend"),
        F.sort_array(F.collect_list(row)).alias("__rows"),
    ]
    for v in value_vars:
        aggs.append(F.sum(f"__swv_{v}").alias(f"sum_wv_{v}"))
        aggs.append(F.sum(f"__nob_{v}").alias(f"nobs_{v}"))
    agg = child.groupBy(*group_vars, "__k").agg(*aggs)

    ws = (F.col("__k") * to_width).cast("long")
    we = ((F.col("__k") + 1) * to_width - 1).cast("long")
    out = [*(F.col(g) for g in group_vars), ws.alias("ws"), we.alias("we"),
           "xduration", "xminstart", "xmaxend"]
    for i, v in enumerate(value_vars):
        items = _items_for(i, f"cs{i}", f"ce{i}")
        st = _gapstate_fold(items, ws, we)
        out += [
            F.coalesce(F.col(f"sum_wv_{v}"), F.lit(0.0)).alias(f"sum_wv_{v}"),
            F.coalesce(F.col(f"nobs_{v}"), F.lit(0)).cast("long").alias(f"nobs_{v}"),
            st["prefix"].alias(f"prefix_{v}"),
            st["suffix"].alias(f"suffix_{v}"),
            st["best"].alias(f"best_{v}"),
        ]
    return agg.select(*out)


def finalize(
    state: DataFrame,
    width: int,
    value_vars: Sequence[str],
    group_vars: Sequence[str] = (),
    required_percentage: float = 100.0,
    dense_lo: int | None = None,
    dense_hi: int | None = None,
    interval_vars_out: tuple[str, str] = ("start", "end"),
) -> DataFrame:
    """State → reference-semantics points, column-compatible with
    :func:`interval_average` output. With ``dense_lo/hi``, gap-fills every
    tier window in [lo, hi] for every key (unmatched-y rows:
    value NULL, xduration=0, nobs=0, maxgap=yduration)."""
    group_vars, value_vars = list(group_vars), list(value_vars)
    s_out, e_out = interval_vars_out
    if dense_lo is not None and dense_hi is not None:
        keys = state.select(*group_vars).distinct()
        grid = tier_grid(keys, dense_lo, dense_hi, width, "ws", "we")
        st = state
        for g in group_vars:
            st = st.withColumnRenamed(g, f"__f_{g}")
        st = st.withColumnRenamed("ws", "__f_ws").withColumnRenamed("we", "__f_we")
        cond = (grid["ws"] == st["__f_ws"]) & (grid["we"] == st["__f_we"])
        for g in group_vars:
            cond = grid[g].eqNullSafe(st[f"__f_{g}"]) & cond
        state = grid.join(st, cond, "left").drop(
            "__f_ws", "__f_we", *[f"__f_{g}" for g in group_vars]
        )
    ydur = (F.col("we") - F.col("ws") + 1).cast("long")
    out: list[Column] = [F.col(g) for g in group_vars]
    out += [F.col("ws").alias(s_out), F.col("we").alias(e_out)]
    for v in value_vars:
        nobs = F.coalesce(F.col(f"nobs_{v}"), F.lit(0))
        avg = F.col(f"sum_wv_{v}") / F.col(f"nobs_{v}")
        out.append(
            F.when(
                (nobs > 0)
                & (F.lit(100.0) * nobs / ydur >= F.lit(float(required_percentage))),
                avg,
            ).cast("double").alias(v)
        )
    out.append(ydur.alias("yduration"))
    out.append(F.coalesce(F.col("xduration"), F.lit(0)).cast("long").alias("xduration"))
    out += [
        F.coalesce(F.col(f"nobs_{v}"), F.lit(0)).cast("long").alias(f"nobs_{v}")
        for v in value_vars
    ]
    out += [F.col("xminstart"), F.col("xmaxend")]
    out += [
        F.coalesce(F.col(f"best_{v}"), ydur).cast("long").alias(f"maxgap_{v}")
        for v in value_vars
    ]
    return state.select(*out)
