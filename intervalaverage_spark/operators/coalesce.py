"""Interval coalescing — merge overlapping/adjacent intervals per key.

The inverse companion of ``isolateoverlaps`` (operators/isolate.py):
where isolation fragments a self-overlapping set into atomic pieces,
coalescing fuses it into its minimal disjoint cover — the per-key union
of the intervals as a set of points. Classic gaps-and-islands:

  1. per key, sort by start; track the running max end seen so far
  2. a row starts a NEW island iff its start exceeds that running max
     by more than ``adjacency_gap`` + 1 (closed integer intervals:
     [1,3] and [4,7] touch, so gap 0 merges them; ``adjacency_gap=-1``
     restricts to true overlaps only)
  3. island id = running sum of the new-island flags; bounds = min/max
     per (key, island)

One window + one aggregate on the SAME key partitioning — a single
exchange, all whole-stage codegen, no join (the same plan shape as
operators/sessions.py, which is this operator on zero-length points).
The reference has no direct equivalent; its users build this from
``isolateoverlaps`` output — here it is one pass instead of
fragment+dedup+merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.operators.average import _from_int_days, _prep
from intervalaverage_spark.validation import check_schema


def interval_coalesce(
    x: DataFrame,
    interval_vars: Sequence[str],
    group_vars: Sequence[str] = (),
    interval_vars_out: tuple[str, str] = ("start", "end"),
    adjacency_gap: int = 0,
    sort: bool = True,
) -> DataFrame:
    """Minimal disjoint cover of each key's intervals.

    Output: ``(*group_vars, start, end, n_intervals, covered)`` — one row
    per merged island; ``n_intervals`` counts the source rows fused into
    it, ``covered`` is the TRUE union size in points (each row contributes
    only what lies beyond the running max end — overlaps never double
    count; with ``adjacency_gap=0`` covered == end−start+1 always, with
    gap>0 the difference is exactly the tolerated uncovered run). DATE
    intervals coerce/restore like every operator.

    ``adjacency_gap``: islands split where the uncovered run between a
    row and everything before it exceeds this many units (0 = touching
    intervals merge; -1 = only true overlaps merge).
    """
    iv, gv = list(interval_vars), list(group_vars)
    out_s, out_e = interval_vars_out
    is_date = check_schema(x, iv, gv, reserved_ok=True)
    if adjacency_gap < -1:
        raise ValueError(f"adjacency_gap must be >= -1, got {adjacency_gap}")
    xp = _prep(x, iv, "__s", "__e", gv, is_date)

    w = Window.partitionBy(*gv).orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (F.col("__s") > prev_max_end + 1 + adjacency_gap),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # per-row NEW coverage: points past the running max end (0 if fully
    # inside previous coverage) — sums to the exact union size
    contrib = F.greatest(
        F.lit(0).cast("long"),
        F.col("__e")
        - F.greatest(F.col("__s"), F.coalesce(prev_max_end + 1, F.col("__s")))
        + 1,
    )
    isl = xp.select(
        *gv, "__s", "__e",
        F.sum(new_island).over(run).alias("__island"),
        contrib.alias("__new_cov"),
    )
    agg = isl.groupBy(*gv, "__island").agg(
        F.min("__s").alias("__os"),
        F.max("__e").alias("__oe"),
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("__new_cov").alias("covered"),
    )
    s_col, e_col = F.col("__os"), F.col("__oe")
    if is_date:
        s_col, e_col = _from_int_days(s_col), _from_int_days(e_col)
    out = agg.select(
        *gv, s_col.alias(out_s), e_col.alias(out_e), "n_intervals", "covered"
    )
    return out.orderBy(*gv, out_s) if sort else out


def interval_gaps(
    x: DataFrame,
    interval_vars: Sequence[str],
    group_vars: Sequence[str] = (),
    interval_vars_out: tuple[str, str] = ("gap_start", "gap_end"),
    min_gap: int = 1,
    sort: bool = True,
) -> DataFrame:
    """Maximal uncovered runs INSIDE each key's interval span — the
    complement of :func:`interval_coalesce` within ``[min start,
    max end]`` per key (leading/trailing uncovered time has no
    domain to be measured against, so it is by definition not a gap).

    Output: ``(*group_vars, gap_start, gap_end, gap_len)`` — one row
    per uncovered run of at least ``min_gap`` points (closed integer
    intervals: the gap between [1,3] and [7,9] is [4,6], length 3).
    DATE intervals coerce/restore like every operator. Together with
    coalesce the result tiles the span: islands ∪ gaps partition
    ``[min start, max end]`` exactly (pytest-pinned).

    Same plan as coalesce MINUS the aggregate: one window over the
    key partitioning, then a filter — a gap exists exactly where a
    row starts beyond the running max end of everything before it,
    so the gap rows are the island-break rows themselves. No join,
    no second shuffle; per-key cost is one sorted scan (the same
    shape the reference's users would need `isolateoverlaps` + R
    post-processing for — here it is one pass).

    Typical timeseries-tier uses: sensor-coverage holes ("which
    hours have no readings?"), retention-ledger audit (uncovered
    time between checkpointed tiers), crawl-snapshot staleness runs.
    """
    iv, gv = list(interval_vars), list(group_vars)
    out_s, out_e = interval_vars_out
    is_date = check_schema(x, iv, gv, reserved_ok=True)
    if min_gap < 1:
        raise ValueError(f"min_gap must be >= 1, got {min_gap}")
    xp = _prep(x, iv, "__s", "__e", gv, is_date)

    w = Window.partitionBy(*gv).orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    g = xp.select(
        *gv,
        (prev_max_end + 1).alias("__gs"),
        (F.col("__s") - 1).alias("__ge"),
    ).where(
        F.col("__gs").isNotNull()
        & (F.col("__ge") - F.col("__gs") + 1 >= min_gap)
    )
    s_col, e_col = F.col("__gs"), F.col("__ge")
    if is_date:
        s_col, e_col = _from_int_days(s_col), _from_int_days(e_col)
    out = g.select(
        *gv,
        s_col.alias(out_s),
        e_col.alias(out_e),
        (F.col("__ge") - F.col("__gs") + 1).alias("gap_len"),
    )
    return out.orderBy(*gv, out_s) if sort else out


def interval_concurrency(
    x: DataFrame,
    interval_vars: Sequence[str],
    group_vars: Sequence[str] = (),
    interval_vars_out: tuple[str, str] = ("seg_start", "seg_end"),
    sort: bool = True,
) -> DataFrame:
    """Sweep-line concurrency profile: the step function "how many of
    this key's intervals are open at time t", as maximal constant-depth
    segments — the DEPTH member of the interval algebra (coalesce tells
    you covered-or-not; this tells you covered HOW MANY TIMES).

    Output: ``(*group_vars, seg_start, seg_end, n_open, seg_len)`` —
    one row per maximal run of constant depth ``n_open >= 1``; the
    segments of a key tile its coalesced islands exactly (uncovered
    time emits nothing), and adjacent segments always differ in depth
    (event points where openings exactly balance closings are dropped
    before the scan, so maximality is by construction). Closed integer
    intervals: [1,3] and [3,9] have depth 2 on [3,3]; DATE intervals
    coerce/restore like every operator. Duplicate rows are legal and
    count separately (depth is multiset coverage).

    Spark-first sweep line, no join and no iteration: each interval
    EXPLODES into two delta events (+1 at start, −1 at end+1 — one
    scan of the source, not a self-union), net deltas collapse per
    (key, t) and zero nets drop, then ONE key-partitioned window
    computes the running depth and each event's successor — prefix sum
    over ±1 events IS the sweep line. Plan shape: one explode (map
    side), one partial-aggregated exchange for the per-(key, t)
    collapse, one window sort; per-key cost is one sorted scan of its
    2× event points however long the history — the same scale story as
    coalesce/gaps, and the reason this is not the naive
    point-in-interval range join (which would shuffle x once per probe
    granularity).

    Typical web-crawl/timeseries uses: concurrent-fetch depth per host
    (politeness auditing), overlapping-session load per user, how many
    retention tiers cover an hour, max simultaneous validity versions.
    """
    iv, gv = list(interval_vars), list(group_vars)
    out_s, out_e = interval_vars_out
    is_date = check_schema(x, iv, gv, reserved_ok=True)
    xp = _prep(x, iv, "__s", "__e", gv, is_date)

    ev = xp.select(
        *gv,
        F.explode(
            F.array(
                F.struct(
                    F.col("__s").alias("t"),
                    F.lit(1).cast("long").alias("d"),
                ),
                F.struct(
                    (F.col("__e") + 1).alias("t"),
                    F.lit(-1).cast("long").alias("d"),
                ),
            )
        ).alias("__ev"),
    ).select(*gv, F.col("__ev.t").alias("__t"), F.col("__ev.d").alias("__d"))
    net = (
        ev.groupBy(*gv, "__t")
        .agg(F.sum("__d").alias("__delta"))
        .where(F.col("__delta") != 0)
    )
    w = Window.partitionBy(*gv).orderBy("__t")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    segs = net.select(
        *gv,
        "__t",
        F.sum("__delta").over(run).alias("__depth"),
        F.lead("__t").over(w).alias("__nt"),
    ).where(F.col("__depth") >= 1)
    # every depth>=1 event has a successor: deltas sum to 0 per key and
    # the maximal t (= max end + 1, never also a start) is pure −1, so
    # the last event row always carries depth 0
    s_col, e_col = F.col("__t"), F.col("__nt") - 1
    if is_date:
        s_col, e_col = _from_int_days(s_col), _from_int_days(e_col)
    out = segs.select(
        *gv,
        s_col.alias(out_s),
        e_col.alias(out_e),
        F.col("__depth").alias("n_open"),
        (F.col("__nt") - F.col("__t")).alias("seg_len"),
    )
    return out.orderBy(*gv, out_s) if sort else out
