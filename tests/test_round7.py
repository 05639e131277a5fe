"""Round-7 regressions: the round-6 ADVICE items.

* DateType order column with ``limit`` in locf/nocb (Spark 3+/4 forbids
  date→numeric casts — ``unix_date`` epoch-days path, flat AND bucketed).
* Broadcast IVF assignment/probe guards: NULL / ragged / zero-norm
  vectors must degrade to NULL per row (matching the literal expression
  path) instead of crashing the Arrow batch.
* HALF_UP rounding in the broadcast GEMM path (``np.round`` is
  half-to-even; Spark ``F.round`` is HALF_UP — ties at the 6-dp boundary
  must agree).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.ann import (
    _round_half_up,
    assign_cells_broadcast,
    ivf_cells,
    probe_cells_broadcast,
)
from intervalaverage_spark.operators.fill import locf, nocb
from tests.conftest import rows

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------- DateType order + limit

def _date_frame(spark, vals):
    d0 = datetime.date(2024, 1, 1)
    data = [("a", d0 + datetime.timedelta(days=off), v) for off, v in vals]
    return spark.createDataFrame(data, "k string, d date, v double")


def test_locf_limit_date_order(spark):
    """r6 ADVICE: DateType order + limit must work (epoch-DAY units via
    unix_date), not throw DATATYPE_MISMATCH on a date→long cast."""
    df = _date_frame(spark, [(0, 1.0), (5, None), (20, None)])
    out = rows(locf(df, "d", ["v"], ["k"], limit=10), "d")
    assert [r["v_filled"] for r in out] == [1.0, 1.0, None]


def test_nocb_limit_date_order(spark):
    df = _date_frame(spark, [(0, None), (5, None), (20, None), (30, 9.0)])
    out = rows(nocb(df, "d", ["v"], ["k"], limit=10), "d")
    assert [r["v_filled"] for r in out] == [None, None, 9.0, 9.0]


def test_locf_limit_date_order_bucketed_equals_flat(spark):
    """The bucketed skew path long-izes the order column too — on
    DateType it must take the same unix_date route and match flat."""
    df = _date_frame(
        spark,
        [(0, 1.0), (3, None), (9, None), (11, 4.0), (14, None), (40, None)],
    )
    flat = rows(locf(df, "d", ["v"], ["k"], limit=10), "d")
    buck = rows(locf(df, "d", ["v"], ["k"], limit=10, bucket_width=7), "d")
    assert flat == buck
    assert [r["v_filled"] for r in flat] == [1.0, 1.0, 1.0, 4.0, 4.0, None]


# ------------------------------------- broadcast IVF NULL/zero-norm guard

def test_assign_cells_broadcast_null_and_zero_norm(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    _, cents = ivf_cells(e, "vec_id", "embedding", n_cells=4)
    dim = len(cents[0][1])
    bad = spark.createDataFrame(
        [
            (100001, None),                # NULL vector
            (100002, [0.0] * dim),         # zero norm
            (100003, [1.0] * (dim - 1)),   # ragged
        ],
        f"vec_id bigint, embedding array<double>",
    )
    mixed = e.select("vec_id", F.col("embedding").cast("array<double>")
                     .alias("embedding")).unionByName(bad)
    out = rows(assign_cells_broadcast(mixed, "embedding", cents), "vec_id")
    by_id = {r["vec_id"]: r["ivf_cell"] for r in out}
    assert by_id[100001] is None
    assert by_id[100002] is None
    assert by_id[100003] is None
    # the healthy rows still match the literal expression path
    lit, _ = ivf_cells(e, "vec_id", "embedding", n_cells=4)
    for r in rows(lit.select("vec_id", "ivf_cell"), "vec_id"):
        assert by_id[r["vec_id"]] == r["ivf_cell"]


def test_probe_cells_broadcast_null_guard(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    _, cents = ivf_cells(e, "vec_id", "embedding", n_cells=4)
    dim = len(cents[0][1])
    bad = spark.createDataFrame(
        [(200001, None), (200002, [0.0] * dim)],
        "vec_id bigint, embedding array<double>",
    )
    out = rows(
        bad.select("vec_id",
                   probe_cells_broadcast(bad, "embedding", cents, 2)
                   .alias("probes")),
        "vec_id",
    )
    assert all(r["probes"] is None for r in out)


# --------------------------------------------------- HALF_UP rounding

def test_round_half_up_matches_spark_round(spark):
    """Tie values at the 6-dp boundary: np.round gives half-to-even
    (0.1234565 → 0.123456); Spark F.round and _round_half_up give
    HALF_UP (→ 0.123457), away from zero for negatives."""
    import numpy as np

    vals = [0.1234565, -0.1234565, 0.9999995, -0.9999995, 0.5e-6, -0.5e-6]
    ours = [float(_round_half_up(np.float64(v))) for v in vals]
    spark_vals = (
        spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6).alias("r")).collect()
    )
    assert ours == [r["r"] for r in spark_vals]
    # and np.round genuinely differs on at least one of these ties —
    # i.e. the regression this guards is real
    assert any(float(np.round(v, 6)) != o for v, o in zip(vals, ours))


# --------------------------------------------- E44: cross-snapshot churn

def _snap_frame(spark):
    """2 keys × known payload runs: key 'a' = A A B B A (changes at rows
    1,3,5 of 5 — first, A→B, B→A); key 'b' = X X (one unchanged revisit);
    key 'c' = lone snapshot (excluded from stats at min_snapshots=2)."""
    t0 = datetime.datetime(2024, 1, 1)

    def ts(h):
        return t0 + datetime.timedelta(hours=h)

    data = [
        ("a", ts(0), "A"), ("a", ts(1), "A"), ("a", ts(2), "B"),
        ("a", ts(4), "B"), ("a", ts(8), "A"),
        ("b", ts(0), "X"), ("b", ts(3), "X"),
        ("c", ts(0), "Z"),
    ]
    return spark.createDataFrame(data, "k string, t timestamp, p string")


def test_snapshot_changes_known_answer(spark):
    from intervalaverage_spark.functions.churn import snapshot_changes

    out = rows(snapshot_changes(_snap_frame(spark), "k", "t", "p"), "k", "t")
    a = [(r["is_changed"], r["revisit_secs"]) for r in out if r["k"] == "a"]
    assert a == [(True, None), (False, 3600), (True, 3600),
                 (False, 7200), (True, 14400)]
    b = [(r["is_changed"], r["revisit_secs"]) for r in out if r["k"] == "b"]
    assert b == [(True, None), (False, 10800)]
    c = [(r["is_changed"], r["revisit_secs"]) for r in out if r["k"] == "c"]
    assert c == [(True, None)]


def test_snapshot_delta_filter_keeps_run_heads(spark):
    """filter(is_changed) = run-length compression: one row per run of
    identical consecutive payloads."""
    from intervalaverage_spark.functions.churn import snapshot_changes

    ch = snapshot_changes(_snap_frame(spark), "k", "t", "p")
    kept = rows(ch.filter(F.col("is_changed")), "k", "t")
    assert [(r["k"], r["t"].hour) for r in kept] == [
        ("a", 0), ("a", 2), ("a", 8), ("b", 0), ("c", 0)]


def test_churn_stats_known_answer(spark):
    from intervalaverage_spark.functions.churn import churn_stats

    out = rows(churn_stats(_snap_frame(spark), "k", "t", "p"), "k")
    assert [r["k"] for r in out] == ["a", "b"]  # 'c' below min_snapshots
    a, b = out
    assert (a["n_snapshots"], a["n_changes"], a["change_rate"]) == (5, 2, 0.5)
    assert a["avg_revisit_secs"] == pytest.approx((3600 + 3600 + 7200 + 14400) / 4)
    assert (b["n_snapshots"], b["n_changes"], b["change_rate"]) == (2, 0, 0.0)
    assert b["avg_revisit_secs"] == pytest.approx(10800.0)


def test_churn_single_shuffle_plan(spark):
    """The lag window and the per-key aggregate must share ONE
    hashpartitioning(key) exchange — churn's whole scale story."""
    from intervalaverage_spark.functions.churn import churn_stats

    plan = churn_stats(
        _snap_frame(spark), "k", "t", "p"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_snapshot_intervals_scd2(spark):
    """Runs of identical snapshots collapse to validity intervals; the
    next run's valid_from closes the previous (NULL = current version)."""
    from intervalaverage_spark.functions.churn import snapshot_intervals

    out = rows(
        snapshot_intervals(_snap_frame(spark), "k", "t", "p"),
        "k", "valid_from",
    )
    a = [(r["valid_from"].hour,
          None if r["valid_to"] is None else r["valid_to"].hour,
          r["last_seen"].hour, r["n_snapshots"])
         for r in out if r["k"] == "a"]
    # a: A@[0,1] -> B@[2,4] -> A@[8, open)
    assert a == [(0, 2, 1, 2), (2, 8, 4, 2), (8, None, 8, 1)]
    b = [(r["valid_from"].hour,
          None if r["valid_to"] is None else r["valid_to"].hour,
          r["n_snapshots"]) for r in out if r["k"] == "b"]
    assert b == [(0, None, 2)]


def test_snapshot_intervals_single_shuffle_plan(spark):
    """Change flags, run numbering, per-run agg, and the lead stitch all
    partition by the key — one exchange for the whole SCD-2 chain."""
    from intervalaverage_spark.functions.churn import snapshot_intervals

    plan = snapshot_intervals(
        _snap_frame(spark), "k", "t", "p"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------- E46: exact substring dup

def test_duplicated_span_stats_known_answer(spark):
    """Shared 8-gram across docs covers its span; overlapping duplicated
    spans UNION (never double-count); unique docs report 0."""
    from intervalaverage_spark.functions.substr import duplicated_span_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h x"),        # shares a..h with doc 2 @pos1
            (2, "z a b c d e f g h"),        # same gram @pos2
            (3, "q w e r t y u i o p"),      # unique
            (4, "a b c d e f g h i"),        # shares a..h AND b..i with 5
            (5, "a b c d e f g h i j"),
            (6, "short text"),               # < n tokens -> 0 grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           rows(duplicated_span_stats(docs, "doc_id", "text", n=8), "doc_id")}
    assert (out[1]["n_tokens"], out[1]["dup_tokens"]) == (9, 8)
    assert out[1]["dup_fraction"] == pytest.approx(round(8 / 9, 6))
    assert (out[2]["n_tokens"], out[2]["dup_tokens"]) == (9, 8)
    assert (out[3]["dup_tokens"], out[3]["dup_fraction"]) == (0, 0.0)
    # doc 4: spans [1,8] and [2,9] overlap -> union = 9, not 16
    assert (out[4]["n_tokens"], out[4]["dup_tokens"]) == (9, 9)
    assert out[4]["dup_fraction"] == pytest.approx(1.0)
    # doc 5: spans [1,8]+[2,9] of its 10 tokens -> 9/10
    assert (out[5]["n_tokens"], out[5]["dup_tokens"]) == (10, 9)
    assert (out[6]["n_tokens"], out[6]["dup_tokens"]) == (2, 0)


def test_duplicated_span_stats_min_docs(spark):
    """A gram repeated only WITHIN one doc never qualifies (min_docs
    counts distinct docs); raising min_docs prunes pair-only dups."""
    from intervalaverage_spark.functions.substr import duplicated_span_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h z a b c d e f g h"),  # internal repeat only
            (2, "p q r s t u v w"), (3, "p q r s t u v w"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["dup_tokens"] for r in
           rows(duplicated_span_stats(docs, "doc_id", "text", n=8), "doc_id")}
    assert out == {1: 0, 2: 8, 3: 8}
    out3 = {r["doc_id"]: r["dup_tokens"] for r in
            rows(duplicated_span_stats(docs, "doc_id", "text", n=8,
                                       min_docs=3), "doc_id")}
    assert out3 == {1: 0, 2: 0, 3: 0}


# --------------------------------------------- E47: streaming delta state

def _run_available_now(deltas, name):
    q = (deltas.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()


def test_streaming_snapshot_deltas_equals_batch(spark, tmp_path):
    """availableNow replay of the stream == batch snapshot_changes
    filtered to changed rows, row-for-row."""
    from intervalaverage_spark.functions.churn import snapshot_changes
    from intervalaverage_spark.streaming.churn_stream import (
        streaming_snapshot_deltas,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(d)
    src = spark.readStream.schema(ev.schema).parquet(d)
    _run_available_now(
        streaming_snapshot_deltas(src, "user_id", "ts", "props"),
        "t_stream_delta_eq",
    )
    got = {(r["key"], r["ts"], r["fingerprint"])
           for r in spark.table("t_stream_delta_eq").collect()}
    want = {(r["user_id"], r["ts"], r["fingerprint"])
            for r in snapshot_changes(ev, "user_id", "ts", "props")
            .filter(F.col("is_changed")).collect()}
    assert got == want and len(want) > 0


def test_streaming_snapshot_deltas_state_across_batches(spark, tmp_path):
    """State carries across micro-batches: unchanged at the batch
    boundary is dropped; a value that changes BACK is kept (the case
    dropDuplicatesWithinWatermark cannot express)."""
    import os as _os

    from intervalaverage_spark.streaming.churn_stream import (
        streaming_snapshot_deltas,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def ts(h):
        return t0 + datetime.timedelta(hours=h)

    schema = "user_id long, ts timestamp, props string"
    f1 = spark.createDataFrame(
        [(1, ts(0), "A"), (1, ts(1), "A"), (2, ts(0), "X"), (1, ts(2), "B")],
        schema)
    f2 = spark.createDataFrame(
        [(1, ts(3), "B"),   # unchanged across the boundary -> dropped
         (1, ts(4), "A"),   # changed BACK -> must be kept
         (2, ts(5), "Y")],  # changed -> kept
        schema)
    d = str(tmp_path / "snap")
    f1.coalesce(1).write.mode("overwrite").parquet(d)
    first = {f for f in _os.listdir(d) if f.endswith(".parquet")}
    f2.coalesce(1).write.mode("append").parquet(d)
    second = {f for f in _os.listdir(d)
              if f.endswith(".parquet")} - first
    # order file mtimes so the FileStreamSource replays f1's rows first
    for f in first:
        _os.utime(_os.path.join(d, f), (1700000000, 1700000000))
    for f in second:
        _os.utime(_os.path.join(d, f), (1700000100, 1700000100))
    src = (spark.readStream.schema(f1.schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false")
           .parquet(d))
    _run_available_now(
        streaming_snapshot_deltas(src, "user_id", "ts", "props"),
        "t_stream_delta_state",
    )
    got = sorted((r["key"], r["ts"].hour)
                 for r in spark.table("t_stream_delta_state").collect())
    assert got == [(1, 0), (1, 2), (1, 4), (2, 0), (2, 5)]
