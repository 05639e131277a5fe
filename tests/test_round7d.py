"""Round-7 fourth wave: histogram quantile sketch (E61) + interval gaps (E62).

The histogram sketch is pinned three ways: a pure-python replay of the
bin/walk/interpolate arithmetic, the merge property (sketch of the
union == bin-wise sum of shard sketches — the distributed-aggregate
claim), and the ≤ one-bin-width error bound against exact percentiles.
Interval gaps are pinned by the tiling property: coalesced islands and
gaps together partition each key's span exactly.
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.quantiles import (
    hist_bin,
    hist_merge,
    hist_quantiles,
    hist_registers,
)
from intervalaverage_spark.operators.coalesce import (
    interval_coalesce,
    interval_gaps,
)
from intervalaverage_spark.validation import IntervalSchemaError
from tests.conftest import rows

LO, HI, BINS = 0.0, 100.0, 50  # width 2.0
QS = [0.0, 0.25, 0.5, 0.95, 1.0]


def py_hist_quantile(values, q, lo, hi, bins):
    """Reference replay of the sketch estimate, independent code path."""
    width = (hi - lo) / bins
    counts = {}
    for v in values:
        if v is None:
            continue
        b = min(bins - 1, max(0, math.floor((float(v) - lo) / width)))
        counts[b] = counts.get(b, 0) + 1
    n = sum(counts.values())
    target = q * float(n)
    cum = 0
    for b in sorted(counts):
        before, cum = cum, cum + counts[b]
        if float(cum) >= target:
            return round(lo + width * (b + (target - before) / counts[b]), 6)
    raise AssertionError("unreachable for q in [0, 1]")


@pytest.fixture(scope="module")
def vals(spark):
    """200 deterministic values with ties, a clamped outlier pair and a
    NULL — every edge the binning has."""
    data = [float((i * 37) % 97) + (i % 3) * 0.25 for i in range(197)]
    data += [-5.0, 250.0]  # below lo / above hi: clamp, never drop
    pyvals = list(data)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)] + [(999, None)], "id long, v double"
    )
    return df, pyvals


def test_hist_quantiles_match_python_replay(spark, vals):
    df, pyvals = vals
    sk = hist_registers(df, "v", LO, HI, BINS)
    got = {r["q"]: r["hist_est"]
           for r in rows(hist_quantiles(sk, QS, LO, HI, BINS), "q")}
    for q in QS:
        assert got[q] == py_hist_quantile(pyvals, q, LO, HI, BINS), q


def test_hist_null_excluded_and_n_points(spark, vals):
    df, pyvals = vals
    sk = hist_registers(df, "v", LO, HI, BINS)
    out = rows(hist_quantiles(sk, [0.5], LO, HI, BINS), "q")
    assert out[0]["n_points"] == len(pyvals)  # the NULL row is not counted
    assert sk.agg(F.sum("cnt")).first()[0] == len(pyvals)


def test_hist_merge_equals_union_sketch(spark, vals):
    df, _ = vals
    a, b = df.where("id % 2 = 0"), df.where("id % 2 = 1")
    merged = hist_merge(hist_registers(a, "v", LO, HI, BINS),
                        hist_registers(b, "v", LO, HI, BINS))
    whole = hist_registers(df, "v", LO, HI, BINS)
    assert rows(merged, "bin") == rows(whole, "bin")


def test_hist_error_bounded_by_bin_width(spark, vals):
    df, _ = vals
    width = (HI - LO) / BINS
    sk = hist_registers(df, "v", LO, HI, BINS)
    est = {r["q"]: r["hist_est"]
           for r in rows(hist_quantiles(sk, [0.25, 0.5, 0.95], LO, HI, BINS), "q")}
    exact = df.where("v IS NOT NULL AND v >= 0 AND v < 100").agg(
        F.percentile("v", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.95)))
    ).first()[0]
    # in-range values only: clamped outliers void the bound at the edges,
    # so compare against the in-range population's percentiles loosely
    for q, ex in zip([0.25, 0.5, 0.95], exact):
        assert abs(est[q] - ex) <= 2 * width + 1e-9, (q, est[q], ex)


def test_hist_clamping_saturates_edge_bins(spark, vals):
    df, _ = vals
    sk = rows(hist_registers(df.where("id >= 197"), "v", LO, HI, BINS), "bin")
    assert [(r["bin"], r["cnt"]) for r in sk] == [(0, 1), (BINS - 1, 1)]


def test_hist_grouped_sketches_are_independent(spark, vals):
    df, pyvals = vals
    g = df.withColumn("grp", F.pmod("id", F.lit(2)))
    sk = hist_registers(g, "v", LO, HI, BINS, group_cols=["grp"])
    out = hist_quantiles(sk, [0.5], LO, HI, BINS, group_cols=["grp"])
    got = {r["grp"]: r["hist_est"] for r in rows(out, "grp")}
    for grp in (0, 1):
        sub = [v for i, v in enumerate(pyvals) if i % 2 == grp]
        assert got[grp] == py_hist_quantile(sub, 0.5, LO, HI, BINS)


def test_hist_error_contracts(spark, vals):
    df, _ = vals
    with pytest.raises(IntervalSchemaError, match="hi > lo"):
        hist_registers(df, "v", 10.0, 10.0, 8)
    with pytest.raises(IntervalSchemaError, match="bins"):
        hist_registers(df, "v", 0.0, 1.0, 1)
    sk = hist_registers(df, "v", LO, HI, BINS)
    with pytest.raises(IntervalSchemaError, match="quantiles"):
        hist_quantiles(sk, [1.5], LO, HI, BINS)
    with pytest.raises(IntervalSchemaError):
        hist_bin(F.col("v"), 0.0, 1.0, 1 << 21)


@pytest.fixture(scope="module")
def ivx(spark):
    """Two keys: k=1 has gaps [4,6] and [13,13]; k=2 fully covered."""
    return spark.createDataFrame(
        [(1, 1, 3), (1, 2, 3), (1, 7, 9), (1, 8, 12), (1, 14, 15),
         (2, 0, 5), (2, 5, 9), (2, 10, 10)],
        "k long, s long, e long",
    )


def test_gaps_exact(spark, ivx):
    out = rows(interval_gaps(ivx, ("s", "e"), ["k"]), "k", "gap_start")
    assert [(r["k"], r["gap_start"], r["gap_end"], r["gap_len"]) for r in out] \
        == [(1, 4, 6, 3), (1, 13, 13, 1)]


def test_gaps_min_gap_filter(spark, ivx):
    out = rows(interval_gaps(ivx, ("s", "e"), ["k"], min_gap=2), "k")
    assert [(r["k"], r["gap_len"]) for r in out] == [(1, 3)]


def test_gaps_and_islands_tile_the_span(spark, ivx):
    """Coalesce ∪ gaps partition [min s, max e] per key exactly."""
    isl = rows(interval_coalesce(ivx, ("s", "e"), ["k"]), "k", "start")
    gaps = rows(interval_gaps(ivx, ("s", "e"), ["k"]), "k", "gap_start")
    for k in (1, 2):
        pieces = sorted(
            [(r["start"], r["end"]) for r in isl if r["k"] == k]
            + [(r["gap_start"], r["gap_end"]) for r in gaps if r["k"] == k]
        )
        span = (pieces[0][0], pieces[-1][1])
        pos = span[0]
        for s, e in pieces:
            assert s == pos and e >= s
            pos = e + 1
        assert pos == span[1] + 1


def test_gaps_date_intervals_round_trip(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01", "2024-01-03"), (1, "2024-01-10", "2024-01-12")],
        "k long, s string, e string",
    ).select("k", F.col("s").cast("date"), F.col("e").cast("date"))
    out = rows(interval_gaps(df, ("s", "e"), ["k"]))
    assert len(out) == 1
    assert str(out[0]["gap_start"]) == "2024-01-04"
    assert str(out[0]["gap_end"]) == "2024-01-09"
    assert out[0]["gap_len"] == 6


def test_gaps_error_contract(spark, ivx):
    with pytest.raises(ValueError, match="min_gap"):
        interval_gaps(ivx, ("s", "e"), ["k"], min_gap=0)


# ------------------------------------------ E63: streaming histogram

def test_streaming_hist_equals_batch_across_microbatches(spark, tmp_path):
    """Three parquet files streamed one per micro-batch
    (maxFilesPerTrigger=1): the complete-mode register table after the
    availableNow replay equals the batch fold over the union — the
    state store carried per-(group, bin) counts across batches."""
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_hist_registers,
    )

    src_dir = str(tmp_path / "hvals")
    for i in range(3):
        (spark.range(i * 300, (i + 1) * 300)
         .select((F.col("id") % 2).cast("string").alias("g"),
                 ((F.col("id") * 37 % 97) + 0.25).alias("v"))
         .coalesce(1).write.mode("append").parquet(src_dir))
    batch = spark.read.parquet(src_dir)
    want = rows(
        hist_registers(batch, "v", LO, HI, BINS, group_cols=["g"]),
        "g", "bin")

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    name = "t_stream_hist_regs"
    q = (streaming_hist_registers(stream, "v", LO, HI, BINS,
                                  group_cols=("g",))
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()
    # complete mode: at least 2 micro-batches actually ran
    assert q.lastProgress["batchId"] >= 1
    got = rows(spark.table(name), "g", "bin")
    assert got == want
    # state bounded by groups × bins, not stream length
    assert len(got) <= 2 * BINS


def test_streaming_hist_quantiles_equal_batch(spark, tmp_path):
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_hist_registers,
    )

    src_dir = str(tmp_path / "hvals2")
    (spark.range(2000)
     .select(((F.col("id") * 13 % 89) + 0.5).alias("v"))
     .coalesce(2).write.parquet(src_dir))
    batch = spark.read.parquet(src_dir)
    want = rows(hist_quantiles(
        hist_registers(batch, "v", LO, HI, BINS), QS, LO, HI, BINS), "q")

    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    name = "t_stream_hist_est"
    q = (streaming_hist_registers(stream, "v", LO, HI, BINS)
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()
    got = rows(hist_quantiles(spark.table(name), QS, LO, HI, BINS), "q")
    assert got == want


def test_streaming_hist_rejects_bad_geometry(spark):
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_hist_registers,
    )

    df = spark.range(1).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(IntervalSchemaError):
        streaming_hist_registers(df, "v", 5.0, 5.0, 10)
    with pytest.raises(IntervalSchemaError):
        streaming_hist_registers(df, "v", 0.0, 1.0, 1)
