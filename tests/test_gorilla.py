"""Gorilla codec: round-trip fuzz + Spark segment encode/decode."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.gorilla import (
    decode_segments,
    encode_segments,
    gorilla_decode,
    gorilla_encode,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_fuzz(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 3000))
    ts = np.cumsum(rng.integers(0, 10000, n)) + 1704067200  # dups allowed
    vals = rng.normal(0, 1e6, n)
    vals[rng.random(n) < 0.15] = np.nan
    vals[rng.random(n) < 0.15] = 0.0
    blob = gorilla_encode(ts, vals)
    t2, v2 = gorilla_decode(blob)
    assert np.array_equal(ts, t2)
    assert np.array_equal(vals.view(np.uint64), v2.view(np.uint64))


def test_unsorted_rejected():
    with pytest.raises(ValueError):
        gorilla_encode(np.array([5, 3]), np.array([1.0, 2.0]))


def test_spark_segments_roundtrip(spark):
    rng = np.random.default_rng(3)
    rows = []
    for u in ("a", "b"):
        t = np.cumsum(rng.integers(60, 7200, 400)).astype(int)
        v = rng.normal(50, 10, 400)
        v[rng.random(400) < 0.1] = np.nan
        rows += [(u, int(tt), None if np.isnan(vv) else float(vv)) for tt, vv in zip(t, v)]
    pts = spark.createDataFrame(rows, "url string, t long, v double")
    segs = encode_segments(pts, ["url"], "t", "v", segment_width=86400)
    sp = segs.toPandas()
    assert (sp["codec"] == "gorilla-v1").all()
    assert sp["n_points"].sum() == len(rows)
    # decode returns the exact point set (NaN→null)
    back = decode_segments(segs, ["url"]).withColumn(
        "v", F.when(~F.isnan("v"), F.col("v"))
    )
    orig = pts.select("url", "t", "v")
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0
    # compression: blobs smaller than raw 16B/pt
    assert sp["blob"].map(len).sum() < 16 * len(rows)


def test_null_group_keys_survive_both_paths(spark):
    """pandas groupby's default dropna=True would silently lose points
    whose group key is null; both encode paths must keep them."""
    pts = spark.createDataFrame(
        [("a", 1, 1.0), (None, 2, 2.0), (None, 3, 3.0)],
        "url string, t long, v double",
    )
    for cp in (None, 5):
        segs = encode_segments(pts, ["url"], "t", "v", 86400, coarse_partitions=cp)
        assert segs.toPandas()["n_points"].sum() == 3, f"coarse_partitions={cp}"
        back = decode_segments(segs, ["url"])
        assert back.count() == 3
        assert back.filter("url IS NULL").count() == 2


def test_coarse_and_per_segment_paths_identical(spark):
    rng = np.random.default_rng(7)
    rows = []
    for u in ("a", "b", "c"):
        t = np.cumsum(rng.integers(60, 7200, 200)).astype(int)
        v = rng.normal(0, 5, 200)
        rows += [(u, int(tt), float(vv)) for tt, vv in zip(t, v)]
    pts = spark.createDataFrame(rows, "url string, t long, v double")
    per_seg = encode_segments(pts, ["url"], "t", "v", 86400, coarse_partitions=None)
    coarse = encode_segments(pts, ["url"], "t", "v", 86400, coarse_partitions=7)
    a = sorted(map(str, per_seg.collect()))
    b = sorted(map(str, coarse.collect()))
    assert a == b
