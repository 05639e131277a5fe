"""M4 / LTTB downsampling + gap sessionization tests."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.operators.downsample import (
    lttb,
    lttb_numpy,
    m4_cascade,
    m4_downsample,
)
from intervalaverage_spark.operators.sessions import session_bounds, sessionize
from intervalaverage_spark.validation import IntervalSchemaError


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.RandomState(3)
    n = 4000
    pdf = pd.DataFrame({
        "k": rng.randint(0, 8, n),
        "t": rng.randint(0, 100000, n),
        "v": rng.randn(n).round(6),
    }).drop_duplicates(["k", "t"])
    pdf.loc[rng.rand(len(pdf)) < 0.05, "v"] = np.nan
    return pdf, spark.createDataFrame(pdf)


def test_m4_matches_duckdb(series):
    pdf, df = series
    got = m4_downsample(df, "t", "v", 5000, ["k"]).toPandas()
    con = duckdb.connect()
    con.register("e", pdf)
    want = con.execute("""
        WITH a AS (
          SELECT k, CAST(floor(t/5000.0) AS BIGINT) AS bucket,
                 min(CASE WHEN v IS NOT NULL THEN struct_pack(t:=t, v:=v) END) AS f,
                 max(CASE WHEN v IS NOT NULL THEN struct_pack(t:=t, v:=v) END) AS l,
                 min(CASE WHEN v IS NOT NULL THEN struct_pack(v:=v, t:=t) END) AS mn,
                 max(CASE WHEN v IS NOT NULL THEN struct_pack(v:=v, t:=t) END) AS mx,
                 COUNT(*) AS n_points
          FROM e GROUP BY 1, 2)
        SELECT k, bucket, f.t AS t_first, f.v AS v_first, l.t AS t_last,
               l.v AS v_last, mn.t AS t_min, mn.v AS v_min,
               mx.t AS t_max, mx.v AS v_max, CAST(n_points AS BIGINT) AS n_points
        FROM a
    """).df()
    g = got.sort_values(["k", "bucket"]).reset_index(drop=True)
    w = want.sort_values(["k", "bucket"]).reset_index(drop=True)
    assert len(g) == len(w)
    for c in ("t_first", "v_first", "t_last", "v_last", "t_min", "v_min",
              "t_max", "v_max", "n_points"):
        assert np.allclose(g[c].astype(float).fillna(-9),
                           w[c].astype(float).fillna(-9)), c


def test_m4_minmax_envelope_property(series):
    # v_min/v_max must be the true per-bucket extrema of non-null values
    pdf, df = series
    got = m4_downsample(df, "t", "v", 5000, ["k"]).toPandas()
    p = pdf.dropna(subset=["v"]).copy()
    p["bucket"] = p["t"] // 5000
    ext = p.groupby(["k", "bucket"])["v"].agg(["min", "max"]).reset_index()
    m = got.merge(ext, on=["k", "bucket"], how="inner")
    assert np.allclose(m["v_min"], m["min"]) and np.allclose(m["v_max"], m["max"])


def test_m4_cascade_equals_direct(series):
    """The mergeable-state property: cascading 1000→5000-unit M4 levels
    equals computing the 5000-unit level from raw."""
    _, df = series
    fine = m4_downsample(df, "t", "v", 1000, ["k"])
    casc = m4_cascade(fine, 1000, 5000, ["k"]).toPandas().sort_values(
        ["k", "bucket"]).reset_index(drop=True)
    direct = m4_downsample(df, "t", "v", 5000, ["k"]).toPandas().sort_values(
        ["k", "bucket"]).reset_index(drop=True)
    assert len(casc) == len(direct)
    for c in direct.columns:
        assert np.allclose(casc[c].astype(float).fillna(-9),
                           direct[c].astype(float).fillna(-9)), c
    with pytest.raises(IntervalSchemaError, match="tile"):
        m4_cascade(fine, 1000, 1500, ["k"])
    with pytest.raises(IntervalSchemaError, match="missing M4 state"):
        m4_cascade(fine.drop("v_min"), 1000, 5000, ["k"])


def test_lttb_numpy_reference_properties():
    rng = np.random.RandomState(9)
    t = np.sort(rng.choice(100000, 5000, replace=False)).astype(float)
    v = np.cumsum(rng.randn(5000))
    idx = lttb_numpy(t, v, 200)
    assert len(idx) == 200
    assert idx[0] == 0 and idx[-1] == 4999
    assert (np.diff(idx) > 0).all()  # strictly increasing picks
    # a huge spike must survive a 25x downsample (the point of LTTB)
    v2 = v.copy()
    v2[2500] += 1000.0
    idx2 = lttb_numpy(t, v2, 200)
    assert 2500 in idx2


def test_lttb_spark_matches_numpy_per_key(series):
    pdf, df = series
    out = lttb(df, "t", "v", 50, ["k"]).toPandas()
    for k, g in pdf.dropna(subset=["v"]).groupby("k"):
        g = g.sort_values("t").reset_index(drop=True)
        idx = lttb_numpy(g["t"].to_numpy(float), g["v"].to_numpy(float), 50)
        want = g.iloc[idx]
        got = out[out.k == k].sort_values("t")
        assert np.array_equal(got["t"].to_numpy(), want["t"].to_numpy())
        assert np.allclose(got["v"].to_numpy(), want["v"].to_numpy())


def test_lttb_short_series_passthrough(spark):
    pdf = pd.DataFrame({"k": [1, 1], "t": [1, 2], "v": [1.0, 2.0]})
    out = lttb(spark.createDataFrame(pdf), "t", "v", 3, ["k"]).toPandas()
    assert len(out) == 2


def test_downsample_error_contracts(series):
    _, df = series
    with pytest.raises(IntervalSchemaError, match="missing"):
        m4_downsample(df, "nope", "v", 100, ["k"])
    with pytest.raises(IntervalSchemaError, match="positive"):
        m4_downsample(df, "t", "v", 0, ["k"])
    with pytest.raises(IntervalSchemaError, match="n_out"):
        lttb(df, "t", "v", 2, ["k"])
    with pytest.raises(IntervalSchemaError, match="group var"):
        lttb(df, "t", "v", 10, [])


@pytest.fixture(scope="module")
def ev(spark):
    rng = np.random.RandomState(17)
    n = 2500
    pdf = pd.DataFrame({
        "k": rng.randint(0, 10, n),
        "t": rng.randint(0, 50000, n),
        "v": rng.randn(n).round(6),
    })
    return pdf, spark.createDataFrame(pdf)


def test_sessionize_matches_pandas(ev):
    pdf, df = ev
    got = sessionize(df, "t", 300, ["k"]).toPandas().sort_values(
        ["k", "t"]).reset_index(drop=True)
    p = pdf.sort_values(["k", "t"]).reset_index(drop=True)
    brk = (p.groupby("k")["t"].diff().fillna(10**9) > 300).astype(int)
    want = brk.groupby(p["k"]).cumsum()
    assert np.array_equal(got["session_id"].to_numpy(), want.to_numpy())


def test_session_bounds_consistency(ev):
    pdf, df = ev
    b = session_bounds(df, "t", 300, ["k"], value_col="v").toPandas()
    # sessions tile the per-key stream: counts sum to rows, bounds nested,
    # consecutive sessions separated by > gap
    assert b["n_events"].sum() == len(pdf)
    assert (b["duration"] == b["session_end"] - b["session_start"] + 1).all()
    for k, g in b.groupby("k"):
        g = g.sort_values("session_id")
        assert (g["session_start"].to_numpy()[1:]
                - g["session_end"].to_numpy()[:-1] > 300).all()
    # value sums conserved
    assert np.isclose(b["sum_v"].sum(), pdf["v"].sum())


def test_sessionize_error_contracts(ev):
    _, df = ev
    with pytest.raises(IntervalSchemaError, match="missing"):
        sessionize(df, "nope", 10, ["k"])
    with pytest.raises(IntervalSchemaError, match="already exists"):
        sessionize(df.withColumn("session_id", F.lit(1)), "t", 10, ["k"])
    with pytest.raises(IntervalSchemaError, match="gap"):
        sessionize(df, "t", -1, ["k"])
