"""interval_coalesce: union-cover properties, DuckDB differential,
adjacency semantics, DATE round-trip; sessionize cross-validated against
Spark's own native session_window."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.operators.coalesce import interval_coalesce
from intervalaverage_spark.operators.sessions import sessionize


@pytest.fixture(scope="module")
def iv(spark):
    rng = np.random.RandomState(23)
    n = 3000
    s = rng.randint(0, 5000, n)
    pdf = pd.DataFrame({
        "k": rng.randint(0, 12, n),
        "s": s,
        "e": s + rng.randint(0, 80, n),
    })
    return pdf, spark.createDataFrame(pdf)


def test_coalesce_matches_duckdb(iv):
    pdf, df = iv
    got = interval_coalesce(df, ("s", "e"), ["k"], sort=False).toPandas()
    con = duckdb.connect()
    con.register("ox", pdf)
    want = con.execute("""
      WITH w AS (
        SELECT k, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM ox),
      f AS (SELECT *, CASE WHEN pme IS NULL OR s > pme + 1 THEN 1 ELSE 0 END AS brk,
                   GREATEST(0, e - GREATEST(s, COALESCE(pme + 1, s)) + 1) AS newcov
            FROM w),
      i AS (SELECT *, SUM(brk) OVER (PARTITION BY k ORDER BY s, e
                                     ROWS UNBOUNDED PRECEDING) AS island FROM f)
      SELECT k, min(s) AS start, max(e) AS "end",
             COUNT(*) AS n_intervals, SUM(newcov) AS covered
      FROM i GROUP BY k, island
    """).df()
    g = got.sort_values(["k", "start"]).reset_index(drop=True)
    w = want.sort_values(["k", "start"]).reset_index(drop=True)
    assert len(g) == len(w)
    for c in ("start", "end", "n_intervals", "covered"):
        assert np.array_equal(g[c].astype(np.int64), w[c].astype(np.int64)), c


def test_coalesce_union_properties(iv):
    pdf, df = iv
    out = interval_coalesce(df, ("s", "e"), ["k"], sort=False).toPandas()
    for k, g in pdf.groupby("k"):
        # ground-truth union of covered points
        pts = set()
        for s, e in zip(g["s"], g["e"]):
            pts.update(range(s, e + 1))
        isl = out[out.k == k].sort_values("start")
        # islands disjoint with real gaps between them
        assert (isl["start"].to_numpy()[1:] - isl["end"].to_numpy()[:-1] > 1).all()
        # at gap=0, islands tile the union exactly and covered == length
        got_pts = set()
        for s, e in zip(isl["start"], isl["end"]):
            got_pts.update(range(s, e + 1))
        assert got_pts == pts
        assert (isl["covered"] == isl["end"] - isl["start"] + 1).all()
        assert isl["n_intervals"].sum() == len(g)


def test_coalesce_adjacency_gap_semantics(spark):
    pdf = pd.DataFrame({"k": [1] * 4, "s": [0, 4, 10, 30], "e": [3, 7, 20, 35]})
    df = spark.createDataFrame(pdf)
    # gap=0: [0,3]+[4,7] touch and merge
    r0 = interval_coalesce(df, ("s", "e"), ["k"]).toPandas()
    assert list(r0["start"]) == [0, 10, 30]
    # gap=-1: touching no longer merges (overlap-only)
    r1 = interval_coalesce(df, ("s", "e"), ["k"], adjacency_gap=-1).toPandas()
    assert list(r1["start"]) == [0, 4, 10, 30]
    # gap=2: [7]→[10] (run of 2 uncovered) merges; covered excludes the run
    r2 = interval_coalesce(df, ("s", "e"), ["k"], adjacency_gap=2).toPandas()
    assert list(r2["start"]) == [0, 30]
    row = r2[r2.start == 0].iloc[0]
    assert row["end"] == 20 and row["covered"] == 19  # 21 points minus the 2-run
    with pytest.raises(ValueError, match="adjacency_gap"):
        interval_coalesce(df, ("s", "e"), ["k"], adjacency_gap=-2)


def test_coalesce_date_domain_roundtrip(spark):
    pdf = pd.DataFrame({
        "k": [1, 1, 1],
        "s": pd.to_datetime(["2024-01-01", "2024-01-05", "2024-02-01"]).date,
        "e": pd.to_datetime(["2024-01-04", "2024-01-10", "2024-02-03"]).date,
    })
    df = spark.createDataFrame(pdf)
    out = interval_coalesce(df, ("s", "e"), ["k"]).toPandas()
    assert out["start"].tolist() == [pd.Timestamp("2024-01-01").date(),
                                     pd.Timestamp("2024-02-01").date()]
    assert out["end"].tolist() == [pd.Timestamp("2024-01-10").date(),
                                   pd.Timestamp("2024-02-03").date()]


def test_sessionize_matches_native_session_window(spark):
    """Cross-validate against Spark's OWN session_window aggregation in
    batch mode. Semantics differ at the boundary: session_window merges
    on diff < gap (strict), sessionize on diff <= gap — so compare
    sessionize(gap-1) with session_window(gap)."""
    rng = np.random.RandomState(31)
    n = 3000
    pdf = pd.DataFrame({
        "k": rng.randint(0, 10, n),
        "t": rng.randint(0, 200000, n),
    }).drop_duplicates()
    df = spark.createDataFrame(pdf).select(
        "k", F.timestamp_seconds("t").alias("ts"), "t")
    native = (
        df.groupBy("k", F.session_window("ts", "600 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("k", F.unix_timestamp("w.start").alias("session_start"),
                (F.unix_timestamp("w.end") - 600).alias("session_end"), "n")
        .toPandas().sort_values(["k", "session_start"]).reset_index(drop=True)
    )
    ours = (
        sessionize(df.select("k", "t"), "t", 599, ["k"])
        .groupBy("k", "session_id")
        .agg(F.min("t").alias("session_start"), F.max("t").alias("session_end"),
             F.count(F.lit(1)).alias("n"))
        .toPandas().sort_values(["k", "session_start"]).reset_index(drop=True)
    )
    assert len(native) == len(ours)
    for c in ("session_start", "session_end", "n"):
        assert np.array_equal(native[c].to_numpy(), ours[c].to_numpy()), c
