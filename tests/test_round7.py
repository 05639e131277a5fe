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
