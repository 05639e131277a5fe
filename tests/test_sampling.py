"""Reproducible sampling / splits / per-key caps: determinism, growth
stability, rate accuracy, flat==salted cap equivalence, engine-portable
uniforms, error contracts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.sampling import (
    assign_splits,
    cap_per_key,
    deterministic_sample,
    md5_uniform,
)
from intervalaverage_spark.validation import IntervalSchemaError
from tests.conftest import rows


@pytest.fixture(scope="module")
def docs(spark):
    # 2000 ids over 4 "sources" with a hot one (source 0 holds 65%)
    d = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 < 65, F.lit("hot"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 100 % 3).cast("string")))
        .alias("source"),
        (F.pmod(F.xxhash64("id"), F.lit(1000))).alias("quality"),
    )
    return d.cache()


def test_md5_uniform_matches_duckdb(spark):
    out = rows(
        spark.range(50).select(
            F.col("id"),
            F.round(md5_uniform(["id"], seed="s1"), 12).alias("u"),
        ),
        "id",
    )
    dd = duckdb.sql(
        "SELECT i AS id, ROUND(CAST(('0x' || substr(md5(concat_ws(chr(31), "
        "'s1', CAST(i AS VARCHAR))), 1, 12)) AS BIGINT) "
        "/ 281474976710656.0, 12) AS u "
        "FROM range(50) t(i) ORDER BY i"
    ).fetchall()
    assert [(r["id"], r["u"]) for r in out] == [(i, u) for i, u in dd]


def test_sample_rate_and_determinism(spark, docs):
    kept = deterministic_sample(docs, 0.25, ["doc_id"], seed="a")
    n = kept.count()
    assert 0.20 * 2000 < n < 0.30 * 2000
    again = deterministic_sample(docs, 0.25, ["doc_id"], seed="a")
    assert kept.exceptAll(again).count() == 0
    # a different seed draws a genuinely different subset
    other = deterministic_sample(docs, 0.25, ["doc_id"], seed="b")
    assert kept.exceptAll(other).count() > 0
    # rate as a Column: stratified by source
    strat = deterministic_sample(
        docs, F.when(F.col("source") == "hot", 0.1).otherwise(0.9),
        ["doc_id"], seed="a")
    frac_hot = (strat.filter(F.col("source") == "hot").count()
                / docs.filter(F.col("source") == "hot").count())
    frac_rest = (strat.filter(F.col("source") != "hot").count()
                 / docs.filter(F.col("source") != "hot").count())
    assert frac_hot < 0.2 < 0.8 < frac_rest


def test_sample_is_growth_stable(spark):
    """A row's keep/drop decision must not change when the corpus grows —
    the property that makes incremental corpus refreshes reproducible."""
    small = spark.range(500).select(F.col("id").alias("doc_id"))
    big = spark.range(5000).select(F.col("id").alias("doc_id"))
    k_small = set(r["doc_id"] for r in
                  deterministic_sample(small, 0.3, ["doc_id"]).collect())
    k_big = set(r["doc_id"] for r in
                deterministic_sample(big, 0.3, ["doc_id"]).collect())
    assert k_small == {i for i in k_big if i < 500}


def test_assign_splits_partition_and_fractions(docs):
    out = assign_splits(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"], seed="sp")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # exactly one label per row
    assert 0.75 * 2000 < counts["train"] < 0.85 * 2000
    assert counts["val"] > 100 and counts["test"] > 100


def test_assign_splits_error_contracts(docs):
    with pytest.raises(IntervalSchemaError, match="sum to 1"):
        assign_splits(docs, {"a": 0.5, "b": 0.6}, ["doc_id"])
    with pytest.raises(IntervalSchemaError, match="positives"):
        assign_splits(docs, {"a": 1.5, "b": -0.5}, ["doc_id"])
    with pytest.raises(IntervalSchemaError, match="already exists"):
        assign_splits(docs, {"a": 1.0}, ["doc_id"], out_col="source")
    with pytest.raises(IntervalSchemaError, match="at least one"):
        deterministic_sample(docs, 0.5, [])


def test_cap_per_key_flat_eq_salted_and_bounds(docs):
    flat = cap_per_key(docs, ["source"], 40, ["doc_id"],
                       order_col="quality", descending=True)
    salted = cap_per_key(docs, ["source"], 40, ["doc_id"],
                         order_col="quality", descending=True, salt_buckets=8)
    assert flat.exceptAll(salted).count() == 0
    assert salted.exceptAll(flat).count() == 0
    assert flat.columns == docs.columns
    per = {r["source"]: r["n"] for r in
           flat.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 40 for v in per.values())
    assert per["hot"] == 40  # the hot source is actually capped
    # the kept hot rows ARE the 40 best by (quality desc, hash tiebreak)
    hot_q = sorted((r["quality"] for r in
                    docs.filter(F.col("source") == "hot").collect()),
                   reverse=True)
    kept_q = sorted((r["quality"] for r in
                     flat.filter(F.col("source") == "hot").collect()),
                    reverse=True)
    assert kept_q[0] == hot_q[0] and min(kept_q) >= hot_q[40]


def test_cap_per_key_random_mode_deterministic(docs):
    a = cap_per_key(docs, ["source"], 10, ["doc_id"], seed="z")
    b = cap_per_key(docs, ["source"], 10, ["doc_id"], seed="z",
                    salt_buckets=4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    with pytest.raises(IntervalSchemaError, match=">= 1"):
        cap_per_key(docs, ["source"], 0, ["doc_id"])
    with pytest.raises(IntervalSchemaError, match="missing column"):
        cap_per_key(docs, ["source"], 5, ["doc_id"], order_col="nope")
