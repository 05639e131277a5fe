"""Round-7 third wave: leakage-safe splits (E54).

Cluster-keyed train/val/test splits make near-dup straddling
structurally impossible; the naive doc-keyed split demonstrably leaks
on the same graph. Audited with split_straddle_pairs both ways.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.dedup import dedup_clusters
from intervalaverage_spark.functions.sampling import (
    assign_splits,
    leakage_safe_splits,
    split_straddle_pairs,
)
from tests.conftest import rows

W = {"train": 0.6, "val": 0.2, "test": 0.2}


@pytest.fixture(scope="module")
def clustered(spark):
    """60 docs; pairs chain 0-1-2, 10-11, and a 5-doc star around 20."""
    docs = spark.range(60).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)] + [(20, k) for k in (21, 22, 23, 24)],
        "id1 long, id2 long",
    )
    return docs, pairs, dedup_clusters(docs, pairs)


def test_cluster_members_share_split(spark, clustered):
    _, _, clusters = clustered
    out = leakage_safe_splits(clusters, W, seed="s7c")
    per = (out.groupBy("canonical_id")
           .agg(F.countDistinct("split").alias("n"))
           .agg(F.max("n")).first()[0])
    assert per == 1


def test_cluster_split_never_straddles(spark, clustered):
    _, pairs, clusters = clustered
    out = leakage_safe_splits(clusters, W, seed="s7c")
    assert split_straddle_pairs(pairs, out).count() == 0
    # and under ANY seed — the guarantee is structural, not a lucky hash
    for seed in ("a", "b", "zz"):
        alt = leakage_safe_splits(clusters, W, seed=seed)
        assert split_straddle_pairs(pairs, alt).count() == 0


def test_naive_split_leaks_on_same_graph(spark, clustered):
    """Doc-keyed splits DO straddle this graph (fixture chosen so at
    least one pair's endpoints hash across a boundary) — the
    contamination E54 exists to prevent, quantified by the audit."""
    docs, pairs, _ = clustered
    naive = assign_splits(docs, W, ["doc_id"], seed="s7c")
    leaked = split_straddle_pairs(pairs, naive)
    got = rows(leaked, "id1", "id2")
    assert len(got) > 0
    for r in got:
        assert r["split_1"] != r["split_2"]


def test_split_equals_assign_splits_on_canonical(spark, clustered):
    """leakage_safe_splits is exactly assign_splits keyed on the
    canonical id — pinned so the oracle SQL's CASE replay stays valid."""
    _, _, clusters = clustered
    a = rows(leakage_safe_splits(clusters, W, seed="s7c"), "doc_id")
    b = rows(assign_splits(clusters, W, ["canonical_id"], seed="s7c"),
             "doc_id")
    assert a == b


def test_singletons_keep_own_hash(spark, clustered):
    """A doc with no near-dups is its own cluster: its cluster split
    equals its naive split (canonical_id == doc_id)."""
    docs, _, clusters = clustered
    out = leakage_safe_splits(clusters, W, seed="s7c")
    naive = assign_splits(docs, W, ["doc_id"], seed="s7c",
                          out_col="naive_split")
    j = out.join(naive, "doc_id").filter(F.col("cluster_size") == 1)
    assert j.filter(F.col("split") != F.col("naive_split")).count() == 0
    assert j.count() == 60 - 10  # 3 + 2 + 5 clustered docs
