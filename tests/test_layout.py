"""Physical layout: (day × url-hash) partitioned tier tables must
partition-prune — the scan's plan carries PartitionFilters and reads only
the matching directories."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.operators.tiers import TIER_WIDTHS, rollup_from_raw
from intervalaverage_spark.plans.layout import DAY, read_tier, write_tier
from intervalaverage_spark.sources.webts import observation_intervals, synth_webpages


@pytest.fixture(scope="module")
def tier_path(spark):
    tmp = tempfile.mkdtemp(prefix="ia_layout_")
    pages = synth_webpages(spark, n_pages=60, n_domains=4)
    x = observation_intervals(pages, unit=1)
    st = rollup_from_raw(x, TIER_WIDTHS["1h"], ["text_bytes"], ["url", "lang"])
    write_tier(st, tmp, n_buckets=4)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_roundtrip_complete(spark, tier_path):
    full = read_tier(spark, tier_path)
    assert full.count() > 0
    assert {"d", "p"} <= set(full.columns)
    # d really is the window's day
    assert full.filter(F.col("d") != F.floor(F.col("ws") / DAY)).count() == 0


def test_time_range_prunes_partitions(spark, tier_path):
    full = read_tier(spark, tier_path)
    lo = full.agg(F.min("ws")).first()[0]
    pruned = read_tier(spark, tier_path, t_lo=lo, t_hi=lo + 3 * DAY)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "isnotnull(d" in plan.replace("#", "(")
    n_days_total = full.select("d").distinct().count()
    n_days_pruned = pruned.select("d").distinct().count()
    assert 0 < n_days_pruned <= 4 < n_days_total
    # pruned scan equals a post-filter of the full scan
    expected = full.filter((F.col("d") >= lo // DAY) & (F.col("d") <= (lo + 3 * DAY) // DAY))
    assert pruned.exceptAll(expected).count() == 0
    assert expected.exceptAll(pruned).count() == 0


def test_wide_tier_read_keeps_overlapping_windows(spark, tmp_path):
    """30d windows START before the day of t_lo but still cover it; the
    widened lower day bound must keep them (point semantics would not)."""
    w30 = TIER_WIDTHS["30d"]
    pages = synth_webpages(spark, n_pages=60, n_domains=4)
    x = observation_intervals(pages, unit=1)
    st = rollup_from_raw(x, w30, ["text_bytes"], ["url", "lang"])
    path = str(tmp_path / "t30")
    write_tier(st, path, n_buckets=2)

    ws0 = read_tier(spark, path).agg(F.min("ws")).first()[0]
    t_lo = ws0 + 10 * DAY  # inside the first 30d window, 10 days past its start
    wide = read_tier(spark, path, t_lo=t_lo, t_hi=t_lo + DAY, width=w30)
    assert wide.filter(F.col("ws") == ws0).count() > 0
    point = read_tier(spark, path, t_lo=t_lo, t_hi=t_lo + DAY)  # width=1
    assert point.filter(F.col("ws") == ws0).count() == 0


def test_bucket_prunes(spark, tier_path):
    b0 = read_tier(spark, tier_path, buckets=[0])
    assert b0.select("p").distinct().collect() == [b0.select("p").first()]
    assert b0.count() > 0


def test_dynamic_overwrite_is_partition_scoped(spark, tier_path):
    """Rewriting a single bucket's slice must not clobber other partitions."""
    full_before = read_tier(spark, tier_path).count()
    one = read_tier(spark, tier_path, buckets=[1])
    n_one = one.count()
    write_tier(one.drop("d"), tier_path, n_buckets=4)  # rewrite bucket 1 only
    assert read_tier(spark, tier_path).count() == full_before
    assert read_tier(spark, tier_path, buckets=[1]).count() == n_one


def test_ann_layouts_partition_prune(spark, tmp_path):
    """The ANN layout-as-index story made mechanical: embeddings written
    partitionBy(ivf_cell) / partitionBy(srp_b0) must answer probes with a
    PartitionFilters scan (only the probed directories listed) and return
    exactly the rows a post-filter of the full table returns."""
    from intervalaverage_spark.functions import ann

    vecs = [(i, [((i * 37 + d * 11) % 17 - 8) / 8.0 for d in range(16)])
            for i in range(80)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = vecs[0][1]

    # --- IVF layout
    assigned, cents = ann.ivf_cells(df, "vec_id", "embedding", n_cells=8)
    p_ivf = str(tmp_path / "ivf")
    assigned.write.partitionBy("ivf_cell").mode("overwrite").parquet(p_ivf)
    probes = ann.ivf_probe_cells(q, cents, nprobe=2)
    pruned = spark.read.parquet(p_ivf).filter(F.col("ivf_cell").isin(probes))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan
    got = sorted(r["vec_id"] for r in pruned.collect())
    exp = sorted(r["vec_id"] for r in assigned.filter(
        F.col("ivf_cell").isin(probes)).collect())
    assert got == exp and 0 < len(got) < len(vecs)

    # --- SRP layout (band-0 bucket as the partition key)
    eb = ann.with_srp_buckets(df, "embedding", dims=16, bands=1, planes=4)
    p_srp = str(tmp_path / "srp")
    eb.write.partitionBy("srp_b0").mode("overwrite").parquet(p_srp)
    qb = ann.srp_bucket_py(q, band=0, planes=4)
    pruned2 = spark.read.parquet(p_srp).filter(F.col("srp_b0") == qb)
    plan2 = pruned2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan2 and "srp_b0" in plan2
    got2 = sorted(r["vec_id"] for r in pruned2.collect())
    exp2 = sorted(r["vec_id"] for r in eb.filter(F.col("srp_b0") == qb).collect())
    assert got2 == exp2 and 0 < len(got2) < len(vecs)
