"""Retention policy engine: metadata-only partition aging + safety rules."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.jobs.retention import (
    _list_day_dirs,
    apply_retention,
    validate_policies,
)
from intervalaverage_spark.operators.tiers import (
    TIER_WIDTHS,
    finalize,
    rollup_cascade,
    rollup_from_raw,
)
from intervalaverage_spark.plans.layout import DAY, write_tier
from intervalaverage_spark.sources.webts import T0, observation_intervals, synth_webpages

VV, GV = ["text_bytes", "crawl_gap"], ["url", "lang"]


@pytest.fixture(scope="module")
def tier_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tiers"))
    pages = synth_webpages(spark, n_pages=60, n_domains=5)
    x = observation_intervals(pages, unit=1)
    for tier in ("1h", "1d", "30d"):
        st = rollup_from_raw(x, TIER_WIDTHS[tier], VV, GV)
        write_tier(st, os.path.join(root, f"tier={tier}"), n_buckets=4)
    return root, x


def test_validate_policies_contracts():
    validate_policies({"1h": 7 * DAY, "1d": 90 * DAY, "30d": None})
    validate_policies({"1h": 7 * DAY, "1d": 7 * DAY})
    with pytest.raises(ValueError, match="non-monotone"):
        validate_policies({"1h": 90 * DAY, "1d": 7 * DAY})
    with pytest.raises(ValueError, match="non-monotone"):
        validate_policies({"1h": None, "1d": 7 * DAY})
    with pytest.raises(ValueError, match="unknown tiers"):
        validate_policies({"2h": DAY})
    with pytest.raises(ValueError, match="shorter than one"):
        validate_policies({"30d": DAY})


def test_dry_run_deletes_nothing(spark, tier_root):
    root, _ = tier_root
    before = _list_day_dirs(spark, os.path.join(root, "tier=1h"))
    now = T0 + 120 * DAY
    rep = apply_retention(spark, root, {"1h": 10 * DAY}, now, dry_run=True)
    assert rep["1h"]["dropped"]  # policy would drop something
    assert _list_day_dirs(spark, os.path.join(root, "tier=1h")) == before


def test_apply_retention_drops_only_aged_days(spark, tier_root):
    root, _ = tier_root
    now = T0 + 120 * DAY
    policies = {"1h": 30 * DAY, "1d": 60 * DAY, "30d": None}
    rep = apply_retention(spark, root, policies, now)
    for tier, keep in (("1h", 30 * DAY), ("1d", 60 * DAY)):
        days = _list_day_dirs(spark, os.path.join(root, f"tier={tier}"))
        assert days, tier
        width = TIER_WIDTHS[tier]
        horizon = now - keep
        # retain-at-least: every surviving day has a window reaching the horizon
        assert all((d + 1) * DAY + width - 2 >= horizon for d in days)
        assert all((d + 1) * DAY + width - 2 < horizon for d in rep[tier]["dropped"])
        # the report's kept count matches the surviving listing
        assert rep[tier]["kept"] == len(days)
    # forever tier untouched
    assert rep["30d"]["dropped"] == []
    # idempotent: a second run drops nothing new
    rep2 = apply_retention(spark, root, policies, now)
    assert rep2["1h"]["dropped"] == [] and rep2["1d"]["dropped"] == []


def test_cascade_from_retained_fine_tier_is_exact(spark, tier_root):
    """The lossless-retention claim: after 1h aged out, 30d points built by
    cascading the RETAINED 1d state equal a full recompute from raw, for
    every 30d window fully covered by retained 1d days."""
    root, x = tier_root
    st_1d = spark.read.parquet(os.path.join(root, "tier=1d")).drop("d", "p")
    casc = finalize(
        rollup_cascade(st_1d, TIER_WIDTHS["1d"], TIER_WIDTHS["30d"], VV, GV),
        TIER_WIDTHS["30d"], VV, GV, required_percentage=0,
    )
    direct = finalize(
        rollup_from_raw(x, TIER_WIDTHS["30d"], VV, GV),
        TIER_WIDTHS["30d"], VV, GV, required_percentage=0,
    )
    # retained-day coverage bound: only compare windows whose days survived
    lo_day = min(_list_day_dirs(spark, os.path.join(root, "tier=1d")))
    casc = casc.filter(F.col("start") >= lo_day * DAY)
    direct = direct.filter(F.col("start") >= lo_day * DAY)
    # collect-and-compare instead of exceptAll: joining these two deep
    # union+window+agg lineages in one plan trips a Catalyst internal
    # error (ATTRIBUTE_NOT_FOUND on a union-side attr) on Spark 4.1;
    # round-6 absorbs double Σ addition-order (integer stats stay exact)
    def r(df):
        out = df.select(
            *GV, "start", "end",
            *[F.round(F.col(v), 6).alias(v) for v in VV],
            *[F.col(f"nobs_{v}") for v in VV],
            *[F.col(f"maxgap_{v}") for v in VV],
        ).collect()
        return sorted(tuple(row) for row in out)

    assert r(casc) == r(direct)
