"""Skew mitigation: the salted range join must return the identical pair
set under a genuinely hot key (webts domain 0 is hot by construction —
sources/webts.py Zipf-ish domain assignment)."""

from __future__ import annotations

from pyspark.sql import functions as F

from intervalaverage_spark.operators.average import interval_average
from intervalaverage_spark.operators.grid import tier_grid
from intervalaverage_spark.plans.rangejoin import range_join
from intervalaverage_spark.sources.webts import observation_intervals, synth_webpages


def _hot_intervals(spark, n_pages=300):
    pages = synth_webpages(spark, n_pages=n_pages, n_domains=10, seed=11)
    x = observation_intervals(pages, unit=3600)  # hour units
    # group on DOMAIN (not url) so domain 0 concentrates a large share of
    # rows on one join key — the shape salting exists for
    dom = F.regexp_extract("url", r"https://d(\d+)\.", 1).cast("long")
    return x.select(dom.alias("domain"), "start", "end", "text_bytes")


def test_salted_range_join_pairs_identical(spark):
    x = _hot_intervals(spark)
    top = x.groupBy("domain").count().orderBy(F.desc("count")).first()
    assert top["domain"] == 0 and top["count"] > x.count() / 4  # skew is real

    lohi = x.agg(F.min("start").alias("lo"), F.max("end").alias("hi")).first()
    y = tier_grid(x.select("domain").distinct(), lohi["lo"], lohi["hi"], 24)
    xr = x.withColumnsRenamed({"start": "xs", "end": "xe", "domain": "xd"})

    def pairs(**kw):
        out = range_join(
            xr, y.withColumnsRenamed({"start": "ys", "end": "ye"}),
            ("xs", "xe"), ("ys", "ye"), group_vars={"xd": "domain"},
            strategy="bucket", bucket_width=24, **kw,
        )
        return sorted(map(tuple, out.select("xd", "xs", "xe", "ys", "ye").collect()))

    base = pairs()
    assert base == pairs(salt=8) != []
    # hot-key-only salting: same pair set whether the threshold catches
    # just the hot domain, every domain, or none
    n_hot = x.filter(F.col("domain") == 0).count()
    assert base == pairs(salt=8, hot_threshold=n_hot - 1)   # only domain 0 salted
    assert base == pairs(salt=8, hot_threshold=0)           # all keys salted
    assert base == pairs(salt=8, hot_threshold=10**9)       # no key salted


def test_salted_interval_average_identical(spark):
    from pyspark.sql import Window

    raw = _hot_intervals(spark)
    # interval_average needs NON-overlapping x per group: renumber each
    # domain's intervals onto disjoint 32-unit slots (per-key row counts —
    # the skew — are preserved exactly)
    w = Window.partitionBy("domain").orderBy("start", "end", "text_bytes")
    i = F.row_number().over(w).cast("long")
    x = raw.select(
        "domain",
        (i * 32).alias("start"),
        (i * 32 + F.least(F.col("end") - F.col("start"), F.lit(31))).alias("end"),
        "text_bytes",
    )
    lohi = x.agg(F.min("start").alias("lo"), F.max("end").alias("hi")).first()
    y = tier_grid(x.select("domain").distinct(), lohi["lo"], lohi["hi"], 24)
    kw = dict(
        interval_vars=("start", "end"), value_vars=["text_bytes"],
        group_vars=["domain"], required_percentage=0, validate=False,
        strategy="bucket", bucket_width=24,
    )
    a = sorted(map(tuple, interval_average(x, y, **kw).collect()))
    for extra in (dict(salt=8), dict(salt=8, hot_threshold=50)):
        b = sorted(map(tuple, interval_average(x, y, **extra, **kw).collect()))
        assert len(a) == len(b) > 0
        for ra, rb in zip(a, b):
            for va, vb in zip(ra, rb):
                if isinstance(va, float):
                    assert abs(va - vb) < 1e-9
                else:
                    assert va == vb


def test_estimate_bucket_width_deterministic_across_layouts(spark):
    """The width sample is hash-based, so the SAME rows in a DIFFERENT
    physical order/partitioning must choose the SAME width (repeated jobs
    compile byte-identical plans)."""
    from intervalaverage_spark.plans.rangejoin import estimate_bucket_width

    x = _hot_intervals(spark)
    w1 = estimate_bucket_width(x, "start", "end")
    w2 = estimate_bucket_width(x.repartition(7, "domain"), "start", "end")
    w3 = estimate_bucket_width(x.orderBy(F.desc("end")), "start", "end")
    assert w1 == w2 == w3 >= 1
