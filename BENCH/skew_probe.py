"""Hot-CELL salting probe: manufacture the shape salting exists for — a
single (group, time-bucket) join cell holding a double-digit share of all
pair work — and measure plain vs uniform-salt vs hot-key-only salt.

The round-2 measurement (BENCH/NOTES.md) showed salting losing under mere
GROUP skew: the bucketed join key is (group, bucket), so a hot group
spread over many buckets is already parallel. This probe pins the hot
group inside ONE bucket (one crawl burst inside one retention window at
north-star shape), where the composite key cannot help and the cell's
candidate product lands on a single task.

Run: python BENCH/skew_probe.py [cores] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BUCKET_W = 120_000  # one bucket spans the whole hot burst (5000 y windows)
Y_W = 24            # y window width inside the bucket
HOT_X = 200_000     # hot-cell x rows → ~10^9 candidate combos in ONE task
COLD_DOMAINS = 31
COLD_X = 6_000      # per cold domain, spread over 10 buckets
SPAN_BUCKETS = 10


def build(spark):
    hot = spark.range(HOT_X).select(
        F.lit(0).alias("domain"),
        (F.col("id") % (BUCKET_W - 30)).alias("xs"),
        (F.col("id") % (BUCKET_W - 30) + 20).alias("xe"),
    )
    cold = spark.range(COLD_DOMAINS * COLD_X).select(
        (F.col("id") % COLD_DOMAINS + 1).alias("domain"),
        (F.col("id") * 37 % (SPAN_BUCKETS * BUCKET_W)).alias("xs"),
        (F.col("id") * 37 % (SPAN_BUCKETS * BUCKET_W) + 20).alias("xe"),
    )
    x = hot.unionByName(cold)
    doms = spark.range(COLD_DOMAINS + 1).select(F.col("id").alias("domain"))
    ks = spark.range(SPAN_BUCKETS * BUCKET_W // Y_W).select(
        (F.col("id") * Y_W).alias("ys"), (F.col("id") * Y_W + Y_W - 1).alias("ye")
    )
    y = doms.crossJoin(ks)
    return x, y


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from intervalaverage_spark.plans.rangejoin import range_join
    from intervalaverage_spark.session import get_spark

    spark = get_spark(app_name="skew-probe", master=f"local[{cores}]",
                      shuffle_partitions=str(2 * cores))
    # at 100 TB neither join side broadcasts — force the scale-
    # representative SortMergeJoin (a local-mode BHJ would spread the hot
    # cell across the stream side and mask the skew entirely)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    x, y = build(spark)
    x.write.mode("overwrite").parquet("/dev/shm/ia_skew_x")
    y.write.mode("overwrite").parquet("/dev/shm/ia_skew_y")
    x = spark.read.parquet("/dev/shm/ia_skew_x")
    y = spark.read.parquet("/dev/shm/ia_skew_y")
    xr = x.withColumnsRenamed({"domain": "xd"})

    def run(**kw) -> float:
        best = float("inf")
        n = None
        for _ in range(reps):
            # REBUILD the plan each rep: re-collecting the same DataFrame
            # object reuses its shuffle map outputs and times ~nothing
            j = range_join(xr, y, ("xs", "xe"), ("ys", "ye"),
                           group_vars={"xd": "domain"},
                           strategy="bucket", bucket_width=BUCKET_W, **kw)
            agg = j.groupBy("xd").agg(F.count(F.lit(1)).alias("n"))
            t0 = time.time()
            rows = agg.collect()
            best = min(best, time.time() - t0)
            n = sum(r["n"] for r in rows)
        return best, n

    variants = {
        "plain": {},
        "salt=8 uniform": {"salt": 8},
        "salt=8 hot-only": {"salt": 8, "hot_threshold": 10_000},
    }
    results = {}
    for name, kw in variants.items():
        results[name] = run(**kw)
        print(f"{name}: {results[name][0]:.2f}s pairs={results[name][1]}", flush=True)
    pair_counts = {v[1] for v in results.values()}
    print("pair-set size identical:", len(pair_counts) == 1)


if __name__ == "__main__":
    main()
