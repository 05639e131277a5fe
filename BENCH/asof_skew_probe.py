"""Does the bucketed as-of path beat the flat window under hot-key skew?

Manufactured hot key: one key holds `hot_frac` of all left rows (a viral
url's crawl burst). The flat path runs that key's entire window in ONE
task; the bucketed path time-slices it across (key, bucket) windows plus
a bucket-granularity carry join. Equality of outputs is property-tested
in tests/test_asof_fill.py; this probe measures wall-clock only.

Run: python BENCH/asof_skew_probe.py [n_rows] [cores]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from intervalaverage_spark.operators.asof import asof_join
    from intervalaverage_spark.session import get_spark

    spark = get_spark(app_name="asof-skew", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    # 60% of rows on key 0, rest uniform over 5000 keys; times uniform
    # over ~12 days of seconds
    span = 1_000_000
    base = spark.range(n).select(
        F.when(F.rand(7) < 0.6, F.lit(0))
        .otherwise((F.rand(11) * 5000).cast("long")).alias("k"),
        (F.rand(13) * span).cast("long").alias("t"),
        F.rand(17).alias("lv"),
    )
    right = spark.range(n // 4).select(
        F.when(F.rand(19) < 0.6, F.lit(0))
        .otherwise((F.rand(23) * 5000).cast("long")).alias("k"),
        (F.rand(29) * span).cast("long").alias("t"),
        F.rand(31).alias("rv"),
    ).groupBy("k", "t").agg(F.max("rv").alias("rv"))
    base.write.mode("overwrite").parquet("/dev/shm/asof_l")
    right.write.mode("overwrite").parquet("/dev/shm/asof_r")
    l = spark.read.parquet("/dev/shm/asof_l")
    r = spark.read.parquet("/dev/shm/asof_r")

    for label, kw in [("flat", {}), ("bucketed_1d", {"bucket_width": 86_400})]:
        # warm
        asof_join(l.limit(1000), r.limit(1000), ["k"], "t", "t", ["rv"], **kw)\
            .write.format("noop").mode("overwrite").save()
        t0 = time.time()
        asof_join(l, r, ["k"], "t", "t", ["rv"], **kw)\
            .write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.time() - t0:.2f}s", flush=True)
    import shutil

    shutil.rmtree("/dev/shm/asof_l", ignore_errors=True)
    shutil.rmtree("/dev/shm/asof_r", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
