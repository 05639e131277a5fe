"""Do the bucketed rate/locf paths beat the flat window under hot-key
skew?

Manufactured hot key: one key holds `hot_frac` of all rows (a viral
url's series). The flat path runs that key's entire window in ONE task;
the bucketed path time-slices it across (key, bucket) windows plus a
1-row-per-bucket carry join. Equality of outputs is property-tested in
tests/test_property_hypothesis.py; this probe measures wall-clock only —
the asof crossover shape (BENCH/asof_skew_probe.py) generalized to the
round-4 operators.

Run: python BENCH/fill_skew_probe.py [n_rows] [cores]
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hot = float(sys.argv[3]) if len(sys.argv) > 3 else 0.9
    from intervalaverage_spark.operators.analytics import rate
    from intervalaverage_spark.operators.fill import locf
    from intervalaverage_spark.session import get_spark

    spark = get_spark(app_name="fill-skew", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    # `hot` fraction of rows on key 0, rest uniform over 5000 keys; unique
    # t per key via the row id; 30% NULL values so locf does real carrying
    span = 10_000_000
    base = spark.range(n).select(
        F.when(F.rand(7) < hot, F.lit(0))
        .otherwise((F.rand(11) * 5000).cast("long")).alias("k"),
        (F.col("id") % span).alias("t"),
        F.when(F.rand(13) < 0.3, F.lit(None).cast("double"))
        .otherwise(F.rand(17)).alias("v"),
    ).groupBy("k", "t").agg(F.max("v").alias("v"))
    base.write.mode("overwrite").parquet("/dev/shm/fill_skew")
    df = spark.read.parquet("/dev/shm/fill_skew")

    jobs = [
        ("rate flat", lambda: rate(df, "t", "v", ["k"])),
        ("rate bucketed", lambda: rate(df, "t", "v", ["k"], bucket_width=span // (8 * cores))),
        ("locf flat", lambda: locf(df, "t", ["v"], ["k"])),
        ("locf bucketed", lambda: locf(df, "t", ["v"], ["k"], bucket_width=span // (8 * cores))),
    ]
    for label, mk in jobs:
        mk().limit(1000).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.time() - t0:.2f}s", flush=True)
    shutil.rmtree("/dev/shm/fill_skew", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
