"""SparkSession factory tuned for this engine.

Defaults chosen for the sandbox (local[N], 32 cores) but every knob is the
one you would set on a real cluster: AQE on (skew-join splitting at scale),
Arrow enabled for the pandas-UDF stages, shuffle partitions sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "intervalaverage_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*] → cpu count; else fall back to cpus.
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if inner in ("", "*") else int(inner)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # Time-series shuffles here are compute-dense but hyper-compressible
        # (urls repeat run-length-wise after explode): AQE's size-based
        # coalescing collapses them to 1 reducer and serializes the heavy
        # window+aggregate (measured 20× slowdown). Keep AQE (skew-join
        # splitting) but size reducers by shuffle_partitions, not bytes.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet codec deliberately left at the Spark default (snappy):
        # a round-8 A/B on the 3-tier rollup write path first read as a
        # 16% lz4 win, but a warmed, interleaved re-run showed the four
        # codecs indistinguishable inside the ±0.5 s noise band
        # (BENCH/NOTES.md r8) — the original comparison was JVM-warmup
        # ordering bias. No knob without a reproducible win.
        .config("spark.sql.session.timeZone", "UTC")
        # closed-interval math is pure integer arithmetic; ANSI overflow
        # checking is correct behavior, keep Spark 4 default (true).
        # single-JVM local mode: do NOT oversize the heap. Measured on the
        # 3-tier rollup at local[32]: 12g → 27s, 64g → 93s (G1 with a huge
        # region count + 32 mutator threads thrashes; every phase 3-7×
        # slower). 12g comfortably fits 32 concurrent sort/agg tasks at the
        # bench scale; spills would show in the UI metrics if it didn't.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
