"""Per-partition lineage + metrics checkpoints enabling exact resume.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The unit of resume is a *url-hash bucket*: every table in the
pipeline carries ``p = pmod(xxhash64(url), n_buckets)`` and is written
``partitionBy("p")``. For each bucket we record a LINEAGE row:

    p, input_fingerprint, input_rows, output_rows, out_checksum, tier

The input fingerprint is an order-insensitive pure-JVM aggregate
(bit_xor of per-row xxhash64 + count) — no overflow (ANSI-safe), no
Python. On re-run, buckets whose fingerprint matches the manifest are
SKIPPED; only changed/new buckets recompute, and dynamic partition
overwrite rewrites exactly those directories. This replaces Structured
Streaming checkpoints for the batch-incremental tier cascade (SURVEY §2.3:
watermarks are out of scope; resume-from-checkpoint replaces them).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "tier string, p long, input_fingerprint long, input_rows long, "
    "output_rows long, output_checksum long"
)


def with_bucket(df: DataFrame, key_col: str, n_buckets: int, out: str = "p") -> DataFrame:
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)))


def fingerprint_partitions(df: DataFrame, part_col: str = "p") -> DataFrame:
    """One row per bucket: (p, fingerprint, rows). Order-insensitive."""
    cols = [c for c in df.columns if c != part_col]
    return df.groupBy(part_col).agg(
        F.bit_xor(F.xxhash64(*cols)).alias("fingerprint"),
        F.count(F.lit(1)).alias("rows"),
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    mpath = os.path.join(path, "_lineage")
    try:
        return spark.read.parquet(mpath)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def write_manifest(manifest: DataFrame, path: str) -> None:
    # Manifest rows are per-bucket metadata (small by construction). The
    # merged plan may lazily READ the _lineage dir being overwritten, so
    # materialize on the driver first (read-then-overwrite-same-path).
    spark = manifest.sparkSession
    rows = manifest.collect()
    snap = spark.createDataFrame(rows, manifest.schema) if rows else spark.createDataFrame([], MANIFEST_SCHEMA)
    snap.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "_lineage"))


def plan_resume(
    input_fps: DataFrame,
    manifest: DataFrame,
    tier: str,
) -> tuple[list[int], list[int]]:
    """Compare bucket fingerprints with the manifest.

    Returns (todo_buckets, skipped_buckets) — driver-side lists; bucket
    counts are small (≤ thousands) by construction, so this collect is a
    metadata operation, not a data read."""
    old = manifest.filter(F.col("tier") == tier).select(
        F.col("p").alias("mp"), F.col("input_fingerprint").alias("mfp")
    )
    j = input_fps.join(old, input_fps["p"] == old["mp"], "left")
    rows = j.select("p", "fingerprint", "mfp").collect()
    todo = sorted(int(r["p"]) for r in rows if r["mfp"] is None or r["mfp"] != r["fingerprint"])
    skipped = sorted(int(r["p"]) for r in rows if r["mfp"] is not None and r["mfp"] == r["fingerprint"])
    return todo, skipped


def write_partitioned(
    df: DataFrame,
    path: str,
    part_cols: Sequence[str] = ("p",),
    dynamic: bool = True,
) -> None:
    """Partitioned parquet write; with ``dynamic``, only partitions present
    in ``df`` are overwritten (exact-resume rewrite granularity)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy(*part_cols).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
