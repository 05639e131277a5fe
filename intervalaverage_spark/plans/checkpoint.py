"""Per-partition lineage + metrics checkpoints enabling exact resume.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The unit of resume is a *url-hash bucket*: every table in the
pipeline carries ``p = pmod(xxhash64(url), n_buckets)`` and is written
``partitionBy("p")``. For each bucket we record a LINEAGE row:

    p, input_fingerprint, input_rows, output_rows, out_checksum, tier

The input fingerprint is an order-insensitive pure-JVM aggregate: the SUM
of per-row xxhash64 reduced mod the largest 63-bit prime (DECIMAL
accumulation — ANSI-safe, no overflow, no Python). SUM, not bit_xor: XOR
cancels any pairwise-duplicated change (two identical new rows would
leave the fingerprint untouched), while a modular sum is duplicate-
sensitive. plan_resume additionally compares the recorded row count as a
second independent witness. On re-run, buckets whose (fingerprint, rows)
match the manifest are SKIPPED; only changed/new buckets recompute, and
dynamic partition overwrite rewrites exactly those directories. This replaces Structured
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


#: largest prime below 2^63 — fingerprint modulus (result fits LongType)
_FP_MOD = 9223372036854775783


def fingerprint_partitions(df: DataFrame, part_col: str = "p") -> DataFrame:
    """One row per bucket: (p, fingerprint, rows). Order-insensitive AND
    duplicate-sensitive (modular sum of row hashes; see module docstring)."""
    cols = [c for c in df.columns if c != part_col]
    h = F.xxhash64(*cols).cast("decimal(38,0)")
    return df.groupBy(part_col).agg(
        F.pmod(F.sum(h), F.lit(_FP_MOD).cast("decimal(38,0)"))
        .cast("long").alias("fingerprint"),
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
    """Compare bucket (fingerprint, row count) with the manifest.

    Both recorded witnesses must match for a skip — the row count catches
    any residual hash-collision class the modular sum might admit.
    Returns (todo_buckets, skipped_buckets) — driver-side lists; bucket
    counts are small (≤ thousands) by construction, so this collect is a
    metadata operation, not a data read."""
    old = manifest.filter(F.col("tier") == tier).select(
        F.col("p").alias("mp"),
        F.col("input_fingerprint").alias("mfp"),
        F.col("input_rows").alias("mrows"),
    )
    j = input_fps.join(old, input_fps["p"] == old["mp"], "left")
    rows = j.select("p", "fingerprint", "rows", "mfp", "mrows").collect()
    same = lambda r: r["mfp"] == r["fingerprint"] and r["mrows"] == r["rows"]  # noqa: E731
    todo = sorted(int(r["p"]) for r in rows if r["mfp"] is None or not same(r))
    skipped = sorted(int(r["p"]) for r in rows if r["mfp"] is not None and same(r))
    return todo, skipped


def vanished_buckets(input_fps: DataFrame, manifest: DataFrame, tier: str) -> list[int]:
    """Buckets recorded in the manifest whose input rows have vanished
    entirely (no fingerprint row this run). Their written tier partitions
    and manifest entries are stale and must be cleared — a bucket with
    zero input emits nothing, so without this anti-join it would silently
    keep serving old output."""
    old = manifest.filter(F.col("tier") == tier).select("p")
    gone = old.join(input_fps.select("p"), "p", "left_anti")
    return sorted(int(r["p"]) for r in gone.collect())


def delete_partition_dirs(spark: SparkSession, root: str, subdirs: Sequence[str]) -> None:
    """Remove partition directories (e.g. ``tier=1d/p=3``) through the
    Hadoop FileSystem API — filesystem-agnostic (local/HDFS/object store),
    driver-side metadata operation. Used to clear stale partitions of
    vanished buckets."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for sub in subdirs:
        p = jvm.org.apache.hadoop.fs.Path(os.path.join(root, sub))
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)


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
