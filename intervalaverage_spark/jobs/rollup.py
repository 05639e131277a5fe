"""The north-star job: web-page visits → observation intervals → 1h/1d/30d
tier states → finalized points (+ optional Gorilla segment blobs), with
per-partition lineage checkpoints and exact resume.

Run via ``spark-submit --py-files ia.zip -m intervalaverage_spark.jobs.rollup``
or programmatically through :func:`run_rollup`. Designed so every stage is
a shuffle on ``(p, …)`` where ``p = xxhash64(url) % n_buckets`` — the tier
cascade then never reshuffles across stages (url stays co-located), and a
bucket is the unit of both skew mitigation and resume.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from intervalaverage_spark.operators.tiers import (
    TIER_WIDTHS,
    finalize,
    rollup_cascade,
    rollup_from_raw,
)
from intervalaverage_spark.plans import checkpoint as ckpt
from intervalaverage_spark.sources.webts import observation_intervals

VALUE_VARS = ["text_bytes", "crawl_gap"]
GROUP_VARS = ["url", "lang"]


def run_rollup(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str | None = None,
    n_buckets: int = 32,
    tiers: Sequence[str] = ("1h", "1d", "30d"),
    resume: bool = True,
    unit: int = 1,
    strategy: str = "direct",
) -> dict:
    """Returns a metrics report. With ``out_root``, states are written
    partitioned by bucket with a lineage manifest; a re-run recomputes only
    buckets whose input fingerprint changed.

    ``strategy``:
      * ``"direct"`` (default) — every tier from the raw interval table.
        At web-crawl visit density the materialized hour-grid state is
        ~170× denser than raw (each ~9-day validity interval covers ~220
        hour windows), so cascading 1d from the 1h STATE shuffles two
        orders of magnitude more rows than re-aggregating raw (measured
        180 s vs 4.7 s at 60k pages / 8 cores).
      * ``"cascade"`` — each tier merged from the previous tier's state
        (rollup_cascade). Correct and REQUIRED when raw has aged out of
        retention and only a finer tier remains; exactness of
        cascade == direct == interval_average is property-tested."""
    t_start = time.time()
    report: dict = {"tiers": {}, "buckets": {"n": n_buckets}}

    x = observation_intervals(pages, unit=unit)
    x = ckpt.with_bucket(x, "url", n_buckets)

    todo = None  # None → everything
    vanished: list[int] = []
    manifest_rows: list[DataFrame] = []
    if out_root and resume:
        fps = ckpt.fingerprint_partitions(x).cache()
        manifest = ckpt.read_manifest(spark, out_root)
        todo, skipped = ckpt.plan_resume(fps, manifest, tier="input")
        # buckets whose input disappeared entirely emit no fingerprint row:
        # clear their stale tier partitions + manifest entries
        vanished = ckpt.vanished_buckets(fps, manifest, tier="input")
        if vanished:
            ckpt.delete_partition_dirs(
                spark, out_root,
                [f"tier={t}/p={b}" for t in tiers for b in vanished],
            )
        report["buckets"]["todo"] = len(todo)
        report["buckets"]["skipped"] = len(skipped)
        report["buckets"]["vanished"] = len(vanished)
        new_manifest = fps.select(
            F.lit("input").alias("tier"), "p",
            F.col("fingerprint").alias("input_fingerprint"),
            F.col("rows").alias("input_rows"),
            F.lit(None).cast("long").alias("output_rows"),
            F.lit(None).cast("long").alias("output_checksum"),
        )
        manifest_rows.append(new_manifest)
        if todo is not None:
            x = x.filter(F.col("p").isin(todo)) if todo else x.limit(0)

    widths = [TIER_WIDTHS[t] for t in tiers]
    for w0, w1 in zip(widths, widths[1:]):
        if w1 % w0:
            raise ValueError(f"tier widths must tile: {w0} → {w1}")

    if strategy not in ("direct", "cascade"):
        raise ValueError(f"unknown strategy {strategy!r}")
    prev_state: DataFrame | None = None
    total_points = 0
    for tier, width in zip(tiers, widths):
        t0 = time.time()
        if prev_state is None or strategy == "direct":
            state = rollup_from_raw(x, width, VALUE_VARS, [*GROUP_VARS, "p"])
        else:
            state = rollup_cascade(prev_state, prev_width, width, VALUE_VARS, [*GROUP_VARS, "p"])
        state = state.persist()
        n = state.count()
        total_points += n
        report["tiers"][tier] = {"points": n, "seconds": round(time.time() - t0, 3)}
        if out_root:
            path = os.path.join(out_root, f"tier={tier}")
            ckpt.write_partitioned(state, path, ("p",))
        if prev_state is not None:
            prev_state.unpersist()
        prev_state, prev_width = state, width

    if out_root and manifest_rows:
        merged = manifest_rows[0]
        old = ckpt.read_manifest(spark, out_root)
        keep_old = old.join(
            merged.select(F.col("tier").alias("t2"), F.col("p").alias("p2")),
            (old["tier"] == F.col("t2")) & (old["p"] == F.col("p2")),
            "left_anti",
        )
        if vanished:
            keep_old = keep_old.filter(~F.col("p").isin([int(b) for b in vanished]))
        ckpt.write_manifest(keep_old.unionByName(merged), out_root)

    if prev_state is not None:
        prev_state.unpersist()
    report["total_points"] = total_points
    report["wall_seconds"] = round(time.time() - t_start, 3)
    report["points_per_sec"] = round(total_points / max(report["wall_seconds"], 1e-9), 1)
    return report


def finalize_tier(
    spark: SparkSession,
    out_root: str,
    tier: str,
    required_percentage: float = 0.0,
) -> DataFrame:
    """Read a written tier state and materialize reference-semantics points."""
    state = spark.read.parquet(os.path.join(out_root, f"tier={tier}"))
    return finalize(
        state, TIER_WIDTHS[tier], VALUE_VARS, [*GROUP_VARS, "p"],
        required_percentage=required_percentage,
    )


def main() -> None:  # pragma: no cover — spark-submit entry
    from intervalaverage_spark.session import get_spark
    from intervalaverage_spark.sources.webts import synth_webpages

    spark = get_spark(app_name="ia-rollup")
    pages = synth_webpages(spark, n_pages=int(os.environ.get("IA_PAGES", "2000")))
    report = run_rollup(spark, pages, out_root=os.environ.get("IA_OUT"))
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
