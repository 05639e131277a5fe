"""Benchmark harness — one JSON line on stdout.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the north-star workload: a deterministic
synthetic web-page table pushed through the full 1h→1d→30d tier cascade
(seconds domain). ``value`` = total bench seconds; extra fields report the
rollup's points/sec (the BASELINE.json metric). Results are forced with a
noop-format write (full execution, no driver collect).

Scaling evidence (local[8] vs local[32]) is produced by
``python bench.py --scaling`` → BENCH/BASELINE.md (see that file).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def _force(df) -> int:
    df = df.cache()
    n = df.count()
    df.unpersist()
    return n


def _bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from intervalaverage_spark import queries as q

    names = [
        "interval_average_events_daily",
        "tier_rollup_1d_events",
        "tier_rollup_30d_events_cascade",
        "interval_intersect_events_daily",
        "isolate_overlaps_orders",
        "dedup_exact_documents",
        "topk_cosine_embeddings",
    ]
    reg = q.queries()
    out = {}
    for name in names:
        t0 = time.time()
        reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def _bench_webts_rollup(spark, n_pages: int) -> tuple[float, int]:
    """North-star: synth pages → observation intervals → 1h→1d→30d tier
    states → finalized points + Gorilla segment blobs (the BASELINE.json
    metric job, end to end). Each tier is WRITTEN to parquet and the next
    tier read from it — the production write-through pattern. The input x
    table is materialized OUTSIDE the timed window (it is the source table,
    not the rollup). Returns (seconds, points)."""
    import shutil
    import tempfile

    from intervalaverage_spark.functions.gorilla import encode_segments
    from intervalaverage_spark.operators.tiers import (
        TIER_WIDTHS, finalize, rollup_cascade, rollup_from_raw,
    )
    from intervalaverage_spark.sources.webts import observation_intervals, synth_webpages

    pages = synth_webpages(spark, n_pages=n_pages, n_domains=max(n_pages // 50, 4))
    vv, gv = ["text_bytes", "crawl_gap"], ["url", "lang"]
    tmp = tempfile.mkdtemp(prefix="ia_bench_tiers_")
    widths = [TIER_WIDTHS[t] for t in ("1h", "1d", "30d")]
    try:
        observation_intervals(pages, unit=1).write.mode("overwrite").parquet(f"{tmp}/x")
        x = spark.read.parquet(f"{tmp}/x")

        t0 = time.time()
        total = 0
        prev = None
        for i, width in enumerate(widths):
            st = (rollup_from_raw(x, width, vv, gv) if prev is None
                  else rollup_cascade(prev, widths[i - 1], width, vv, gv))
            path = f"{tmp}/t{i}"
            st.write.mode("overwrite").parquet(path)
            prev = spark.read.parquet(path)
            total += prev.count()
        # finalized reference-semantics points at the 1d tier + Gorilla
        # segment blobs (30d segments per url/lang series) — both part of
        # the metric's job definition.
        pts = finalize(spark.read.parquet(f"{tmp}/t1"), widths[1], vv, gv,
                       required_percentage=0)
        enc = encode_segments(
            pts.select(*gv, "start", "text_bytes"),
            gv, "start", "text_bytes", 30 * 86400,
        )
        enc.write.mode("overwrite").parquet(f"{tmp}/seg")
        return time.time() - t0, total
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_once(cpus: int, sf_dir: str, n_pages: int, rollup_only: bool = False) -> dict:
    from intervalaverage_spark.session import get_spark

    # shuffle partitions pinned to 128 for every parallelism level: the
    # scaling comparison must run the IDENTICAL plan (same partition sizes),
    # varying only the executor-thread count — the sandbox stand-in for the
    # N vs 4N executor criterion. 128 (4× max threads) keeps each sort/agg
    # partition inside per-task execution memory at full concurrency —
    # measured: the 1h→1d cascade sort SPILLS at 32 partitions × 32 threads
    # (12g/32 tasks < partition working set), 2.4× slower.
    spark = get_spark(app_name=f"ia-bench-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=128)
    try:
        queries = {} if rollup_only else _bench_queries(spark, sf_dir)
        roll_s, roll_pts = _bench_webts_rollup(spark, n_pages)
        queries["webts_rollup_3tier"] = round(roll_s, 3)
        return {
            "queries": queries,
            "rollup_points": roll_pts,
            "rollup_points_per_sec": round(roll_pts / roll_s, 1),
        }
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("IA_BENCH_PAGES", "5000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if "--scaling" in sys.argv:
        # bigger deterministic input for the scaling comparison: the job
        # must be compute-dominated (per-stage fixed costs — codegen
        # compile, stage barriers — are identical at both levels and mask
        # true scaling on small inputs).
        n_pages = int(os.environ.get("IA_SCALE_PAGES", "25000"))
        res = {c: run_once(c, sf_dir, n_pages, rollup_only=True) for c in (8, 32)}
        t8 = res[8]["rollup_points_per_sec"]
        t32 = res[32]["rollup_points_per_sec"]
        eff = round((t32 / t8) / 4, 3)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(
                "# BENCH — scaling evidence (sandbox protocol)\n\n"
                "Same deterministic synthetic input (seeded webts, "
                f"{n_pages} pages), same job (1h→1d→30d tier cascade), two "
                "parallelism levels on this 32-core machine — the sandbox "
                "stand-in for N vs 4N executors (BASELINE.json north_rule; "
                "driver instruction).\n\n"
                "| config | rolled-up points | seconds | points/sec |\n|---|---|---|---|\n"
                f"| local[8]  | {res[8]['rollup_points']} | {res[8]['queries']['webts_rollup_3tier']} | {t8} |\n"
                f"| local[32] | {res[32]['rollup_points']} | {res[32]['queries']['webts_rollup_3tier']} | {t32} |\n\n"
                f"**Scaling efficiency (points/sec ratio ÷ 4): {eff}** "
                f"(target ≥ 0.8)\n\n"
                f"Headline query times at both levels:\n\n"
                f"```json\n{json.dumps({f'local[{c}]': r['queries'] for c, r in res.items()}, indent=2)}\n```\n"
            )
        print(json.dumps({"scaling_efficiency": eff,
                          "points_per_sec": {"local8": t8, "local32": t32}}))
        return

    t0 = time.time()
    r = run_once(cpus, sf_dir, n_pages)
    total = round(time.time() - t0, 3)
    print(json.dumps({
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": r["queries"],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rollup_points": r["rollup_points"],
        "rollup_points_per_sec": r["rollup_points_per_sec"],
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
