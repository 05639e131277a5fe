"""Per-phase 1-vs-4-core scaling probe for the north-star rollup: which
phase caps the ratio? Times each tier write and the finalize+gorilla step
separately in a fresh JVM per (cores,) level.

Run: python BENCH/scale_phase_probe.py [pages]   (driver)
     python BENCH/scale_phase_probe.py --one <cores> <pages>  (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one(cores: int, pages: int) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from intervalaverage_spark.functions.gorilla import encode_segments
    from intervalaverage_spark.operators.tiers import TIER_WIDTHS, finalize, rollup_from_raw
    from intervalaverage_spark.session import get_spark
    from intervalaverage_spark.sources.webts import observation_intervals, synth_webpages

    spark = get_spark(app_name=f"phase-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=int(os.environ.get("IA_SP", "32")))
    vv, gv = ["text_bytes", "crawl_gap"], ["url", "lang"]
    tmp = tempfile.mkdtemp(prefix="ia_phase_", dir="/dev/shm")
    out: dict[str, float] = {}
    try:
        if os.environ.get("IA_PHASE_WARM") == "1":
            # JIT warm-up: identical plan shapes on a tiny input so the
            # timed phases measure steady-state execution, not the serial
            # per-JVM codegen compile (~5s, identical at both levels)
            wpages = synth_webpages(spark, n_pages=200, n_domains=4)
            wx0 = observation_intervals(wpages, unit=1)
            wx0.write.mode("overwrite").parquet(f"{tmp}/wx")
            wx = spark.read.parquet(f"{tmp}/wx")
            for tier in ("1h", "1d", "30d"):
                rollup_from_raw(wx, TIER_WIDTHS[tier], vv, gv).write.mode(
                    "overwrite").parquet(f"{tmp}/w_{tier}")
            wpts = finalize(spark.read.parquet(f"{tmp}/w_1d"), TIER_WIDTHS["1d"],
                            vv, gv, required_percentage=0)
            encode_segments(wpts.select(*gv, "start", "text_bytes"), gv, "start",
                            "text_bytes", 30 * 86400).write.mode(
                "overwrite").parquet(f"{tmp}/w_seg")
        pages_df = synth_webpages(spark, n_pages=pages, n_domains=max(pages // 50, 4))
        observation_intervals(pages_df, unit=1).write.mode("overwrite").parquet(f"{tmp}/x")
        x = spark.read.parquet(f"{tmp}/x")
        for tier in ("1h", "1d", "30d"):
            t0 = time.time()
            st = rollup_from_raw(x, TIER_WIDTHS[tier], vv, gv)
            st.write.mode("overwrite").parquet(f"{tmp}/t_{tier}")
            out[f"tier_{tier}"] = round(time.time() - t0, 2)
        t0 = time.time()
        pts = finalize(spark.read.parquet(f"{tmp}/t_1d"), TIER_WIDTHS["1d"], vv, gv,
                       required_percentage=0)
        enc = encode_segments(pts.select(*gv, "start", "text_bytes"),
                              gv, "start", "text_bytes", 30 * 86400)
        enc.write.mode("overwrite").parquet(f"{tmp}/seg")
        out["finalize_gorilla"] = round(time.time() - t0, 2)
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        one(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    res = {}
    for cores in (1, 4):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(cores), str(pages)],
            capture_output=True, text=True, check=True,
        )
        res[cores] = json.loads(p.stdout.strip().splitlines()[-1])
        print(cores, res[cores], flush=True)
    print("per-phase efficiency (t1 / (4*t4)):")
    for k in res[1]:
        print(f"  {k}: {res[1][k] / (4 * res[4][k]):.3f}  ({res[1][k]}s -> {res[4][k]}s)")


if __name__ == "__main__":
    main()
