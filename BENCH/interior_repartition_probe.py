"""Does the interior-explode path of rollup_from_raw parallelize?

The interior branch is a narrow projection: its task count = the raw
parquet's split count, and the explode amplifies ~len/width× — so a raw
table arriving in fewer splits than cores would serialize the dominant
write. MEASURED ANSWER (20k pages, clean host): it parallelizes fine in
the bench layout — the x table is written at the same parallelism that
reads it (32 shuffle files), tier_1h scales 1→4 cores at 0.98
(86.6s → 22.2s plain), and the round-robin `interior_partitions`
repartition LOSES 3.2× at 4 cores (71.6s): the extra exchange destroys
url clustering and the exploded writes lose run-length/dict locality.
The knob therefore stays default-None; an earlier probe that suggested
0.33 tier efficiency was contaminated by a concurrent job.

Run: python BENCH/interior_repartition_probe.py [pages]
     python BENCH/interior_repartition_probe.py --one <cores> <pages> <mode>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one(cores: int, pages: int, mode: str) -> None:
    from intervalaverage_spark.operators.tiers import TIER_WIDTHS, rollup_from_raw
    from intervalaverage_spark.session import get_spark
    from intervalaverage_spark.sources.webts import observation_intervals, synth_webpages

    spark = get_spark(app_name=f"int-{cores}-{mode}", master=f"local[{cores}]",
                      shuffle_partitions=32)
    vv, gv = ["text_bytes", "crawl_gap"], ["url", "lang"]
    tmp = tempfile.mkdtemp(prefix="ia_int_", dir="/dev/shm")
    try:
        pages_df = synth_webpages(spark, n_pages=pages, n_domains=max(pages // 50, 4))
        observation_intervals(pages_df, unit=1).write.mode("overwrite").parquet(f"{tmp}/x")
        x = spark.read.parquet(f"{tmp}/x")
        # warm JIT on a tiny slice
        rollup_from_raw(x.limit(500), TIER_WIDTHS["1h"], vv, gv).write.mode(
            "overwrite").parquet(f"{tmp}/w")
        kw = {"interior_partitions": 32} if mode == "repart" else {}
        t0 = time.time()
        rollup_from_raw(x, TIER_WIDTHS["1h"], vv, gv, **kw).write.mode(
            "overwrite").parquet(f"{tmp}/t")
        print(json.dumps({"seconds": round(time.time() - t0, 2),
                          "x_files": len([f for f in os.listdir(f"{tmp}/x")
                                          if f.endswith(".parquet")])}))
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        one(int(sys.argv[i + 1]), int(sys.argv[i + 2]), sys.argv[i + 3])
        return
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    for mode in ("plain", "repart"):
        for cores in (1, 4):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(cores),
                 str(pages), mode],
                capture_output=True, text=True, check=True,
            )
            print(mode, cores, p.stdout.strip().splitlines()[-1], flush=True)


if __name__ == "__main__":
    main()
