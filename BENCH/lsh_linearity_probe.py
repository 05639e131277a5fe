"""LSH end-to-end linearity sweep (one process) — round-6 third warm point.

Round 5 measured two warm points (100k, 200k: 2× docs = 1.90× time).
A 2-point line is a weak fit; this adds 400k so the linearity claim
rests on a 3-warm-point fit (the 50k leg exists only to pay the
one-time whole-stage-codegen JIT outside the measured points, same
cold/warm policy as bench.py).

Full pipeline per point: minhash-LSH (16 hashes, 8 bands, max_df=1000,
t=0.5) → exact verify → parquet sink, on the deterministic
planted-family corpus.

Run on an IDLE host: python BENCH/lsh_linearity_probe.py [sizes_csv]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from intervalaverage_spark.functions.dedup import minhash_lsh_pairs
    from intervalaverage_spark.session import get_spark
    from intervalaverage_spark.sources.corpus import synth_corpus

    sizes = [int(x) for x in (
        sys.argv[1].split(",") if len(sys.argv) > 1
        else ["50000", "100000", "200000", "400000"]
    )]
    spark = get_spark(app_name="lsh-linearity", master="local[32]",
                      shuffle_partitions=64)
    base = tempfile.mkdtemp(prefix="ia_lsh_lin_")
    rows = []
    try:
        for n in sizes:
            synth_corpus(spark, n).write.mode("overwrite").parquet(f"{base}/docs")
            docs = spark.read.parquet(f"{base}/docs")
            t0 = time.time()
            minhash_lsh_pairs(
                docs, "doc_id", "text", n=3, num_hashes=16, bands=8,
                threshold=0.5, max_df=1000,
            ).write.mode("overwrite").parquet(f"{base}/pairs")
            sec = time.time() - t0
            pairs = spark.read.parquet(f"{base}/pairs").count()
            rows.append((n, round(sec, 1), int(n / sec), pairs))
            print(f"n={n}: {sec:.1f}s  {n / sec:.0f} docs/s  {pairs} pairs",
                  flush=True)
        print("\n| n_docs | seconds | docs/sec | verified pairs |")
        print("|---|---|---|---|")
        for n, sec, dps, pairs in rows:
            label = f"{sec} (JIT-cold)" if n == sizes[0] else f"{sec}"
            print(f"| {n:,} | {label} | {dps:,} | {pairs:,} |")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
