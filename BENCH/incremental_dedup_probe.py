"""Incremental (delta) dedup cost: scales with the DELTA, not the corpus.

The claim under test (functions/dedup.py incremental_minhash_lsh_pairs):
ingesting a new crawl snapshot costs O(delta) — signing is per-new-doc,
candidate generation probes the persisted band index with the delta's
band keys (broadcast delta ⇒ the index side never shuffles), and the
exact verify touches only candidate docs.

Protocol (one process, JIT paid by a small warm-up leg):
  for corpus sizes N ∈ {100k, 200k}, with a FIXED 5k-doc delta:
    1. build + persist the index (stop list + band rows) from the
       N−5k base — the "previous ingest" cost, reported separately;
    2. time the DELTA ingest: sign 5k docs against the frozen stop
       list, probe the persisted index, exact-verify, sink pairs;
    3. time the FULL recompute (minhash_lsh_pairs over all N) — what
       the delta path avoids.
If the claim holds, (2) is roughly flat in N while (3) doubles.

Run on an IDLE host: python BENCH/incremental_dedup_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DELTA_DOCS = 5000  # FIXED-size delta: the claim is flat cost in corpus size


def main() -> None:
    from intervalaverage_spark.functions.dedup import (
        hot_shingles,
        incremental_minhash_lsh_pairs,
        minhash_band_index,
        minhash_lsh_pairs,
    )
    from intervalaverage_spark.session import get_spark
    from intervalaverage_spark.sources.corpus import synth_corpus

    sizes = [int(x) for x in (
        sys.argv[1].split(",") if len(sys.argv) > 1 else ["100000", "200000"]
    )]
    spark = get_spark(app_name="inc-dedup-probe", master="local[32]",
                      shuffle_partitions=64)
    base = tempfile.mkdtemp(prefix="ia_inc_probe_")
    rows = []
    try:
        # JIT warm-up: the full plan shapes on a 5k corpus (untimed result)
        synth_corpus(spark, 5000).write.mode("overwrite").parquet(f"{base}/w")
        wdocs = spark.read.parquet(f"{base}/w")
        minhash_lsh_pairs(wdocs, "doc_id", "text", n=3, num_hashes=16,
                          bands=8, threshold=0.5, max_df=1000
                          ).write.mode("overwrite").parquet(f"{base}/wp")

        for n in sizes:
            synth_corpus(spark, n).write.mode("overwrite").parquet(f"{base}/docs")
            corpus = spark.read.parquet(f"{base}/docs")
            pred = F.col("doc_id") % (n // DELTA_DOCS) == 0
            delta, old = corpus.filter(pred), corpus.filter(~pred)
            n_delta = DELTA_DOCS

            # 1. previous ingest: persist stop list + band index of the base
            t0 = time.time()
            hot_shingles(old, "doc_id", "text", n=3, max_df=1000
                         ).write.mode("overwrite").parquet(f"{base}/stop")
            stop = spark.read.parquet(f"{base}/stop")
            minhash_band_index(old, "doc_id", "text", n=3, num_hashes=16,
                               bands=8, stop_shingles=stop
                               ).write.mode("overwrite").parquet(f"{base}/idx")
            idx_sec = time.time() - t0
            index = spark.read.parquet(f"{base}/idx")

            # 2. the delta ingest (what a snapshot actually pays)
            t0 = time.time()
            pairs, new_bands = incremental_minhash_lsh_pairs(
                corpus, delta, index, "doc_id", "text", n=3, num_hashes=16,
                bands=8, threshold=0.5, stop_shingles=stop,
            )
            pairs.write.mode("overwrite").parquet(f"{base}/inc_pairs")
            # appending the delta's band rows completes the ingest
            new_bands.write.mode("append").parquet(f"{base}/idx")
            inc_sec = time.time() - t0
            inc_pairs = spark.read.parquet(f"{base}/inc_pairs").count()

            # 3. the full recompute the delta path avoids
            t0 = time.time()
            minhash_lsh_pairs(corpus, "doc_id", "text", n=3, num_hashes=16,
                              bands=8, threshold=0.5, max_df=1000
                              ).write.mode("overwrite").parquet(f"{base}/full")
            full_sec = time.time() - t0
            full_pairs = spark.read.parquet(f"{base}/full").count()

            rows.append((n, n_delta, round(idx_sec, 1), round(inc_sec, 1),
                         round(full_sec, 1), inc_pairs, full_pairs))
            print(f"n={n}: index {idx_sec:.1f}s, delta-ingest {inc_sec:.1f}s, "
                  f"full {full_sec:.1f}s, {inc_pairs} delta pairs "
                  f"/ {full_pairs} full pairs", flush=True)

        print("\n| corpus | delta | index build s | DELTA ingest s | "
              "full recompute s | speedup | delta pairs | full pairs |")
        print("|---|---|---|---|---|---|---|---|")
        for n, nd, i_s, d_s, f_s, ip, fp in rows:
            print(f"| {n:,} | {nd:,} | {i_s} | {d_s} | {f_s} | "
                  f"{f_s / d_s:.1f}× | {ip:,} | {fp:,} |")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
