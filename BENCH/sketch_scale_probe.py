"""Sketch family at scale: constant-size relations, flat probe cost.

The claims under test (functions/bloom.py, cms.py, hll.py):
  1. BUILD cost is one corpus pass (linear in N) whose SHUFFLE is
     sketch-sized — the (word/counter/register) relation row count is
     bounded by the sketch geometry, NOT by N;
  2. PROBE cost for a FIXED 5k-key delta is flat in N (the broadcast
     bitset/matrix is a constant 1–2 MiB whatever the corpus);
  3. the relations actually stay at their bounds while N quadruples.

Protocol (one process, JIT paid by an untimed 20k warm-up leg; warm
timing = 2nd run, same policy as bench.py):
  for corpus sizes N ∈ {100k, 200k, 400k} synthetic docs:
    - bloom: build (m=2^22 bits, k=6) + broadcast-probe 5k delta fps;
    - cms:   build (4 × 2^16 counters) + broadcast-estimate the delta;
    - hll:   registers+estimate (b=12 → 4096 registers);
    - record relation row counts next to their geometric bounds.

Run on an IDLE host: python BENCH/sketch_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BM, BK = 1 << 22, 6
CW, CD = 1 << 16, 4
HB = 12
DELTA = 5000


def main() -> None:
    from intervalaverage_spark.functions.bloom import (
        bloom_build,
        bloom_probe_broadcast,
        bloom_words_to_array,
    )
    from intervalaverage_spark.functions.cms import (
        cms_build,
        cms_estimate_broadcast,
        cms_to_array,
    )
    from intervalaverage_spark.functions.hll import (
        hll_estimate,
        hll_registers,
    )
    from intervalaverage_spark.session import get_spark
    from intervalaverage_spark.sources.corpus import synth_corpus

    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      app_name="sketch_scale_probe")

    def fps_of(n_docs: int):
        return (synth_corpus(spark, n_docs)
                .select(F.md5("text").alias("fp")))

    def timed2(fn):
        """warm = 2nd run (bench.py policy); returns (cold, warm)."""
        out = []
        for _ in range(2):
            t0 = time.time()
            fn()
            out.append(round(time.time() - t0, 2))
        return out

    # untimed JIT warm-up leg
    w = fps_of(20000)
    bloom_build(w, "fp", BM, BK, seed="sp").write.format("noop") \
        .mode("overwrite").save()
    cms_build(w, "fp", CW, CD, seed="sp").write.format("noop") \
        .mode("overwrite").save()
    hll_estimate(hll_registers(w, "fp", HB, seed="sp"), HB).collect()

    delta = fps_of(DELTA).localCheckpoint()

    print(f"| N docs | bloom build s | bloom rows (≤{BM // 32}) "
          f"| bloom probe-5k s | cms build s | cms rows (≤{CW * CD}) "
          f"| cms est-5k s | hll sketch s | hll rows (≤{1 << HB}) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n in (100_000, 200_000, 400_000):
        fps = fps_of(n)

        _, bb = timed2(lambda: bloom_build(fps, "fp", BM, BK, seed="sp")
                       .write.format("noop").mode("overwrite").save())
        bw = bloom_build(fps, "fp", BM, BK, seed="sp")
        b_rows = bw.count()
        arr = bloom_words_to_array(bw, BM)
        _, bp = timed2(lambda: bloom_probe_broadcast(
            delta, "fp", arr, BM, BK, seed="sp")
            .write.format("noop").mode("overwrite").save())

        _, cb = timed2(lambda: cms_build(fps, "fp", CW, CD, seed="sp")
                       .write.format("noop").mode("overwrite").save())
        csk = cms_build(fps, "fp", CW, CD, seed="sp")
        c_rows = csk.count()
        mat = cms_to_array(csk, CW, CD)
        _, ce = timed2(lambda: cms_estimate_broadcast(
            delta, "fp", mat, CW, CD, seed="sp")
            .write.format("noop").mode("overwrite").save())

        _, hb = timed2(lambda: hll_estimate(
            hll_registers(fps, "fp", HB, seed="sp"), HB).collect())
        h_rows = hll_registers(fps, "fp", HB, seed="sp").count()

        print(f"| {n:,} | {bb} | {b_rows:,} | {bp} | {cb} | {c_rows:,} "
              f"| {ce} | {hb} | {h_rows:,} |")
        sys.stdout.flush()

    spark.stop()


if __name__ == "__main__":
    main()
