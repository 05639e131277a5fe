"""IVF centroid scaling: cell-occupancy histogram + literal-vs-broadcast
assignment crossover on the 200k-vector deterministic embedding table.

Two questions from the round-5 verdict (#4):

1. **Occupancy** — the deterministic lowest-id "centroids" are SAMPLED,
   not trained; how unbalanced do cells get at n_cells = 16 (the fixture
   setting) and n_cells ≈ √n (what a 200k table would really use)?
   Reported as min/median/max cell size and the top-5 cells.
2. **Crossover** — the literal-expression assignment is O(n_cells)
   interpreted cosine folds per row; the broadcast path is one numpy
   GEMM per Arrow batch. Where does broadcast start winning? Timed
   assignment-only (withColumn + noop write) at n_cells ∈ {16, 64, 256}
   for both paths (+1024 broadcast-only: 1024 struct literals stops
   being a sane plan, which is the point).

Also spot-checks broadcast == literal assignment at n_cells=64
(count of disagreeing rows must be 0).

Run on an IDLE host: python BENCH/ivf_broadcast_probe.py [n_vecs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def occupancy(assigned) -> str:
    counts = [int(r["count"]) for r in
              assigned.groupBy("ivf_cell").count().collect()]
    counts.sort()
    mid = counts[len(counts) // 2]
    top = ", ".join(str(c) for c in counts[-5:][::-1])
    return (f"cells={len(counts)} min={counts[0]} median={mid} "
            f"max={counts[-1]} top5=[{top}]")


def main() -> None:
    from intervalaverage_spark.functions.ann import ivf_cells
    from intervalaverage_spark.session import get_spark
    from intervalaverage_spark.sources.corpus import synth_embeddings

    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="ivf-broadcast-probe", master="local[32]",
                      shuffle_partitions=32)
    base = tempfile.mkdtemp(prefix="ia_ivf_probe_")
    try:
        synth_embeddings(spark, n_vecs).write.mode("overwrite").parquet(
            f"{base}/vecs")
        vecs = spark.read.parquet(f"{base}/vecs")

        # --- occupancy at the fixture setting and at ~sqrt(n)
        sqrt_cells = max(int(n_vecs ** 0.5), 16)
        for nc, method in ((16, "literal"), (sqrt_cells, "broadcast")):
            assigned, _ = ivf_cells(vecs, "vec_id", "embedding",
                                    n_cells=nc, method=method)
            print(f"occupancy n_cells={nc} ({method}): {occupancy(assigned)}",
                  flush=True)

        # --- equality spot check (the pytest pins 16 cells; this is 64)
        lit, _ = ivf_cells(vecs, "vec_id", "embedding", 64)
        bro, _ = ivf_cells(vecs, "vec_id", "embedding", 64, method="broadcast")
        diff = (
            lit.select("vec_id", F.col("ivf_cell").alias("a"))
            .join(bro.select("vec_id", F.col("ivf_cell").alias("b")), "vec_id")
            .filter(F.col("a") != F.col("b")).count()
        )
        print(f"broadcast-vs-literal disagreements at n_cells=64: {diff}")
        assert diff == 0, "broadcast assignment diverged from literal"

        # --- recall at the sqrt(n) regime (broadcast assignment): sampled
        # queries, IVF(nprobe) top-10 vs brute-force top-10. This is the
        # accuracy side of the crossover story — the n_cells≈√n table is
        # only worth its assignment cost if a small nprobe keeps recall
        # usable on this (deterministic, untrained-centroid) quantizer.
        from intervalaverage_spark.functions.ann import brute_topk, ivf_probe_cells

        assigned_b, cents_b = ivf_cells(vecs, "vec_id", "embedding",
                                        n_cells=sqrt_cells, method="broadcast")
        assigned_b = assigned_b.persist()
        assigned_b.count()
        vecs_c = vecs.persist()
        step = max(n_vecs // 20, 1)
        qrows = vecs_c.filter(F.col("vec_id") % step == 0).collect()
        truths = {}
        for r in qrows:
            qv = [float(x) for x in r["embedding"]]
            truths[r["vec_id"]] = {
                x["vec_id"]
                for x in brute_topk(vecs_c, qv, "vec_id", "embedding", 10).collect()
            }
        print(f"\nrecall@10, n_cells={sqrt_cells}, {len(qrows)} sampled queries:")
        for nprobe in (1, 4, 16):
            hits = tot = 0
            for r in qrows:
                qv = [float(x) for x in r["embedding"]]
                probes = ivf_probe_cells(qv, cents_b, nprobe)
                got = {
                    x["vec_id"]
                    for x in brute_topk(
                        assigned_b.filter(F.col("ivf_cell").isin(probes)),
                        qv, "vec_id", "embedding", 10).collect()
                }
                hits += len(truths[r["vec_id"]] & got)
                tot += len(truths[r["vec_id"]])
            print(f"  nprobe={nprobe}: recall@10 = {hits / tot:.4f}", flush=True)
        assigned_b.unpersist()
        vecs_c.unpersist()  # crossover must time the parquet-scan plan

        # --- crossover timings (warm = 2nd run, same policy as bench.py)
        print("\n| n_cells | literal warm s | broadcast warm s |")
        print("|---|---|---|")
        for nc in (16, 64, 256, sqrt_cells, 1024):
            times = {}
            for method in ("literal", "broadcast"):
                if method == "literal" and nc > 256:
                    times[method] = None
                    continue
                for _ in range(2):
                    t0 = time.time()
                    assigned, _ = ivf_cells(vecs, "vec_id", "embedding",
                                            n_cells=nc, method=method)
                    assigned.select("vec_id", "ivf_cell").write.format(
                        "noop").mode("overwrite").save()
                    times[method] = round(time.time() - t0, 2)
            lit_s = times["literal"] if times["literal"] is not None else "—"
            print(f"| {nc} | {lit_s} | {times['broadcast']} |", flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
