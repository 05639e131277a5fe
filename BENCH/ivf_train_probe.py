"""Trained vs sampled IVF quantizer at the √n regime (round 7, E51).

The round-7 broadcast probe measured the SAMPLED (lowest-id) quantizer
at n_cells=447 on 200k vectors: recall@10 = 0.32 / 0.64 / 1.00 at
nprobe = 1 / 4 / 16. This probe trains the same quantizer with
spherical k-means (train_ivf_centroids, 5 Lloyd iterations on the
id%4 sample) and re-measures: quantizer objective (mean assigned
cosine), recall@10 at the same nprobe points, and the training cost.

Run on an IDLE host: python BENCH/ivf_train_probe.py [n_vecs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from intervalaverage_spark.functions.ann import (
        brute_topk,
        ivf_cells,
        ivf_probe_cells,
        quantizer_quality,
        train_ivf_centroids,
    )
    from intervalaverage_spark.session import get_spark
    from intervalaverage_spark.sources.corpus import synth_embeddings

    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_cells = max(int(n_vecs ** 0.5), 16)
    spark = get_spark(app_name="ivf-train-probe", master="local[32]",
                      shuffle_partitions=32)
    base = tempfile.mkdtemp(prefix="ia_ivf_train_")
    try:
        synth_embeddings(spark, n_vecs).write.mode("overwrite").parquet(
            f"{base}/vecs")
        vecs = spark.read.parquet(f"{base}/vecs")

        _, sampled = ivf_cells(vecs, "vec_id", "embedding",
                               n_cells=n_cells, method="broadcast")
        t0 = time.time()
        trained = train_ivf_centroids(vecs, "vec_id", "embedding",
                                      n_cells=n_cells, n_iter=5,
                                      sample_every=4)
        train_s = round(time.time() - t0, 1)
        print(f"train: {n_cells} cells, 5 iters, id%4 sample -> {train_s}s",
              flush=True)
        for name, cents in (("sampled", sampled), ("trained", trained)):
            q = quantizer_quality(vecs, "embedding", cents)
            print(f"objective ({name}): mean assigned cosine = {q:.4f}",
                  flush=True)

        from intervalaverage_spark.functions.ann import assign_cells_broadcast

        vecs_c = vecs.persist()
        step = max(n_vecs // 20, 1)
        qrows = vecs_c.filter(F.col("vec_id") % step == 0).collect()
        truths = {}
        for r in qrows:
            qv = [float(x) for x in r["embedding"]]
            truths[r["vec_id"]] = {
                x["vec_id"]
                for x in brute_topk(vecs_c, qv, "vec_id", "embedding", 10)
                .collect()
            }
        print(f"\nrecall@10, n_cells={n_cells}, {len(qrows)} sampled queries:")
        print("| quantizer | nprobe=1 | nprobe=4 | nprobe=16 |")
        print("|---|---|---|---|")
        for name, cents in (("sampled", sampled), ("trained", trained)):
            assigned = assign_cells_broadcast(
                vecs_c, "embedding", cents).persist()
            assigned.count()
            cells_r = []
            for nprobe in (1, 4, 16):
                hits = tot = 0
                for r in qrows:
                    qv = [float(x) for x in r["embedding"]]
                    probes = ivf_probe_cells(qv, cents, nprobe)
                    got = {
                        x["vec_id"]
                        for x in brute_topk(
                            assigned.filter(F.col("ivf_cell").isin(probes)),
                            qv, "vec_id", "embedding", 10).collect()
                    }
                    hits += len(truths[r["vec_id"]] & got)
                    tot += len(truths[r["vec_id"]])
                cells_r.append(round(hits / tot, 4))
            assigned.unpersist()
            print(f"| {name} | {cells_r[0]} | {cells_r[1]} | {cells_r[2]} |",
                  flush=True)
        vecs_c.unpersist()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
