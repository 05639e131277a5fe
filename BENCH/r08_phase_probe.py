"""Round-8 phase decomposition of the heavy bench queries (guide §1).

Times each internal phase of the four dominant dedup/ANN bench entries
with a noop sink on the 100k-doc / 200k-vec synthetic corpus, so the
optimization targets are measured, not guessed. Each phase is labelled
(setJobDescription) and run twice (cold JIT + warm); warm is the number
that matters.

Usage: python BENCH/r08_phase_probe.py [minhash|ngram|prefix|knn|all]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intervalaverage_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, runs=2):
    out = []
    for _ in range(runs):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 2))
    print(f"{name:55s} cold={out[0]:8.2f} warm={out[-1]:8.2f}", flush=True)
    return out[-1]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from intervalaverage_spark.sources.corpus import synth_corpus, synth_embeddings

    spark = get_spark(app_name="r08-phase-probe", master="local[32]",
                      shuffle_partitions=32)
    base = tempfile.mkdtemp(prefix="r08_probe_")
    n_docs, n_vecs = 100_000, 200_000
    synth_corpus(spark, n_docs).write.mode("overwrite").parquet(f"{base}/docs")
    synth_embeddings(spark, n_vecs).write.mode("overwrite").parquet(f"{base}/vecs")
    docs = spark.read.parquet(f"{base}/docs")
    vecs = spark.read.parquet(f"{base}/vecs")

    from intervalaverage_spark.functions.dedup import (
        minhash_band_index,
        minhash_lsh_pairs,
        minhash_signature,
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
        shingles,
    )

    if which in ("minhash", "all"):
        print("== minhash_lsh_pairs phases ==")
        sh = docs.select(F.col("doc_id").alias("id"),
                         F.explode(shingles("text", 3)).alias("sh"))
        timed(spark, "mh.0 shingle explode only", lambda: noop(sh))
        stop = sh.groupBy("sh").count().filter(F.col("count") > 1000).select("sh")
        timed(spark, "mh.1 stop-shingle df agg", lambda: noop(stop))
        sig = minhash_signature(docs, "doc_id", "text", 3, 16, max_df=1000)
        timed(spark, "mh.2 signature (explode+stop+16xmd5+min)",
              lambda: noop(sig))
        bands = minhash_band_index(docs, "doc_id", "text", 3, 16, 8, max_df=1000)
        timed(spark, "mh.3 band index (sig + band md5)", lambda: noop(bands))
        a, b_ = bands.alias("a"), bands.alias("b")
        cand = (a.join(b_, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bkey") == F.col("b.bkey"))
                       & (F.col("a.id") < F.col("b.id")))
                .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
                .distinct())
        timed(spark, "mh.4 band self-join + distinct", lambda: noop(cand))
        full = minhash_lsh_pairs(docs, "doc_id", "text", 3, 16, 8, 0.5, 1000)
        timed(spark, "mh.5 full (adds exact verify)", lambda: noop(full))

    if which in ("ngram", "all"):
        print("== ngram_jaccard_pairs phases ==")
        sh = docs.select(F.col("doc_id").alias("id"),
                         F.explode(shingles("text", 3)).alias("sh"))
        hot = sh.groupBy("sh").count().filter(F.col("count") > 1000).select("sh")
        kept = sh.join(F.broadcast(hot), "sh", "left_anti")
        timed(spark, "ng.0 kept rows (explode+hot+anti)", lambda: noop(kept))
        a, b = kept.alias("a"), kept.alias("b")
        common = (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                         & (F.col("a.id") < F.col("b.id")))
                  .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
                  .agg(F.count(F.lit(1)).alias("common")))
        timed(spark, "ng.1 inverted self-join + pair agg", lambda: noop(common))
        full = ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5, 1000)
        timed(spark, "ng.2 full (adds sizes+hot-arrays+jacc)", lambda: noop(full))

    if which in ("prefix", "all"):
        print("== prefix_jaccard_pairs phases ==")
        sh = docs.select(F.col("doc_id").alias("id"),
                         F.explode(shingles("text", 3)).alias("sh"))
        dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
        timed(spark, "pf.0 shingle df agg", lambda: noop(dfreq))
        from pyspark.sql import Window
        wid = Window.partitionBy("id").orderBy("__df", "sh")
        ranked = sh.join(dfreq, "sh").select(
            "id", "sh", F.row_number().over(wid).alias("__rk"),
            F.count(F.lit(1)).over(
                Window.partitionBy("id").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("sz"))
        timed(spark, "pf.1 rank window (join df + row_number)", lambda: noop(ranked))
        td = F.lit(0.5).cast("decimal(9,6)")
        prefix = ranked.where(
            F.col("__rk") <= F.col("sz") - F.ceil(td * F.col("sz")) + 1
        ).select("id", "sh", "sz", "__rk")
        timed(spark, "pf.2 prefix rows", lambda: noop(prefix))
        full = prefix_jaccard_pairs(docs, "doc_id", "text", 3, 0.5)
        timed(spark, "pf.3 full (join+posfilter+verify)", lambda: noop(full))

    if which in ("knn", "all"):
        print("== knn_join phases (self, broadcast, 2048 cells) ==")
        from intervalaverage_spark.functions.ann import ivf_cells, knn_join, probe_cells_broadcast
        t0 = time.time()
        assigned, cents = ivf_cells(vecs, "vec_id", "embedding", 2048,
                                    method="broadcast")
        print(f"kn.0 ivf_cells collect centroids: {time.time()-t0:.2f}s", flush=True)
        timed(spark, "kn.1 assign cells (pandas GEMM)", lambda: noop(assigned))
        qp = vecs.select(
            F.col("vec_id").alias("__knn_qid"),
            F.col("embedding").alias("__knn_qv"),
            F.explode(probe_cells_broadcast(vecs, "embedding", cents, 1)
                      ).alias("__knn_cell"))
        timed(spark, "kn.2 probe cells (pandas GEMM)", lambda: noop(qp))
        j = qp.join(assigned, qp["__knn_cell"] == assigned["ivf_cell"])
        j = j.filter(F.col("__knn_qid") != F.col("vec_id"))
        timed(spark, "kn.3 cell equi-join (no scoring)",
              lambda: noop(j.select("__knn_qid", "vec_id")))
        from intervalaverage_spark.functions.ann import cosine
        cos = cosine(F.col("__knn_qv").cast("array<double>"),
                     F.col("embedding").cast("array<double>"))
        scored = j.select(F.col("__knn_qid").alias("q_id"),
                          F.col("vec_id").alias("nn_id"),
                          F.round(cos, 6).alias("cosine"))
        timed(spark, "kn.4 + cosine rerank (HOF fold)", lambda: noop(scored))
        full = knn_join(vecs, vecs, "vec_id", "embedding", "vec_id",
                        "embedding", k=10, n_cells=2048, nprobe=1,
                        exclude_self=True, method="broadcast")
        timed(spark, "kn.5 full (adds window top-k)", lambda: noop(full))

    import shutil
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
