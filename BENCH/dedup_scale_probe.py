"""Candidate-pair blowup vs the max_df stop-shingle cap, measured.

The fuzzy-dedup scale claim rests on candidate generation staying
sub-quadratic under real shingle skew. This probe quantifies it on the
deterministic 100k-doc corpus (sources/corpus.py: 60% of docs share one
verbatim boilerplate footer; Zipf body vocabulary):

* the ngram inverted-index path: candidate pairs = Σ_shingle C(df, 2)
  over the shingle document-frequency table, at max_df ∈ {∞, 1000, 100};
* the minhash-LSH path: candidate pairs = Σ_bucket C(n, 2) over band
  buckets, at (bands=8, r=2) and (bands=4, r=4) × max_df ∈ {∞, 1000}.

Both are ANALYTIC — one groupBy each, Σ C(n,2) computed from group sizes
— so the degenerate configs are measurable without materializing the
quadratic join they would trigger. Results → BENCH/NOTES.md
"Dedup at 100k docs".

Run on an idle host: python BENCH/dedup_scale_probe.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def pair_mass(df, *keys) -> int:
    """Σ C(group_size, 2) — the candidate pairs a self-equi-join on
    ``keys`` would emit (upper bound of the post-distinct count)."""
    n = F.col("count").cast("double")
    row = (
        df.groupBy(*keys).count()
        .agg(F.sum(n * (n - 1) / 2).cast("long").alias("m"))
        .first()
    )
    return int(row["m"] or 0)


def main() -> None:
    from intervalaverage_spark.functions.dedup import minhash_signature, shingles
    from intervalaverage_spark.session import get_spark
    from intervalaverage_spark.sources.corpus import synth_corpus

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="dedup-scale-probe", master="local[32]",
                      shuffle_partitions=64)
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="ia_dedup_probe_")
    try:
        synth_corpus(spark, n_docs).write.mode("overwrite").parquet(f"{base}/docs")
        docs = spark.read.parquet(f"{base}/docs")

        sh = docs.select(
            F.col("doc_id").alias("id"),
            F.explode(shingles("text", 3)).alias("sh"),
        )
        dfc = sh.groupBy("sh").count().cache()
        n_shingles = dfc.count()
        top = dfc.orderBy(F.desc("count")).limit(8).collect()
        print(f"n_docs={n_docs}  distinct shingles={n_shingles}")
        print("top shingle DFs:", [int(r["count"]) for r in top])

        rows = []
        for cap in (None, 1000, 100):
            t0 = time.time()
            d = dfc if cap is None else dfc.filter(F.col("count") <= cap)
            n = F.col("count").cast("double")
            m = int(d.agg(F.sum(n * (n - 1) / 2).cast("long")).first()[0] or 0)
            rows.append(("ngram inverted index", cap, m, round(time.time() - t0, 1)))

        for bands, cap in ((8, None), (8, 1000), (4, None), (4, 1000)):
            t0 = time.time()
            r = 16 // bands
            sig = minhash_signature(docs, num_hashes=16, max_df=cap)
            band_rows = sig.select(
                "id",
                F.explode(F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(F.concat_ws("|", *[
                            F.col(f"mh_{b * r + i}") for i in range(r)
                        ])).alias("bkey"),
                    )
                    for b in range(bands)
                ])).alias("bk"),
            ).select("id", "bk.band", "bk.bkey")
            m = pair_mass(band_rows, "band", "bkey")
            rows.append((f"minhash-LSH bands={bands} r={r}", cap, m,
                         round(time.time() - t0, 1)))

        print("\n| path | max_df | candidate pairs (Σ C(n,2)) | probe sec |")
        print("|---|---|---|---|")
        for path, cap, m, sec in rows:
            print(f"| {path} | {cap if cap is not None else '∞'} | {m:,} | {sec} |")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
