"""Run a SUBSET of declared queries against their DuckDB oracles at a
given sf dir — the oracle_parity_sf001 loop with a name filter, used
during round-8 optimization to re-prove bit-equality after each internal
change without paying the full 104-query sweep.

Usage: python BENCH/r08_parity_subset.py <sf_dir> name1 name2 ...
       (no names = the round-8 touched set)
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_parity_sf001 import TABLES, norm  # noqa: E402

TOUCHED = [
    "ann_ivf_pruned_topk_embeddings", "ann_ivf_topk_embeddings",
    "ann_srp_topk_embeddings", "chunk_documents", "cluster_split_documents",
    "decontaminate_documents", "dedup_clusters_documents",
    "dedup_exact_documents", "duplicated_spans_documents",
    "embedding_neardup", "embedding_neardup_blocked",
    "incremental_dedup_documents", "ivf_train_quality_embeddings",
    "knn_join_embeddings", "knn_join_self_embeddings",
    "minhash_lsh_documents", "ngram_jaccard_documents",
    "pack_sequences_documents", "prefix_jaccard_documents",
    "repetition_stats_documents", "semantic_dedup_embeddings",
    "sequence_fill_documents", "simhash_documents",
    "streaming_dedup_exact_documents", "streaming_text_stats_documents",
    "text_stats_documents", "topk_cosine_embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or TOUCHED
    from intervalaverage_spark.session import get_spark

    spark = get_spark(app_name="r08-parity-subset", master="local[16]",
                      shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            sql = oracles.get(name)
            if sql is None:
                print(f"{name}: rows-only ({len(srows)} rows)", flush=True)
                continue
            pdf = con.execute(sql).fetchdf()
            scols, ocols = sorted(sdf.columns), sorted(pdf.columns)
            if scols != ocols:
                raise AssertionError(f"cols {scols} != {ocols}")
            orows = pdf.where(pdf.notnull(), None).to_dict("records")
            a, b = norm(srows, scols), norm(orows, scols)
            if len(a) != len(b):
                raise AssertionError(f"rowcount {len(a)} != {len(b)}")
            bad = [i for i, (ra, rb) in enumerate(zip(a, b)) if ra != rb]
            if bad:
                raise AssertionError(
                    f"{len(bad)} value mismatches; first: {a[bad[0]]} vs {b[bad[0]]}")
            print(f"{name}: OK ({len(a)} rows)", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: FAIL — {e}", flush=True)
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
