"""Dump .explain('formatted') for named declared queries to plans/r08/.

Usage: python BENCH/r08_dump_query_plans.py before|after name1 name2 ...
       (no names = the round-8 touched set)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "knn_join_self_embeddings",
    "knn_join_embeddings",
    "ann_ivf_topk_embeddings",
    "topk_cosine_embeddings",
    "minhash_lsh_documents",
    "ngram_jaccard_documents",
    "prefix_jaccard_documents",
    "simhash_documents",
    "embedding_neardup",
    "embedding_neardup_blocked",
]


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from intervalaverage_spark import queries as q
    from intervalaverage_spark.session import get_spark

    spark = get_spark(app_name="r08-plans", master="local[8]",
                      shuffle_partitions=8)
    reg = q.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = reg[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
