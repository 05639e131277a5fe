"""Round-7 fifth wave: BM25 ranked retrieval (E64).

The scorer is pinned by a pure-python replay of the full Okapi/Lucene
arithmetic (idf, length-normalised tf, 6-dp contribution rounding,
exact decimal summation) on a hand-sized corpus, plus the structural
properties a retrieval operator must hold: deterministic tie-breaks,
zero-match documents absent, unseen query terms inert, and the
persisted-postings path identical to the inline path.
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.retrieval import (
    bm25_postings,
    bm25_topk,
)
from intervalaverage_spark.validation import IntervalSchemaError
from tests.conftest import rows

DOCS = [
    (1, "hash join order"),
    (2, "hash hash hash scan"),
    (3, "merge sort window"),
    (4, "join order batch stream"),
    (5, "the the the the the"),
]
QUERIES = [(10, "hash join"), (11, "window"), (12, "join join JOIN")]


def py_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent replay: dict-based postings, same rounding contract."""
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, qtext in queries:
        for term in set(qtext.lower().split()):
            if term not in df:
                continue
            idf = round(math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5)), 6)
            for d, ts in toks.items():
                tf = ts.count(term)
                if tf == 0:
                    continue
                contrib = round(
                    idf * (tf * (k1 + 1.0))
                    / (tf + k1 * (1.0 - b + b * (len(ts) / avgdl))),
                    6,
                )
                sc, nh = out.get((qid, d), (0, 0))
                # exact decimal sum replay: accumulate in micro-units
                out[(qid, d)] = (sc + round(contrib * 1e6), nh + 1)
    return {
        key: (round(sc / 1e6, 6), nh) for key, (sc, nh) in out.items()
    }


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def probe_queries(spark):
    return spark.createDataFrame(QUERIES, ["query_id", "query_text"])


def test_bm25_matches_python_replay(spark, corpus, probe_queries):
    got = {
        (r["query_id"], r["doc_id"]): (round(r["score"], 6), r["n_terms_hit"])
        for r in bm25_topk(corpus, probe_queries, k=10).collect()
    }
    assert got == py_bm25(DOCS, QUERIES)


def test_bm25_rank_deterministic_and_capped(spark, corpus, probe_queries):
    got = rows(bm25_topk(corpus, probe_queries, k=2), "query_id", "rnk")
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 2
        # total order: score desc, then doc_id asc
        keys = [(-r["score"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)


def test_bm25_zero_match_docs_absent(spark, corpus, probe_queries):
    got = bm25_topk(corpus, probe_queries, k=10)
    # doc 5 shares no term with any query; query 11 matches only doc 3
    assert got.filter("doc_id = 5").count() == 0
    assert rows(got.filter("query_id = 11").select("doc_id")) == [
        {"doc_id": 3}
    ]


def test_bm25_unseen_query_term_inert(spark, corpus):
    qs = spark.createDataFrame(
        [(1, "hash zzzunseen")], ["query_id", "query_text"]
    )
    got = rows(
        bm25_topk(corpus, qs, k=10).select("doc_id", "n_terms_hit"),
        "doc_id",
    )
    # the unseen term matches nothing; 'hash' still scores docs 1 and 2
    assert [r["doc_id"] for r in got] == [1, 2]
    assert all(r["n_terms_hit"] == 1 for r in got)


def test_bm25_duplicate_query_terms_count_once(spark, corpus):
    once = spark.createDataFrame([(1, "join")], ["query_id", "query_text"])
    thrice = spark.createDataFrame(
        [(1, "join join join")], ["query_id", "query_text"]
    )
    a = rows(bm25_topk(corpus, once, k=10).select("doc_id", "score"), "doc_id")
    b = rows(
        bm25_topk(corpus, thrice, k=10).select("doc_id", "score"), "doc_id"
    )
    assert a == b


def test_bm25_persisted_postings_path_identical(spark, corpus,
                                                probe_queries, tmp_path):
    idx_path = str(tmp_path / "bm25_index")
    bm25_postings(corpus).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    inline = rows(bm25_topk(corpus, probe_queries, k=10),
                  "query_id", "doc_id")
    indexed = rows(
        bm25_topk(corpus, probe_queries, k=10, postings=idx),
        "query_id", "doc_id",
    )
    assert inline == indexed


def test_bm25_postings_shape(spark, corpus):
    got = rows(bm25_postings(corpus).filter("doc_id = 2"), "term")
    # doc 2 = 'hash hash hash scan': tf 3 + 1, dl 4 on every row
    assert got == [
        {"doc_id": 2, "term": "hash", "tf": 3, "dl": 4},
        {"doc_id": 2, "term": "scan", "tf": 1, "dl": 4},
    ]


def test_bm25_error_contracts(spark, corpus, probe_queries):
    with pytest.raises(IntervalSchemaError, match="k1"):
        bm25_topk(corpus, probe_queries, k1=0.0)
    with pytest.raises(IntervalSchemaError, match="b must"):
        bm25_topk(corpus, probe_queries, b=1.5)
    with pytest.raises(IntervalSchemaError, match="k must"):
        bm25_topk(corpus, probe_queries, k=0)
