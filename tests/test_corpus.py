"""Synthetic dedup-scale corpus: determinism, planted-family recall,
stop-shingle cap effect, embedding cluster structure."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
)
from intervalaverage_spark.sources.corpus import (
    BOILERPLATE,
    family_pairs,
    synth_corpus,
    synth_embeddings,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_corpus(spark, n_docs=2000, family_size=4,
                        clustered_frac=0.2).cache()


def test_corpus_deterministic_and_shaped(spark, corpus):
    again = synth_corpus(spark, n_docs=2000, family_size=4, clustered_frac=0.2)
    assert corpus.exceptAll(again).count() == 0
    assert again.exceptAll(corpus).count() == 0
    assert corpus.count() == 2000
    # planted families: 400 clustered docs → 100 families of 4
    fams = corpus.filter(F.col("family_id") != F.col("doc_id")).select(
        "family_id").distinct().count()
    assert fams == 100
    # boilerplate lands on roughly the requested fraction
    frac = corpus.filter(F.col("text").contains(BOILERPLATE)).count() / 2000
    assert 0.5 < frac < 0.7


def test_corpus_family_jaccard_graded(corpus):
    """Members of one family must be near-dups (J well above 0.5);
    unrelated docs must stay far below — the detection threshold has
    real margin on both sides."""
    fam = corpus.filter(F.col("family_id") == 0).orderBy("doc_id")
    rows = fam.select("doc_id", shingles("text", 3).alias("sh")).collect()
    assert len(rows) == 4
    sets = {r["doc_id"]: set(r["sh"]) for r in rows}
    base = sets[0]
    for m in (1, 2, 3):
        j = len(base & sets[m]) / len(base | sets[m])
        assert j > 0.6, (m, j)
    other = corpus.filter(F.col("doc_id") == 1500).select(
        shingles("text", 3).alias("sh")).first()["sh"]
    j_cross = len(base & set(other)) / len(base | set(other))
    assert j_cross < 0.3


def test_minhash_lsh_recovers_planted_families(corpus):
    pairs = minhash_lsh_pairs(corpus, num_hashes=16, bands=8,
                              threshold=0.5, max_df=500).cache()
    truth = family_pairs(corpus)
    n_truth = truth.count()
    hit = pairs.join(truth, ["id1", "id2"], "left_semi").count()
    assert n_truth == 600  # 100 families × C(4,2)
    assert hit / n_truth > 0.9
    # exact-verify means precision 1.0 at the threshold by construction:
    # every emitted pair's true Jaccard is ≥ 0.5, so the exact n-gram path
    # at the same threshold must contain every LSH pair
    exact = ngram_jaccard_pairs(corpus, threshold=0.5, max_df=500)
    assert pairs.join(exact, ["id1", "id2"], "left_anti").count() == 0


def test_max_df_bounds_inverted_index_mass(corpus):
    """The boilerplate footer's shingles dominate the inverted-index
    candidate mass uncapped and vanish under the cap — the blowup
    ngram_jaccard_pairs' max_df bounds, in miniature (the 100k-doc
    measurement is BENCH/NOTES.md "Dedup at 100k docs"; banded-LSH
    candidate mass tells the same story but only grows visible at
    n ≫ 2000 because a band collision needs EVERY minhash in the band
    to land on a shared shingle — the probe measures both)."""
    sh = corpus.select(F.explode(shingles("text", 3)).alias("sh"))
    dfc = sh.groupBy("sh").count().cache()
    n = F.col("count").cast("double")

    def mass(d):
        return int(d.agg(F.sum(n * (n - 1) / 2).cast("long")).first()[0] or 0)

    uncapped = mass(dfc)
    capped = mass(dfc.filter(F.col("count") <= 500))
    # ~60 % of the 2000 docs share the 18-shingle footer → the uncapped
    # mass is dominated by ≈ 18 × C(1200, 2) ≈ 13M pairs; the cap removes
    # exactly those (few hot TYPES carrying huge mass)
    assert uncapped > 20 * capped, (uncapped, capped)
    hot_types = dfc.filter(F.col("count") > 500).count()
    assert hot_types < 40, hot_types
    dfc.unpersist()


def test_synth_embeddings_cluster_structure(spark):
    emb = synth_embeddings(spark, n_vecs=300, dims=32, n_concepts=8)
    rows = emb.collect()
    assert len(rows) == 300
    by_concept: dict[int, list[np.ndarray]] = {}
    for r in rows:
        by_concept.setdefault(r["concept"], []).append(
            np.array(r["embedding"], dtype=float))
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    cs = [c for c, vs in by_concept.items() if len(vs) >= 2]
    same = np.mean([cos(by_concept[c][0], by_concept[c][1]) for c in cs])
    cross = np.mean([cos(by_concept[cs[i]][0], by_concept[cs[i + 1]][0])
                     for i in range(len(cs) - 1)])
    assert same > 0.8
    assert abs(cross) < 0.5
    again = synth_embeddings(spark, n_vecs=300, dims=32, n_concepts=8)
    assert emb.exceptAll(again).count() == 0
