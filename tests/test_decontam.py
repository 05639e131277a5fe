"""Known-answer and contract tests for benchmark decontamination (E42)
and token-mix sampling (E43) — the round-7 LLM-pipeline additions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.decontam import (
    contaminant_grams,
    decontaminate,
    distinct_ngrams,
)
from intervalaverage_spark.functions.sampling import md5_uniform, token_mix_sample
from intervalaverage_spark.validation import IntervalSchemaError
from tests.conftest import rows


# ------------------------------------------------------- decontaminate

@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(1000, "a b c d e")], ["doc_id", "text"])


def test_decontaminate_known_answer(spark, bench):
    docs = spark.createDataFrame(
        [
            (1, "x b c d y"),        # shares the 3-gram "b c d"  -> 1 hit
            (2, "q w e r t"),        # clean                      -> 0 hits
            (3, "a b c d e"),        # verbatim: all 3 grams      -> 3 hits
            (4, "B C D zz"),         # case-insensitive match     -> 1 hit
            (5, "b c"),              # shorter than n             -> 0 hits
            (6, "x b c d y b c d"),  # doc grams are DISTINCT     -> 1 hit
        ],
        ["doc_id", "text"],
    )
    out = rows(decontaminate(docs, bench, n=3), "doc_id")
    got = {r["doc_id"]: (r["n_contam_grams"], r["is_contaminated"]) for r in out}
    assert got == {1: (1, True), 2: (0, False), 3: (3, True),
                   4: (1, True), 5: (0, False), 6: (1, True)}
    # no rows dropped, schema appended
    assert len(out) == 6


def test_contaminant_grams_distinct_across_docs(spark):
    b = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x")], ["doc_id", "text"])
    g = sorted(r["gram"] for r in contaminant_grams(b, n=3).collect())
    assert g == ["a b c", "b c d", "b c x"]


def test_distinct_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",)], ["text"])
    out = df.select(distinct_ngrams("text", 3).alias("g")).first()
    assert out["g"] == []


# ------------------------------------------------------ token_mix_sample

def _mix_frame(spark):
    data = []
    for i in range(200):
        lang = ["en", "de", "fr"][i % 3]
        data.append((i, lang, 100 + (i % 7)))
    return spark.createDataFrame(data, ["doc_id", "lang", "n_tok"])


def test_token_mix_rates_and_membership(spark):
    df = _mix_frame(spark)
    targets = {"en": 0.6, "de": 0.2, "fr": 0.2}
    out = token_mix_sample(df, "lang", targets, "n_tok", ["doc_id"],
                           seed="tmix")
    got = rows(out, "doc_id")
    # recompute the expected rates with the SAME fixed-order arithmetic
    actual = {
        r["lang"]: r["w"] for r in
        df.groupBy("lang").agg(F.sum("n_tok").alias("w")).collect()
    }
    budget = min(actual[s] / targets[s] for s in targets)
    rates = {s: int((targets[s] * budget) / actual[s] * 1_000_000) / 1_000_000
             for s in targets}
    # en asks for 60% of output but holds ~33% of weight -> binding, rate 1.0
    assert rates["en"] == 1.0
    for r in got:
        assert r["mix_rate"] == rates[r["lang"]]
    # membership == the pure md5 decision, row for row
    uni = {
        r["doc_id"]: r["u"] for r in
        df.select("doc_id", md5_uniform(["doc_id"], "tmix").alias("u")).collect()
    }
    expect_ids = {r["doc_id"] for r in df.collect()
                  if uni[r["doc_id"]] < rates[r["lang"]]}
    assert {r["doc_id"] for r in got} == expect_ids
    # binding stratum kept whole
    n_en = sum(1 for r in got if r["lang"] == "en")
    assert n_en == sum(1 for i in range(200) if i % 3 == 0)


def test_token_mix_drops_untargeted_strata(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "xx", 10)], ["doc_id", "lang", "n_tok"])
    out = token_mix_sample(df, "lang", {"en": 1.0}, "n_tok", ["doc_id"])
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_token_mix_validation(spark):
    df = _mix_frame(spark)
    with pytest.raises(IntervalSchemaError, match="sum to 1"):
        token_mix_sample(df, "lang", {"en": 0.5}, "n_tok", ["doc_id"])
    with pytest.raises(IntervalSchemaError, match="no weight"):
        token_mix_sample(df, "lang", {"en": 0.5, "zz": 0.5}, "n_tok",
                         ["doc_id"])
    with pytest.raises(IntervalSchemaError, match="missing column"):
        token_mix_sample(df, "lang", {"en": 1.0}, "nope", ["doc_id"])
    with pytest.raises(IntervalSchemaError, match="already exists"):
        token_mix_sample(df.withColumn("mix_rate", F.lit(0.0)), "lang",
                        {"en": 1.0}, "n_tok", ["doc_id"])
