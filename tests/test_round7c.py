"""Round-7 third wave: leakage-safe splits (E54).

Cluster-keyed train/val/test splits make near-dup straddling
structurally impossible; the naive doc-keyed split demonstrably leaks
on the same graph. Audited with split_straddle_pairs both ways.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.functions.dedup import dedup_clusters
from intervalaverage_spark.functions.sampling import (
    assign_splits,
    leakage_safe_splits,
    split_straddle_pairs,
)
from tests.conftest import rows

W = {"train": 0.6, "val": 0.2, "test": 0.2}


@pytest.fixture(scope="module")
def clustered(spark):
    """60 docs; pairs chain 0-1-2, 10-11, and a 5-doc star around 20."""
    docs = spark.range(60).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)] + [(20, k) for k in (21, 22, 23, 24)],
        "id1 long, id2 long",
    )
    return docs, pairs, dedup_clusters(docs, pairs)


def test_cluster_members_share_split(spark, clustered):
    _, _, clusters = clustered
    out = leakage_safe_splits(clusters, W, seed="s7c")
    per = (out.groupBy("canonical_id")
           .agg(F.countDistinct("split").alias("n"))
           .agg(F.max("n")).first()[0])
    assert per == 1


def test_cluster_split_never_straddles(spark, clustered):
    _, pairs, clusters = clustered
    out = leakage_safe_splits(clusters, W, seed="s7c")
    assert split_straddle_pairs(pairs, out).count() == 0
    # and under ANY seed — the guarantee is structural, not a lucky hash
    for seed in ("a", "b", "zz"):
        alt = leakage_safe_splits(clusters, W, seed=seed)
        assert split_straddle_pairs(pairs, alt).count() == 0


def test_naive_split_leaks_on_same_graph(spark, clustered):
    """Doc-keyed splits DO straddle this graph (fixture chosen so at
    least one pair's endpoints hash across a boundary) — the
    contamination E54 exists to prevent, quantified by the audit."""
    docs, pairs, _ = clustered
    naive = assign_splits(docs, W, ["doc_id"], seed="s7c")
    leaked = split_straddle_pairs(pairs, naive)
    got = rows(leaked, "id1", "id2")
    assert len(got) > 0
    for r in got:
        assert r["split_1"] != r["split_2"]


def test_split_equals_assign_splits_on_canonical(spark, clustered):
    """leakage_safe_splits is exactly assign_splits keyed on the
    canonical id — pinned so the oracle SQL's CASE replay stays valid."""
    _, _, clusters = clustered
    a = rows(leakage_safe_splits(clusters, W, seed="s7c"), "doc_id")
    b = rows(assign_splits(clusters, W, ["canonical_id"], seed="s7c"),
             "doc_id")
    assert a == b


def test_singletons_keep_own_hash(spark, clustered):
    """A doc with no near-dups is its own cluster: its cluster split
    equals its naive split (canonical_id == doc_id)."""
    docs, _, clusters = clustered
    out = leakage_safe_splits(clusters, W, seed="s7c")
    naive = assign_splits(docs, W, ["doc_id"], seed="s7c",
                          out_col="naive_split")
    j = out.join(naive, "doc_id").filter(F.col("cluster_size") == 1)
    assert j.filter(F.col("split") != F.col("naive_split")).count() == 0
    assert j.count() == 60 - 10  # 3 + 2 + 5 clustered docs


# ------------------------------------------------------ E55: bloom filter

from intervalaverage_spark.functions.bloom import (  # noqa: E402
    WORD_BITS,
    bloom_build,
    bloom_fp_theory,
    bloom_probe,
    bloom_probe_broadcast,
    bloom_words_to_array,
)
from intervalaverage_spark.validation import IntervalSchemaError  # noqa: E402

_M, _K = 1 << 13, 4


@pytest.fixture(scope="module")
def bloom_fixture(spark):
    corpus = (spark.range(900).filter("id % 3 != 0")
              .select(F.col("id").alias("key")))
    words = bloom_build(corpus, "key", _M, _K, seed="t7c")
    allx = spark.range(900).select(F.col("id").alias("key"))
    return corpus, words, allx


def test_bloom_no_false_negatives(spark, bloom_fixture):
    corpus, words, _ = bloom_fixture
    out = bloom_probe(corpus, "key", words, _M, _K, seed="t7c")
    assert out.filter(~F.col("maybe_present")).count() == 0


def test_bloom_word_relation_bounded(spark, bloom_fixture):
    _, words, _ = bloom_fixture
    stats = words.agg(F.count(F.lit(1)), F.min("word_idx"),
                      F.max("word_idx")).first()
    assert stats[0] <= _M // WORD_BITS
    assert stats[1] >= 0 and stats[2] < _M // WORD_BITS


def test_bloom_broadcast_equals_join_path(spark, bloom_fixture):
    """Bit-exact equality — integer ops leave no rounding freedom, so
    this is a guarantee, not a fixture observation (contrast the ANN
    GEMM's fixture-verified float equality)."""
    _, words, allx = bloom_fixture
    jp = rows(bloom_probe(allx, "key", words, _M, _K, seed="t7c"), "key")
    arr = bloom_words_to_array(words, _M)
    bp = rows(bloom_probe_broadcast(allx, "key", arr, _M, _K, seed="t7c"),
              "key")
    assert jp == bp


def test_bloom_fp_rate_near_theory(spark):
    """Deliberately undersized filter so collisions actually happen:
    measured FP rate on 800 non-members lands in a loose band around
    the textbook (1-e^{-kn/m})^k."""
    m, k = 1024, 3
    corpus = spark.range(100).select(F.col("id").alias("key"))
    words = bloom_build(corpus, "key", m, k, seed="fp7")
    probes = (spark.range(100, 900).select(F.col("id").alias("key")))
    out = bloom_probe(probes, "key", words, m, k, seed="fp7")
    fps = out.filter(F.col("maybe_present")).count()
    theory = bloom_fp_theory(100, m, k)
    assert 0 < fps < 800 * theory * 5 + 10
    # no false negatives even under collision pressure
    mem = bloom_probe(corpus, "key", words, m, k, seed="fp7")
    assert mem.filter(~F.col("maybe_present")).count() == 0


def test_bloom_error_contracts(spark, bloom_fixture):
    corpus, words, _ = bloom_fixture
    with pytest.raises(IntervalSchemaError):
        bloom_build(corpus, "key", 100, 4)          # not a word multiple
    with pytest.raises(IntervalSchemaError):
        bloom_build(corpus, "key", _M, 0)           # k out of range
    with pytest.raises(IntervalSchemaError):
        bloom_build(corpus, "nope", _M, 4)          # missing column
    arr = bloom_words_to_array(words, _M)
    with pytest.raises(IntervalSchemaError):        # bitset/m mismatch
        bloom_probe_broadcast(corpus, "key", arr, _M * 2, _K)
    with pytest.raises(IntervalSchemaError):        # output column clash
        probed = bloom_probe(corpus, "key", words, _M, _K, seed="t7c")
        bloom_probe(probed, "key", words, _M, _K, seed="t7c")


# ------------------------------------------------ E56: crawl frontier

def test_crawl_frontier_matches_pandas_rerank(spark):
    """The composed scheduler (recrawl_priority → per-host cap) equals a
    pandas re-rank of the full priority table with the same
    (decayed_changes desc, md5-uniform asc) order — so the politeness
    cap provably keeps the BEST pages per host, not an arbitrary 3."""
    import hashlib

    import pandas as pd

    from intervalaverage_spark.functions.churn import recrawl_priority
    from intervalaverage_spark.functions.sampling import cap_per_key

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pr = recrawl_priority(ev, "user_id", "ts", "props",
                          half_life_secs=7 * 86400)
    pr = pr.withColumn("host", F.pmod(F.col("user_id"), F.lit(4)))
    top = cap_per_key(pr, ["host"], 2, ["user_id"],
                      order_col="decayed_changes", descending=True,
                      seed="t7f")
    got = {(r["host"], r["user_id"]) for r in top.collect()}

    full = pr.toPandas()

    def u(uid: int) -> float:
        h = hashlib.md5(f"t7f\x1f{uid}".encode()).hexdigest()
        return int(h[:12], 16) / float(1 << 48)

    full["u"] = full["user_id"].map(u)
    want = set()
    for host, g in full.groupby("host"):
        g = g.sort_values(["decayed_changes", "u"],
                          ascending=[False, True]).head(2)
        want |= {(host, int(r.user_id)) for r in g.itertuples()}
    assert got == want
    # politeness invariant: never more than n per host
    per_host = pd.Series([h for h, _ in got]).value_counts()
    assert per_host.max() <= 2


# ------------------------------------------------ E57: count-min sketch

from intervalaverage_spark.functions.cms import (  # noqa: E402
    cms_build,
    cms_error_theory,
    cms_estimate,
    cms_estimate_broadcast,
    cms_to_array,
)

_CW, _CD = 64, 4


@pytest.fixture(scope="module")
def cms_fixture(spark):
    """Skewed stream: ~5700 observations over 200 distinct keys with a
    heavy head (key j appears ~200/(j+1) times) — 200 keys ≫ 64
    counters per row, so collisions are guaranteed."""
    stream = (spark.range(200)
              .select(F.col("id").alias("key"),
                      (200 / (F.col("id") + 1)).cast("int").alias("n"))
              .select("key", F.explode(F.sequence(F.lit(1), F.col("n"))))
              .select("key"))
    exact = stream.groupBy("key").agg(F.count(F.lit(1)).alias("true_cf"))
    sketch = cms_build(stream, "key", _CW, _CD, seed="cm7")
    return stream, exact, sketch


def test_cms_never_undercounts(spark, cms_fixture):
    _, exact, sketch = cms_fixture
    est = cms_estimate(exact, "key", sketch, _CW, _CD, seed="cm7")
    assert est.filter(F.col("cms_est") < F.col("true_cf")).count() == 0
    # and collisions DID happen (the fixture is over capacity)
    assert est.filter(F.col("cms_est") > F.col("true_cf")).count() > 0


def test_cms_relation_bounded(spark, cms_fixture):
    _, _, sketch = cms_fixture
    s = sketch.agg(F.count(F.lit(1)), F.min("row"), F.max("row"),
                   F.min("col"), F.max("col")).first()
    assert s[0] <= _CW * _CD
    assert s[1] == 0 and s[2] == _CD - 1
    assert s[3] >= 0 and s[4] < _CW


def test_cms_weighted_build_equals_stream_build(spark, cms_fixture):
    """Building from the pre-aggregated (key, count) relation with
    weight_col gives the IDENTICAL sketch as the raw stream — what the
    driver query exploits to skip the second explode."""
    _, exact, sketch = cms_fixture
    from_agg = cms_build(exact, "key", _CW, _CD, seed="cm7",
                         weight_col="true_cf")
    assert rows(sketch, "row", "col") == rows(from_agg, "row", "col")


def test_cms_broadcast_equals_join_path(spark, cms_fixture):
    _, exact, sketch = cms_fixture
    jp = rows(cms_estimate(exact, "key", sketch, _CW, _CD, seed="cm7"),
              "key")
    arr = cms_to_array(sketch, _CW, _CD)
    bp = rows(cms_estimate_broadcast(exact, "key", arr, _CW, _CD,
                                     seed="cm7"), "key")
    assert jp == bp


def test_cms_overcount_within_theory(spark, cms_fixture):
    """Every estimate's overcount stays under the eps*N ceiling (the
    PER-ROW Markov bound holds in expectation; the min over depth=4
    rows makes exceeding it on this fixed fixture astronomically
    unlikely — and the fixture is deterministic, so this is a pinned
    observation, not a flaky sample)."""
    stream, exact, sketch = cms_fixture
    n_total = stream.count()
    ceiling, _ = cms_error_theory(n_total, _CW, _CD)
    est = cms_estimate(exact, "key", sketch, _CW, _CD, seed="cm7")
    worst = est.agg(
        F.max(F.col("cms_est") - F.col("true_cf"))).first()[0]
    assert worst <= ceiling


def test_cms_error_contracts(spark, cms_fixture):
    _, exact, sketch = cms_fixture
    with pytest.raises(IntervalSchemaError):
        cms_build(exact, "key", 1, 4)                # width too small
    with pytest.raises(IntervalSchemaError):
        cms_build(exact, "key", _CW, 0)              # depth out of range
    with pytest.raises(IntervalSchemaError):
        cms_build(exact, "nope", _CW, _CD)           # missing key column
    with pytest.raises(IntervalSchemaError):
        cms_build(exact, "key", _CW, _CD, weight_col="nope")
    arr = cms_to_array(sketch, _CW, _CD)
    with pytest.raises(IntervalSchemaError):         # matrix shape mismatch
        cms_estimate_broadcast(exact, "key", arr, _CW * 2, _CD)


# ------------------------------------------------ E58: hyperloglog

from intervalaverage_spark.functions.hll import (  # noqa: E402
    hll_error_theory,
    hll_estimate,
    hll_merge,
    hll_registers,
)

_HB = 9  # 512 registers


@pytest.fixture(scope="module")
def hll_fixture(spark):
    """50k observations over 20k distinct keys (each key 2-3 times)."""
    keys = spark.range(50000).select((F.col("id") % 20000).alias("k"))
    return keys, hll_registers(keys, "k", _HB, seed="h7t")


def test_hll_registers_bounded(spark, hll_fixture):
    _, regs = hll_fixture
    s = regs.agg(F.count(F.lit(1)), F.min("reg"), F.max("reg"),
                 F.min("max_rank")).first()
    assert s[0] <= 1 << _HB
    assert s[1] >= 0 and s[2] < (1 << _HB) and s[3] >= 1


def test_hll_duplicate_invariance(spark, hll_fixture):
    """The sketch of the raw stream equals the sketch of its distinct
    keys — max() idempotence, the property that makes the fold safe to
    run BEFORE dedup."""
    keys, regs = hll_fixture
    dedup = hll_registers(keys.distinct(), "k", _HB, seed="h7t")
    assert rows(regs, "reg") == rows(dedup, "reg")


def test_hll_merge_equals_whole(spark, hll_fixture):
    keys, regs = hll_fixture
    h1 = hll_registers(keys.filter("k < 7000"), "k", _HB, seed="h7t")
    h2 = hll_registers(keys.filter("k >= 7000"), "k", _HB, seed="h7t")
    assert rows(hll_merge(h1, h2), "reg") == rows(regs, "reg")


def test_hll_estimate_within_three_se(spark, hll_fixture):
    """Deterministic fixture, pinned observation: the 20k-distinct
    estimate lands within 3 standard errors (observed ~1.9% vs the
    4.6% SE at m=512)."""
    _, regs = hll_fixture
    est = hll_estimate(regs, _HB).first()[0]
    assert abs(est - 20000) / 20000 <= 3 * hll_error_theory(_HB)


def test_hll_linear_counting_small_cardinality(spark):
    """47 distinct keys in 512 registers: the linear-counting fallback
    fires and is near-exact at this occupancy."""
    keys = spark.range(47).select(F.col("id").alias("k"))
    est = hll_estimate(hll_registers(keys, "k", _HB, seed="h7s"),
                       _HB).first()[0]
    assert abs(est - 47) <= 3


def test_hll_grouped_sketches_independent(spark):
    """group_cols: each group's estimate sees only its own keys."""
    df = (spark.range(3000)
          .select((F.col("id") % 3).alias("g"),
                  F.col("id").alias("k")))
    regs = hll_registers(df, "k", _HB, seed="h7g", group_cols=["g"])
    out = {r["g"]: r["hll_est"]
           for r in hll_estimate(regs, _HB, group_cols=["g"]).collect()}
    assert set(out) == {0, 1, 2}
    for g, est in out.items():
        assert abs(est - 1000) / 1000 <= 3 * hll_error_theory(_HB)


def test_hll_error_contracts(spark, hll_fixture):
    keys, _ = hll_fixture
    with pytest.raises(IntervalSchemaError):
        hll_registers(keys, "k", 3)                  # b out of range
    with pytest.raises(IntervalSchemaError):
        hll_registers(keys, "k", 17)
    with pytest.raises(IntervalSchemaError):
        hll_registers(keys, "nope", _HB)             # missing column
    with pytest.raises(IntervalSchemaError):
        hll_registers(keys, "k", _HB, group_cols=["nope"])


# ------------------------------------------------ E59: streaming hll

def test_streaming_hll_equals_batch_across_microbatches(spark, tmp_path):
    """Three parquet files streamed one per micro-batch
    (maxFilesPerTrigger=1): the complete-mode register table after the
    availableNow replay equals the batch fold over the union — the
    state store carried per-register max across batches."""
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_hll_registers,
    )

    src_dir = str(tmp_path / "keys")
    for i in range(3):
        (spark.range(i * 400, (i + 1) * 400)
         .select(F.col("id").alias("k"))
         .coalesce(1).write.mode("append").parquet(src_dir))
    batch = spark.read.parquet(src_dir)
    want = rows(hll_registers(batch, "k", _HB, seed="sh7"), "reg")

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir)
              .select("k"))
    name = "t_stream_hll_regs"
    q = (streaming_hll_registers(stream, "k", _HB, seed="sh7")
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()
    # complete mode: at least 2 micro-batches actually ran
    assert q.lastProgress["batchId"] >= 1
    got = rows(spark.table(name), "reg")
    assert got == want
    # state bounded by register count, not stream length
    assert len(got) <= 1 << _HB


def test_streaming_hll_estimate_equals_batch(spark, tmp_path):
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_hll_registers,
    )

    src_dir = str(tmp_path / "keys2")
    (spark.range(5000).select(F.col("id").alias("k"))
     .coalesce(2).write.parquet(src_dir))
    batch = spark.read.parquet(src_dir)
    want = hll_estimate(
        hll_registers(batch, "k", _HB, seed="sh7e"), _HB).first()[0]

    stream = (spark.readStream.schema(batch.schema).parquet(src_dir)
              .select("k"))
    name = "t_stream_hll_est"
    q = (streaming_hll_registers(stream, "k", _HB, seed="sh7e")
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()
    got = hll_estimate(spark.table(name), _HB).first()[0]
    assert got == want


def test_streaming_hll_rejects_bad_b(spark):
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_hll_registers,
    )

    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(IntervalSchemaError):
        streaming_hll_registers(df, "k", 2)


def test_hll_empty_input_estimates_zero(spark):
    """An empty stream sketches to zero distinct, not NULL: all m
    registers empty → linear counting gives m*ln(m/m) = 0 (regression
    for the SUM-over-nothing NULL edge in the global aggregate)."""
    empty = spark.range(0).select(F.col("id").alias("k"))
    regs = hll_registers(empty, "k", _HB, seed="h7z")
    assert regs.count() == 0
    assert hll_estimate(regs, _HB).first()[0] == 0.0


# ------------------------------------------------ E60: weighted sampling

from intervalaverage_spark.functions.sampling import weighted_sample  # noqa: E402


def test_weighted_sample_matches_python_replay(spark):
    """Exact replication against a pure-python A-Res reference:
    md5 uniform → round(pow(u, 1/w), 6) → (priority desc, u asc)
    top-k per group."""
    import hashlib

    import pandas as pd

    pdf = pd.DataFrame({
        "g": [i % 3 for i in range(120)],
        "i": range(120),
        "w": [(i * 7) % 23 + 1 for i in range(120)],
    })
    got = {(r["g"], r["i"]) for r in
           weighted_sample(spark.createDataFrame(pdf), 4, "w", ["i"],
                           group_cols=["g"], seed="wsr").collect()}

    def u(i: int) -> float:
        h = hashlib.md5(f"wsr\x1f{i}".encode()).hexdigest()
        return int(h[:12], 16) / float(1 << 48)

    want = set()
    for g, grp in pdf.groupby("g"):
        pri = [(round(u(r.i) ** (1.0 / r.w), 6), -u(r.i), r.i)
               for r in grp.itertuples()]
        pri.sort(key=lambda t: (t[0], t[1]), reverse=True)
        want |= {(g, i) for _, _, i in pri[:4]}
    assert got == want


def test_weighted_sample_biases_toward_weight(spark):
    """Deterministic fixture, pinned observation: the sampled rows'
    mean weight exceeds the population mean (the point of weighting)."""
    import pandas as pd

    pdf = pd.DataFrame({"i": range(400),
                        "w": [(i % 20) + 1 for i in range(400)]})
    df = spark.createDataFrame(pdf)
    out = weighted_sample(df, 40, "w", ["i"], seed="wsb").toPandas()
    assert len(out) == 40
    assert out["w"].mean() > pdf["w"].mean() * 1.2


def test_weighted_sample_excludes_nonpositive_weights(spark):
    import pandas as pd

    pdf = pd.DataFrame({"i": range(30),
                        "w": [0 if i < 10 else (None if i < 20 else 5)
                              for i in range(30)]})
    out = weighted_sample(spark.createDataFrame(pdf), 30, "w", ["i"],
                          seed="wsz").toPandas()
    assert set(out["i"]) == set(range(20, 30))


def test_weighted_sample_error_contracts(spark):
    df = spark.range(5).select(F.col("id").alias("i"),
                               F.lit(1.0).alias("w"))
    with pytest.raises(IntervalSchemaError):
        weighted_sample(df, 0, "w", ["i"])
    with pytest.raises(IntervalSchemaError):
        weighted_sample(df, 1, "nope", ["i"])
    with pytest.raises(IntervalSchemaError):
        weighted_sample(df.withColumn("sample_priority", F.lit(1.0)),
                        1, "w", ["i"])
