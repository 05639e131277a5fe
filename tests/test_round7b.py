"""Round-7 second wave: decayed recrawl priority (E48), training-
sequence packing (E49), vocabulary stats (E50).

Known-answer tests computed by hand on tiny frames, plus the plan
properties that keep each operator viable at 100 TB (one key exchange
for recrawl; range-partitioned — never single-task — prefix sum for
packing; broadcast n_docs join for vocab).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from intervalaverage_spark.functions.churn import recrawl_priority
from intervalaverage_spark.functions.packing import (
    pack_sequences,
    sequence_fill_stats,
)
from intervalaverage_spark.functions.vocab import term_stats, top_terms
from tests.conftest import rows


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------ E48 recrawl_priority

def _snap_frame(spark):
    t0 = datetime.datetime(2024, 1, 1)
    s = lambda secs: t0 + datetime.timedelta(seconds=secs)  # noqa: E731
    data = [
        ("a", s(0), "p1"),
        ("a", s(100), "p2"),   # changed revisit
        ("a", s(200), "p2"),   # unchanged revisit — as_of anchor
        ("b", s(50), "q1"),    # single snapshot: filtered out
    ]
    return spark.createDataFrame(data, "k string, ts timestamp, p string")


def test_recrawl_priority_known_answer(spark):
    out = rows(
        recrawl_priority(_snap_frame(spark), "k", "ts", "p",
                         half_life_secs=100),
        "k",
    )
    assert [r["k"] for r in out] == ["a"]
    r = out[0]
    # as_of = 200; weights: t=100 → 2^-1 = 0.5, t=200 → 2^0 = 1.0
    assert r["n_snapshots"] == 3
    assert r["decayed_changes"] == 0.5        # only the t=100 change
    assert r["decayed_visit_mass"] == 1.5     # both revisits
    assert r["decayed_change_rate"] == round(0.5 / 1.5, 6)
    assert r["secs_since_last"] == 0


def test_recrawl_priority_first_snapshot_excluded(spark):
    """A key's first snapshot is storage, not churn: a 2-snapshot key
    with no payload change must score 0, not pick up the first row's
    trivially-true is_changed."""
    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0, "p"), ("a", t0 + datetime.timedelta(seconds=60), "p")],
        "k string, ts timestamp, p string",
    )
    r = rows(recrawl_priority(df, "k", "ts", "p", half_life_secs=60), "k")[0]
    assert r["decayed_changes"] == 0.0
    assert r["decayed_visit_mass"] == 1.0     # the t=60 revisit at age 0
    assert r["decayed_change_rate"] == 0.0


def test_recrawl_priority_single_key_exchange(spark):
    """The snapshot_changes window and the per-key aggregate share one
    hashpartitioning(key) exchange — the churn-family plan shape."""
    p = _plan(recrawl_priority(_snap_frame(spark), "k", "ts", "p"))
    assert p.count("Exchange hashpartitioning") == 1


# ------------------------------------------------ E49 sequence packing

def _doc_frame(spark):
    data = [
        (1, "a b c"),        # 3 tokens
        (2, "d e"),          # 2 tokens
        (3, ""),             # empty doc
        (4, "f g h i j k"),  # 6 tokens
    ]
    return spark.createDataFrame(data, "doc_id long, text string")


def test_pack_sequences_known_answer(spark):
    out = {r["doc_id"]: r
           for r in rows(pack_sequences(_doc_frame(spark), budget=4),
                         "doc_id")}
    # stream: [0,3) doc1 | [3,5) doc2 | doc3 empty at 5 | [5,11) doc4
    assert (out[1]["start_offset"], out[1]["seq_first"],
            out[1]["seq_last"], out[1]["crosses_boundary"]) == (0, 0, 0, False)
    assert (out[2]["start_offset"], out[2]["seq_first"],
            out[2]["seq_last"], out[2]["crosses_boundary"]) == (3, 0, 1, True)
    assert (out[3]["n_tokens"], out[3]["seq_first"],
            out[3]["seq_last"], out[3]["crosses_boundary"]) == (0, 1, 1, False)
    assert (out[4]["start_offset"], out[4]["seq_first"],
            out[4]["seq_last"], out[4]["crosses_boundary"]) == (5, 1, 2, True)


def test_sequence_fill_known_answer(spark):
    out = {r["seq"]: r
           for r in rows(sequence_fill_stats(_doc_frame(spark), budget=4),
                         "seq")}
    assert set(out) == {0, 1, 2}
    # interior sequences exactly full
    assert (out[0]["n_docs"], out[0]["n_tokens"],
            out[0]["fill_fraction"]) == (2, 4, 1.0)
    assert (out[1]["n_docs"], out[1]["n_tokens"],
            out[1]["fill_fraction"]) == (2, 4, 1.0)
    # tail holds doc4's last 3 tokens
    assert (out[2]["n_docs"], out[2]["n_tokens"],
            out[2]["fill_fraction"]) == (1, 3, 0.75)


def test_pack_total_tokens_conserved(spark):
    """The pack is a partition of the token stream: per-sequence token
    sums must add back to the corpus total."""
    docs = _doc_frame(spark)
    total = docs.select(
        F.sum(F.size(F.filter(F.split("text", r"\s+"),
                              lambda t: t != ""))).alias("t")
    ).first()["t"]
    packed = sequence_fill_stats(docs, budget=4)
    assert packed.agg(F.sum("n_tokens")).first()[0] == total


def test_pack_adds_no_shuffle_over_prefix_sum(spark):
    """pack_sequences rides assign_shards' two-phase prefix sum (the
    range repartition + per-partition windows live BEHIND its frozen
    localCheckpoint — sharding.py's correctness note): the final plan
    must read that frozen base and add pure arithmetic — no Window, no
    Exchange, no single-task global sort on top."""
    p = _plan(pack_sequences(_doc_frame(spark), budget=4))
    assert "Scan ExistingRDD" in p          # the frozen partitioned base
    assert "Window" not in p
    assert "Exchange" not in p


# ------------------------------------------------ E50 vocabulary stats

def _vocab_frame(spark):
    data = [
        (1, "the cat The", "en"),
        (2, "the dog", "en"),
        (3, "chien", "fr"),
    ]
    return spark.createDataFrame(data, "doc_id long, text string, lang string")


def test_term_stats_known_answer(spark):
    import math

    out = {(r["lang"], r["term"]): r
           for r in rows(term_stats(_vocab_frame(spark), group_col="lang"),
                         "lang", "term")}
    the = out[("en", "the")]
    assert (the["cf"], the["df"], the["n_docs"]) == (3, 2, 2)
    assert the["idf"] == round(math.log(3 / 3) + 1, 6) == 1.0
    cat = out[("en", "cat")]
    assert (cat["cf"], cat["df"]) == (1, 1)
    assert cat["idf"] == round(math.log(3 / 2) + 1, 6)
    assert out[("fr", "chien")]["n_docs"] == 1


def test_top_terms_rank_and_tiebreak(spark):
    out = rows(top_terms(_vocab_frame(spark), group_col="lang", k=2),
               "lang", "rnk")
    en = [(r["term"], r["rnk"]) for r in out if r["lang"] == "en"]
    # cf desc, then term asc: cat beats dog at cf=1
    assert en == [("the", 1), ("cat", 2)]
    fr = [(r["term"], r["rnk"]) for r in out if r["lang"] == "fr"]
    assert fr == [("chien", 1)]


def test_term_stats_ndocs_join_is_broadcast(spark):
    p = _plan(term_stats(_vocab_frame(spark), group_col="lang"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


# ------------------------------------------ E51 trained IVF quantizer

def test_kmeans_training_improves_quantizer(spark):
    """Lloyd iterations must not worsen the spherical-k-means objective
    (mean assigned cosine) vs the sampled init, and trained centroids
    must stay unit-norm with the original cell ids."""
    import math

    from intervalaverage_spark.functions.ann import (
        ivf_cells,
        quantizer_quality,
        train_ivf_centroids,
    )
    from intervalaverage_spark.sources.corpus import synth_embeddings

    vecs = synth_embeddings(spark, 400)
    _, sampled = ivf_cells(vecs, "vec_id", "embedding", n_cells=8,
                           method="broadcast")
    trained = train_ivf_centroids(vecs, "vec_id", "embedding", n_cells=8,
                                  n_iter=3)
    q0 = quantizer_quality(vecs, "embedding", sampled)
    q3 = quantizer_quality(vecs, "embedding", trained)
    assert q3 >= q0 - 1e-9, f"training worsened the objective: {q0} -> {q3}"
    assert [cid for cid, _ in trained] == [cid for cid, _ in sampled]
    for _, cv in trained:
        assert math.isclose(sum(x * x for x in cv), 1.0, rel_tol=1e-6)


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    """A centroid that attracts no vectors must survive the iteration
    unchanged (not vanish or go NaN)."""
    from intervalaverage_spark.functions.ann import train_ivf_centroids

    # two tight clusters + 4 requested cells: at least one init centroid
    # ends up empty after the first assignment
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(6)] + [
        (i, [0.0, 1.0, 0.0, 0.0]) for i in range(6, 12)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_ivf_centroids(vecs, "vec_id", "embedding", n_cells=4,
                                n_iter=2)
    assert len(cents) == 4
    for _, cv in cents:
        assert all(x == x for x in cv)  # no NaN


# ------------------------------------- E52 cross-dimension coexistence

def test_version_coexistence_known_answer(spark, tmp_path):
    """SCD-2 intervals from two payload dimensions of one crawl stream,
    intersected by the engine's interval_intersect: hand-computed
    coexistence windows, current versions closed at the dataset max."""
    import datetime

    from intervalaverage_spark.queries_pipeline import (
        q_version_coexistence_events,
    )

    t0 = datetime.datetime(2024, 1, 1)
    s = lambda secs: t0 + datetime.timedelta(seconds=secs)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (0, s(0), 7, "X", 0.0, "p1"),
            (1, s(100), 7, "X", 0.0, "p2"),
            (2, s(200), 7, "Y", 0.0, "p2"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = rows(q_version_coexistence_events(spark, str(tmp_path)),
               "start", "fp_type")
    base = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp())
    got = [(r["start"] - base, r["end"] - base, r["coexist_secs"])
           for r in out]
    # (p1,X): [0,99]; (p2,X): [100,199]; (p2,Y): [200,200]
    assert got == [(0, 99, 100), (100, 199, 100), (200, 200, 1)]
    fps = {(r["start"] - base): (r["fp_props"], r["fp_type"]) for r in out}
    assert fps[0][0] != fps[100][0]           # p1 vs p2
    assert fps[100][1] == fps[0][1]           # X carries over
    assert fps[200][1] != fps[100][1]         # Y is new


# --------------------------------------- E53 streaming decayed churn

def test_streaming_decayed_churn_equals_batch(spark, tmp_path):
    """availableNow replay of the incremental EWMA state, rescaled to
    the global anchor, must equal the batch recrawl_priority operator
    at the 6-dp round (the driver-row contract)."""
    from intervalaverage_spark.functions.churn import recrawl_priority
    from intervalaverage_spark.queries_pipeline import (
        q_streaming_recrawl_priority_events,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    batch = rows(
        recrawl_priority(ev, "user_id", "ts", "props",
                         half_life_secs=7 * 86400),
        "user_id",
    )
    stream = rows(q_streaming_recrawl_priority_events(spark, sf), "user_id")
    assert len(batch) == len(stream) and len(batch) > 0
    for b, s in zip(batch, stream):
        assert b == s, f"batch/stream divergence: {b} vs {s}"


def test_streaming_decayed_churn_state_carries(spark, tmp_path):
    """Two-micro-batch replay (maxFilesPerTrigger=1) must equal the
    one-batch replay: the per-key (fingerprint, ts, sums) state carries
    across the batch boundary and the within-batch cumprod recurrence
    composes with the carried sums."""
    import datetime
    import os as _os

    from intervalaverage_spark.streaming.churn_stream import (
        streaming_decayed_churn,
    )
    from tests.test_round7 import _run_available_now

    t0 = datetime.datetime(2024, 1, 1)

    def ts(h):
        return t0 + datetime.timedelta(hours=h)

    schema = "user_id long, ts timestamp, props string"
    f1 = spark.createDataFrame(
        [(1, ts(0), "A"), (1, ts(1), "A"), (2, ts(0), "X"), (1, ts(2), "B")],
        schema)
    f2 = spark.createDataFrame(
        [(1, ts(3), "B"), (1, ts(4), "A"), (2, ts(5), "Y")], schema)
    d = str(tmp_path / "snap")
    f1.coalesce(1).write.mode("overwrite").parquet(d)
    first = {f for f in _os.listdir(d) if f.endswith(".parquet")}
    f2.coalesce(1).write.mode("append").parquet(d)
    second = {f for f in _os.listdir(d) if f.endswith(".parquet")} - first
    for f in first:
        _os.utime(_os.path.join(d, f), (1700000000, 1700000000))
    for f in second:
        _os.utime(_os.path.join(d, f), (1700000100, 1700000100))

    def run(src, name):
        _run_available_now(
            streaming_decayed_churn(src, "user_id", "ts", "props",
                                    half_life_secs=3600),
            name,
        )
        # latest running total per key (monotone in n_snapshots)
        out = {}
        for r in spark.table(name).collect():
            cur = out.get(r["key"])
            if cur is None or r["n_snapshots"] > cur["n_snapshots"]:
                out[r["key"]] = r
        return {
            k: (r["n_snapshots"], round(r["decayed_changes"], 9),
                round(r["decayed_visit_mass"], 9), r["last_ts_sec"])
            for k, r in out.items()
        }

    two = run(
        spark.readStream.schema(f1.schema)
        .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
        .parquet(d),
        "t_churn_two_batches",
    )
    one = run(
        spark.readStream.schema(f1.schema).parquet(d),
        "t_churn_one_batch",
    )
    assert two == one
    # hand check key 1 at hl=1h: revisits at h1 (unchanged), h2 (chg),
    # h3 (unchanged), h4 (chg); weights at anchor h4: 2^-3, 2^-2, 2^-1, 1
    n, dc, dv, _ = two[1]
    assert n == 5
    assert abs(dc - (0.25 + 1.0)) < 1e-9
    assert abs(dv - (0.125 + 0.25 + 0.5 + 1.0)) < 1e-9
