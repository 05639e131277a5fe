"""Round-7 sixth wave: interval concurrency (E69) + autocorrelation (E70).

Concurrency is pinned by a brute-force point-set replay (depth at every
point == count of covering intervals) and by its algebraic tie to
coalesce (constant-depth segments tile the islands exactly); autocorr
by an independent python replay of the exact-decimal-moment pipeline
and by closed-form cases (alternating series: acf(1) = −1, acf(2) = +1).
"""
from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.operators.analytics import autocorr
from intervalaverage_spark.operators.coalesce import (
    interval_coalesce,
    interval_concurrency,
)
from intervalaverage_spark.validation import IntervalSchemaError
from tests.conftest import rows


def _lcg(seed: int):
    """Deterministic 32-bit LCG (no Date.now/random — replay-stable)."""
    state = seed & 0xFFFFFFFF
    while True:
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        yield state


# --------------------------------------------------------- E69 concurrency


def test_concurrency_hand_fixture(spark):
    df = spark.createDataFrame(
        [("a", 1, 3), ("a", 3, 9), ("a", 5, 6), ("a", 20, 22),
         ("b", 4, 4), ("b", 5, 5)],
        "k string, s long, e long",
    )
    got = rows(
        interval_concurrency(df, ("s", "e"), ["k"]), "k", "seg_start"
    )
    want = [
        {"k": "a", "seg_start": 1, "seg_end": 2, "n_open": 1, "seg_len": 2},
        {"k": "a", "seg_start": 3, "seg_end": 3, "n_open": 2, "seg_len": 1},
        {"k": "a", "seg_start": 4, "seg_end": 4, "n_open": 1, "seg_len": 1},
        {"k": "a", "seg_start": 5, "seg_end": 6, "n_open": 2, "seg_len": 2},
        {"k": "a", "seg_start": 7, "seg_end": 9, "n_open": 1, "seg_len": 3},
        {"k": "a", "seg_start": 20, "seg_end": 22, "n_open": 1, "seg_len": 3},
        # b: [4,4] and [5,5] touch — the zero-net event at t=5 drops, so
        # the two depth-1 runs merge into ONE maximal segment
        {"k": "b", "seg_start": 4, "seg_end": 5, "n_open": 1, "seg_len": 2},
    ]
    assert got == want


def test_concurrency_pointwise_replay(spark):
    g = _lcg(7)
    data = []
    for i in range(120):
        k = f"k{next(g) % 4}"
        s = next(g) % 200
        data.append((k, s, s + next(g) % 30))
    df = spark.createDataFrame(data, "k string, s long, e long")
    segs = rows(interval_concurrency(df, ("s", "e"), ["k"]))
    # brute-force: depth at every covered point
    depth: dict[tuple[str, int], int] = {}
    for k, s, e in data:
        for t in range(s, e + 1):
            depth[(k, t)] = depth.get((k, t), 0) + 1
    got = {}
    for r in segs:
        assert r["seg_len"] == r["seg_end"] - r["seg_start"] + 1
        assert r["n_open"] >= 1
        for t in range(r["seg_start"], r["seg_end"] + 1):
            assert (r["k"], t) not in got, "segments overlap"
            got[(r["k"], t)] = r["n_open"]
    assert got == depth
    # maximality: adjacent segments of a key differ in depth
    by_key: dict[str, list] = {}
    for r in sorted(segs, key=lambda r: (r["k"], r["seg_start"])):
        by_key.setdefault(r["k"], []).append(r)
    for ss in by_key.values():
        for a, b in zip(ss, ss[1:]):
            if a["seg_end"] + 1 == b["seg_start"]:
                assert a["n_open"] != b["n_open"], "non-maximal split"


def test_concurrency_tiles_islands(spark):
    g = _lcg(11)
    data = []
    for _ in range(80):
        k = f"k{next(g) % 3}"
        s = next(g) % 150
        data.append((k, s, s + next(g) % 25))
    df = spark.createDataFrame(data, "k string, s long, e long")
    segs = rows(interval_concurrency(df, ("s", "e"), ["k"]))
    isl = rows(interval_coalesce(df, ("s", "e"), ["k"]))
    # segments tile the coalesced cover: total seg_len == total covered
    cov = {}
    for r in isl:
        cov[r["k"]] = cov.get(r["k"], 0) + r["covered"]
    seg = {}
    for r in segs:
        seg[r["k"]] = seg.get(r["k"], 0) + r["seg_len"]
    assert seg == cov
    # and every segment lies inside one island
    spans = {}
    for r in isl:
        spans.setdefault(r["k"], []).append((r["start"], r["end"]))
    for r in segs:
        assert any(s <= r["seg_start"] and r["seg_end"] <= e
                   for s, e in spans[r["k"]])


def test_concurrency_dates_roundtrip(spark):
    d = datetime.date
    df = spark.createDataFrame(
        [("a", d(2024, 1, 1), d(2024, 1, 10)),
         ("a", d(2024, 1, 5), d(2024, 1, 7))],
        "k string, s date, e date",
    )
    got = rows(interval_concurrency(df, ("s", "e"), ["k"]), "seg_start")
    assert [type(r["seg_start"]) for r in got] == [d, d, d]
    assert got == [
        {"k": "a", "seg_start": d(2024, 1, 1), "seg_end": d(2024, 1, 4),
         "n_open": 1, "seg_len": 4},
        {"k": "a", "seg_start": d(2024, 1, 5), "seg_end": d(2024, 1, 7),
         "n_open": 2, "seg_len": 3},
        {"k": "a", "seg_start": d(2024, 1, 8), "seg_end": d(2024, 1, 10),
         "n_open": 1, "seg_len": 3},
    ]


def test_concurrency_duplicates_count(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 1, 5), ("a", 1, 5)], "k string, s long, e long"
    )
    got = rows(interval_concurrency(df, ("s", "e"), ["k"]))
    assert got == [{"k": "a", "seg_start": 1, "seg_end": 5, "n_open": 3,
                    "seg_len": 5}]


def test_concurrency_errors(spark):
    df = spark.createDataFrame([("a", 1, 5)], "k string, s long, e long")
    with pytest.raises(IntervalSchemaError):
        interval_concurrency(df, ("s", "nope"), ["k"])


# ----------------------------------------------------------- E70 autocorr


def _py_autocorr(series_by_key, max_lag):
    """Independent replay: exact integer micro-unit moments, the same
    fixed-order float expression, 6-dp round."""
    out = {}
    for key, xs in series_by_key.items():
        # xs already 6-dp values; work in exact micro-units
        mu = [round(x * 1e6) for x in xs]
        for lag in range(1, max_lag + 1):
            a = mu[:-lag] if lag < len(mu) else []
            b = mu[lag:]
            if not a:
                continue
            n = float(len(a))
            sa = float(sum(a)) / 1e6
            sb = float(sum(b)) / 1e6
            sab = float(sum(x * y for x, y in zip(a, b))) / 1e12
            saa = float(sum(x * x for x in a)) / 1e12
            sbb = float(sum(y * y for y in b)) / 1e12
            num = n * sab - sa * sb
            va = n * saa - sa * sa
            vb = n * sbb - sb * sb
            acf = (round(num / (va * vb) ** 0.5, 6) + 0.0
                   if va > 0.0 and vb > 0.0 else None)
            out[(key, lag)] = (len(a), acf)
    return out


def test_autocorr_python_replay(spark):
    g = _lcg(23)
    data, series = [], {}
    for k in ("a", "b"):
        xs = []
        for i in range(40):
            v = (next(g) % 20000 - 10000) / 1000.0  # 3-dp values, exact
            xs.append(v)
            data.append((k, i, v))
        series[k] = xs
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), F.col("v")
    )
    got = {
        (r["k"], r["lag"]): (r["n_pairs"], r["acf"])
        for r in rows(autocorr(df, "ts", "v", ["k"], max_lag=3))
    }
    assert got == _py_autocorr(series, 3)


def test_autocorr_alternating_exact(spark):
    data = [("a", i, 1.0 if i % 2 == 0 else -1.0) for i in range(8)]
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    got = {r["lag"]: r["acf"]
           for r in rows(autocorr(df, "ts", "v", ["k"], max_lag=2))}
    assert got == {1: -1.0, 2: 1.0}


def test_autocorr_constant_is_null(spark):
    df = spark.createDataFrame(
        [("a", i, 5.0) for i in range(6)], "k string, t long, v double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    got = rows(autocorr(df, "ts", "v", ["k"], max_lag=1))
    assert got == [{"k": "a", "lag": 1, "n_pairs": 5, "acf": None}]


def test_autocorr_duplicate_ts_collapse(spark):
    # (t=0: 1.0 and 2.0 -> 1.5), t=1: 3.0, t=2: 0.0 — pinned vs the
    # 3-point series [1.5, 3.0, 0.0]
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 0, 2.0), ("a", 1, 3.0), ("a", 2, 0.0)],
        "k string, t long, v double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    got = rows(autocorr(df, "ts", "v", ["k"], max_lag=1))
    want = _py_autocorr({"a": [1.5, 3.0, 0.0]}, 1)[("a", 1)]
    assert got == [{"k": "a", "lag": 1, "n_pairs": want[0], "acf": want[1]}]


def test_autocorr_null_excluded(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, None), ("a", 2, 2.0), ("a", 3, 1.0)],
        "k string, t long, v double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    got = rows(autocorr(df, "ts", "v", ["k"], max_lag=1))
    # NULL row drops entirely: series is [1.0, 2.0, 1.0]
    want = _py_autocorr({"a": [1.0, 2.0, 1.0]}, 1)[("a", 1)]
    assert got == [{"k": "a", "lag": 1, "n_pairs": want[0], "acf": want[1]}]


def test_autocorr_error_contracts(spark):
    df = spark.createDataFrame([("a", 0, 1.0)], "k string, t long, v double")
    with pytest.raises(IntervalSchemaError):
        autocorr(df, "t", "v", ["k"], max_lag=0)
    with pytest.raises(IntervalSchemaError):
        autocorr(df, "t", "nope", ["k"])
    with pytest.raises(IntervalSchemaError):
        autocorr(df, "t", "v", [])


# --------------------------------------------------- E72 robust anomalies


def _median6(vals):
    """Linear-interpolation median (quantile_cont 0.5), 6-dp round."""
    s = sorted(vals)
    n = len(s)
    mid = (n - 1) * 0.5
    lo, hi = s[int(mid)], s[int(mid + 0.5)]
    return round(lo + (hi - lo) * (mid - int(mid)), 6)


def _py_mad_anomalies(series_by_key, k):
    out = set()
    rzs = {}
    for key, pts in series_by_key.items():
        xs = [x for _, x in pts]
        med = _median6(xs)
        devs = [round(abs(round(x * 1e6) - round(med * 1e6)) / 1e6, 6)
                for x in xs]
        mad = _median6(devs)
        kmu = round(k * 1e6) * round(mad * 1e6)  # micro^2 exact compare
        for (t, x), dv in zip(pts, devs):
            if round(dv * 1e6) * 1000000 > kmu:
                out.add((key, t))
                rzs[(key, t)] = (
                    round((x - med) / (1.4826 * mad), 6) + 0.0
                    if mad > 0 else None
                )
    return out, rzs


def test_mad_python_replay(spark):
    from intervalaverage_spark.operators.analytics import robust_anomalies

    g = _lcg(41)
    data, series = [], {}
    for key in ("a", "b"):
        pts = []
        for i in range(60):
            v = (next(g) % 2000) / 1000.0
            if i % 17 == 0:
                v += 25.0  # planted spikes
            pts.append((i, v))
            data.append((key, i, v))
        series[key] = pts
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    got = rows(robust_anomalies(df, "ts", "v", ["k"], k=3.0))
    want_set, want_rz = _py_mad_anomalies(series, 3.0)
    got_set = {(r["k"], int(r["ts"].timestamp())) for r in got}
    assert got_set == want_set and len(want_set) >= 4
    for r in got:
        assert r["rz"] == want_rz[(r["k"], int(r["ts"].timestamp()))]


def test_mad_planted_spike_only(spark):
    from intervalaverage_spark.operators.analytics import robust_anomalies

    data = [("a", i, 10.0 + (i % 3) * 0.5) for i in range(30)]
    data.append(("a", 30, 500.0))
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    got = rows(robust_anomalies(df, "ts", "v", ["k"], k=3.0))
    assert len(got) == 1 and got[0]["x"] == 500.0 and got[0]["rz"] > 0


def test_mad_zero_mad_flags_nonmedian(spark):
    from intervalaverage_spark.operators.analytics import robust_anomalies

    # >50% of points identical -> med = 7, mad = 0: flag = (x != med),
    # rz NULL (documented degenerate contract)
    data = [("a", i, 7.0) for i in range(10)] + [("a", 10, 7.1)]
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    got = rows(robust_anomalies(df, "ts", "v", ["k"], k=3.0))
    assert len(got) == 1 and got[0]["x"] == 7.1 and got[0]["rz"] is None


def test_mad_constant_series_silent(spark):
    from intervalaverage_spark.operators.analytics import robust_anomalies

    df = spark.createDataFrame(
        [("a", i, 5.0) for i in range(8)], "k string, t long, v double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    assert rows(robust_anomalies(df, "ts", "v", ["k"], k=3.0)) == []


# ------------------------------------------ E81 streaming seasonal alerts


def test_streaming_seasonal_equals_batch_run(spark, tmp_path):
    """Stateless contract: an availableNow replay over three files must
    equal a batch run of the SAME function row-for-row — there is no
    state to diverge."""
    from intervalaverage_spark.operators.analytics import seasonal_profile
    from intervalaverage_spark.streaming.seasonal_stream import (
        streaming_seasonal_anomalies,
    )

    src_dir = str(tmp_path / "seas_src")
    g = _lcg(139)
    for part in range(3):
        rows_in = []
        for i in range(200):
            t = (part * 200 + i) * 450
            v = 10.0 + (t % 86400) // 3600 + (next(g) % 100) / 100.0
            if next(g) % 37 == 0:
                v += 40.0  # planted spikes
            rows_in.append(("a", _tstamp(t), v))
        (spark.createDataFrame(rows_in, ["k", "ts", "v"])
         .coalesce(1).write.mode("append").parquet(src_dir))
    full = spark.read.parquet(src_dir)
    prof = seasonal_profile(full, "ts", "v", ["k"])
    want = rows(
        streaming_seasonal_anomalies(full, prof, "ts", "v", ["k"], k=3.0),
        "k", "ts")
    stream = (spark.readStream.schema(full.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = streaming_seasonal_anomalies(stream, prof, "ts", "v", ["k"],
                                       k=3.0)
    name = "t_stream_seasonal"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()
    assert q.lastProgress["batchId"] >= 1
    got = rows(spark.table(name), "k", "ts")
    assert got == want and len(got) > 0


def test_streaming_seasonal_contracts(spark):
    from intervalaverage_spark.streaming.seasonal_stream import (
        streaming_seasonal_anomalies,
    )
    from intervalaverage_spark.validation import IntervalDataError

    df = spark.createDataFrame(
        [("a", _tstamp(0), 1.0)], ["k", "ts", "v"])
    bad_prof = spark.createDataFrame([("a", 0, 1.0)], ["k", "phase", "m"])
    with pytest.raises(IntervalSchemaError, match="profile"):
        streaming_seasonal_anomalies(df, bad_prof, "ts", "v", ["k"])
    ok_prof = spark.createDataFrame(
        [("zz", 0, 1.0, 0.5)], ["k", "phase", "mean_v", "sd_v"])
    with pytest.raises(IntervalDataError):
        streaming_seasonal_anomalies(df, ok_prof, "ts", "v", ["k"],
                                     period=100, buckets=7)
    # unmonitored key (absent from profile) emits nothing
    got = rows(streaming_seasonal_anomalies(df, ok_prof, "ts", "v", ["k"]))
    assert got == []


# --------------------------------------------------- E80 Theil–Sen slope


def _py_theil_sen(series):
    """series: list of (t_sec, x_6dp). Mirrors the operator exactly."""
    pts = sorted(series)
    t0 = pts[0][0]
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (t1, x1), (t2, x2) = pts[i], pts[j]
            slopes.append((x2 - x1) * 86400.0 / (t2 - t1))

    def med(vals):
        s = sorted(vals)
        mid = (len(s) - 1) * 0.5
        lo, hi = s[int(mid)], s[min(int(mid) + 1, len(s) - 1)]
        return lo + (hi - lo) * (mid - int(mid))

    slope = round(med(slopes), 6) + 0.0
    resid = [x - slope * ((t - t0) / 86400.0) for t, x in pts]
    return (len(pts), len(slopes), slope, round(med(resid), 6) + 0.0)


def test_theil_sen_python_replay(spark):
    from intervalaverage_spark.operators.analytics import theil_sen

    g = _lcg(131)
    data, series = [], {}
    for k in ("a", "b"):
        pts = []
        ts_seen = set()
        for _ in range(15):
            t = next(g) % 100000
            if t in ts_seen:
                continue
            ts_seen.add(t)
            x = round((next(g) % 40000 - 20000) / 1000.0, 6)
            pts.append((t, x))
            data.append((k, t, x))
        series[k] = pts
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v")
    got = {r["k"]: r for r in rows(theil_sen(df, "ts", "v", ["k"]))}
    for k, pts in series.items():
        n, npairs, slope, intercept = _py_theil_sen(pts)
        r = got[k]
        assert (r["n_points"], r["n_pairs"]) == (n, npairs)
        assert r["ts_slope"] == slope and r["ts_intercept"] == intercept


def test_theil_sen_breakdown_resistance(spark):
    """25% corrupt points: Theil–Sen stays on the true slope, OLS is
    dragged — the reason both live in the toolkit."""
    from intervalaverage_spark.operators.analytics import theil_sen, trend

    true_slope = 2.0  # units/day
    data = []
    for i in range(40):
        t = i * 3600
        x = true_slope * (t / 86400.0)
        if i % 4 == 0:
            x += 500.0  # corrupt every 4th point
        data.append(("a", t, round(x, 6)))
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v")
    ts_r = rows(theil_sen(df, "ts", "v", ["k"]))[0]
    ols_r = rows(trend(df, "ts", "v", ["k"]))[0]
    assert abs(ts_r["ts_slope"] - true_slope) < 0.01
    assert abs(ols_r["slope"] - true_slope) > 10.0


def test_theil_sen_bounds_and_errors(spark):
    from intervalaverage_spark.operators.analytics import theil_sen
    from intervalaverage_spark.validation import IntervalDataError

    data = ([("big", t, 1.0) for t in range(10)]  # n=10 > max_points=5
            + [("ok", t * 10, float(t)) for t in range(4)]
            + [("solo", 0, 1.0)])
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v")
    got = rows(theil_sen(df, "ts", "v", ["k"], max_points=5))
    assert [r["k"] for r in got] == ["ok"]  # big excluded, solo n<2 absent
    with pytest.raises(IntervalDataError):
        theil_sen(df, "ts", "v", ["k"], max_points=1)
    with pytest.raises(IntervalSchemaError):
        theil_sen(df, "ts", "v", [])


# ------------------------------------------------ E79 seasonal baseline


def test_seasonal_profile_python_replay(spark):
    from intervalaverage_spark.operators.analytics import seasonal_profile

    g = _lcg(127)
    data, pts = [], {}
    for i in range(300):
        t = next(g) % (86400 * 7)
        v = (next(g) % 3000) / 100.0
        data.append(("a", t, v))
        pts.setdefault(("a", t), []).append(v)
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v")
    got = {(r["k"], r["phase"]): r
           for r in rows(seasonal_profile(df, "ts", "v", ["k"]))}
    # python replay: collapse dup ts to 6dp mean, bucket by hour-of-day
    buckets: dict[int, list] = {}
    for (_, t), vs in pts.items():
        x = round(sum(round(v * 1e6) for v in vs) / len(vs) / 1e6, 6)
        buckets.setdefault((t % 86400) // 3600, []).append(round(x * 1e6))
    for phz, mu in buckets.items():
        n = len(mu)
        mean = round(sum(mu) / 1e6 / n, 6)
        want_sd = None
        if n >= 2:
            s1 = float(sum(mu)) / 1e6
            s2 = float(sum(m * m for m in mu)) / 1e12
            want_sd = round(max(0.0, s2 / n - (s1 / n) * (s1 / n)) ** 0.5, 6)
        r = got[("a", phz)]
        assert (r["n_obs"], r["mean_v"], r["sd_v"]) == (n, mean, want_sd)


def test_seasonal_anomaly_phase_awareness(spark):
    """The value 50 is NORMAL at phase where the baseline is 50±noise
    but ANOMALOUS at a phase whose baseline is 5 — the global detectors
    cannot make that distinction."""
    from intervalaverage_spark.operators.analytics import (
        robust_anomalies,
        seasonal_anomalies,
    )

    data = []
    for day in range(10):
        base = day * 86400
        for rep in range(3):  # phase 0 ("3am"): quiet, ~5
            data.append(("a", base + rep * 60, 5.0 + rep * 0.1))
        for rep in range(3):  # phase 12 ("3pm"): busy, ~50
            data.append(("a", base + 12 * 3600 + rep * 60, 50.0 + rep * 0.1))
    # one 3am spike to the NORMAL-at-3pm level
    data.append(("a", 10 * 86400 + 120, 50.0))
    df = spark.createDataFrame(data, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v")
    got = rows(seasonal_anomalies(df, "ts", "v", ["k"], k=3.0))
    assert len(got) == 1 and got[0]["phase"] == 0 and got[0]["x"] == 50.0
    assert got[0]["rz"] > 3.0
    # the same point is INVISIBLE to the global MAD detector (50 is a
    # normal value globally)
    mad = rows(robust_anomalies(df, "ts", "v", ["k"], k=3.0))
    assert all(int(r["ts"].timestamp()) != 10 * 86400 + 120 for r in mad)


def test_seasonal_degenerate_contracts(spark):
    from intervalaverage_spark.operators.analytics import (
        seasonal_anomalies,
        seasonal_profile,
    )
    from intervalaverage_spark.validation import IntervalDataError

    # single point per phase -> sd NULL -> never flagged
    df = spark.createDataFrame(
        [("a", h * 3600, float(h)) for h in range(5)],
        "k string, t long, v double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    prof = rows(seasonal_profile(df, "ts", "v", ["k"]))
    assert all(r["sd_v"] is None and r["n_obs"] == 1 for r in prof)
    assert rows(seasonal_anomalies(df, "ts", "v", ["k"])) == []
    with pytest.raises(IntervalDataError):
        seasonal_profile(df, "ts", "v", ["k"], period=100, buckets=7)
    with pytest.raises(IntervalDataError):
        seasonal_anomalies(df, "ts", "v", ["k"], k=-1.0)


# ------------------------------------------- E78 windowed HLL (tier shape)


def test_hll_daily_merge_equals_global(spark):
    """The tier claim: per-day register sketches MERGE (max per reg)
    into exactly the whole-period sketch — COUNT(DISTINCT) cannot do
    this, which is why tiers store registers."""
    from intervalaverage_spark.functions.hll import (
        hll_estimate,
        hll_registers,
    )

    g = _lcg(113)
    data = [(next(g) % 30, f"u{next(g) % 400}") for _ in range(2000)]
    df = spark.createDataFrame(data, "day long, uid string")
    daily = hll_registers(df, "uid", b=6, seed="t", group_cols=["day"])
    # N-way merge of the daily sketches = register-wise max (the same
    # fold hll_merge does pairwise)
    merged = daily.groupBy("reg").agg(F.max("max_rank").alias("max_rank"))
    direct = hll_registers(df, "uid", b=6, seed="t")
    assert (rows(merged, "reg") == rows(direct, "reg"))
    est_m = rows(hll_estimate(merged, 6))[0]["hll_est"]
    est_d = rows(hll_estimate(direct, 6))[0]["hll_est"]
    assert est_m == est_d


# ----------------------------------------------------- E77 doc chunking


def test_chunk_reconstruction_property(spark):
    """Chunk 0 + each later chunk minus its overlap head == the doc."""
    from intervalaverage_spark.functions.packing import chunk_documents

    g = _lcg(97)
    docs = []
    for i in range(25):
        n = next(g) % 120  # includes < chunk and empty-ish docs
        docs.append((i, " ".join(f"t{next(g) % 1000}" for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    chunk, overlap = 16, 5
    got = rows(chunk_documents(df, chunk_tokens=chunk,
                               overlap_tokens=overlap),
               "doc_id", "chunk_id")
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in docs:
        want = [t for t in text.split() if t]
        chunks = by_doc[i]
        assert chunks[0]["start_token"] == 1
        rebuilt = chunks[0]["chunk_text"].split()
        for prev, cur in zip(chunks, chunks[1:]):
            cur_toks = cur["chunk_text"].split()
            # stride contract: starts advance by chunk - overlap
            assert (cur["start_token"] - prev["start_token"]
                    == chunk - overlap)
            # overlap head repeats the previous chunk's tail
            head = cur_toks[:overlap]
            assert head == rebuilt[cur["start_token"] - 1:
                                   cur["start_token"] - 1 + len(head)]
            rebuilt = rebuilt[:cur["start_token"] - 1] + cur_toks
        assert rebuilt == want, f"doc {i} not reconstructed"
        assert all(r["n_tokens"] == len(r["chunk_text"].split())
                   for r in chunks)


def test_chunk_short_and_empty_docs(spark):
    from intervalaverage_spark.functions.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "only four tokens here"), (2, "")],
        "doc_id long, text string",
    )
    got = rows(chunk_documents(df, chunk_tokens=512, overlap_tokens=64),
               "doc_id")
    assert [(r["doc_id"], r["chunk_id"], r["n_tokens"]) for r in got] == [
        (1, 0, 4), (2, 0, 0)]


def test_chunk_compose_with_packing(spark):
    from intervalaverage_spark.functions.packing import (
        chunk_documents,
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(50))) for i in range(10)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(df, chunk_tokens=16, overlap_tokens=0).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    packed = pack_sequences(chunks, budget=64)
    out = rows(packed)
    assert len(out) > 0  # chunk -> pack composes on the same contract


def test_chunk_error_contracts(spark):
    from intervalaverage_spark.functions.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap_tokens=8)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap_tokens=-1)


# ------------------------------------------------ E76 skew profile / salt


def test_skew_profile_hand_fixture(spark):
    from intervalaverage_spark.plans.skew import skew_profile

    # keys with counts 1, 2, 3, 10 -> p50 = 2.5, max = 10, ratio = 4.0
    data = ([("a", i) for i in range(1)] + [("b", i) for i in range(2)]
            + [("c", i) for i in range(3)] + [("d", i) for i in range(10)])
    df = spark.createDataFrame(data, "k string, v long")
    got = rows(skew_profile(df, ["k"]))[0]
    assert got == {"n_keys": 4, "n_rows": 16, "max_rows": 10,
                   "p50_rows": 2.5, "p95_rows": 8.95, "p99_rows": 9.79,
                   "skew_ratio": 4.0}


def test_salt_plan_ceilings(spark):
    from intervalaverage_spark.plans.skew import salt_plan

    data = ([("fits", i) for i in range(64)]
            + [("just_over", i) for i in range(65)]
            + [("two", i) for i in range(128)]
            + [("three", i) for i in range(129)])
    df = spark.createDataFrame(data, "k string, v long")
    got = {r["k"]: r["salt"] for r in rows(salt_plan(df, ["k"], 64))}
    assert got == {"just_over": 2, "two": 2, "three": 3}  # 64 fits -> absent


def test_hot_keys_deterministic(spark):
    from intervalaverage_spark.plans.skew import hot_keys

    data = ([("z", i) for i in range(5)] + [("a", i) for i in range(5)]
            + [("m", i) for i in range(9)])
    df = spark.createDataFrame(data, "k string, v long")
    got = rows(hot_keys(df, ["k"], top_k=2))
    assert [(r["k"], r["n_rows"], r["rank"]) for r in got] == [
        ("m", 9, 1), ("a", 5, 2)]  # tie 5-5 broken by key ASC


def test_skew_error_contracts(spark):
    from intervalaverage_spark.plans.skew import (
        hot_keys,
        salt_plan,
        skew_profile,
    )
    from intervalaverage_spark.validation import IntervalDataError

    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(IntervalSchemaError):
        skew_profile(df, ["nope"])
    with pytest.raises(IntervalSchemaError):
        skew_profile(df, [])
    with pytest.raises(IntervalDataError):
        salt_plan(df, ["k"], 0)
    with pytest.raises(IntervalDataError):
        hot_keys(df, ["k"], top_k=0)


# -------------------------------------------------- E75 url normalization


def test_url_normalize_rules(spark):
    from intervalaverage_spark.functions import urlnorm as U

    cases = [
        # (raw, expected canonical)
        ("HTTP://WWW.Example.COM:80/a/?utm_source=x&b=2&a=1#frag",
         "http://example.com/a?a=1&b=2"),
        ("https://user:pw@Site.ORG:443/Deep//Path///?gclid=1&z=9",
         "https://site.org/Deep//Path?z=9"),
        ("https://example.com", "https://example.com/"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("ftp://Files.Example.com:80/pub/", "ftp://files.example.com:80/pub"),
        ("https://a.b/?ref=tw&fbclid=abc&msclkid=1&utm_medium=m",
         "https://a.b/"),
        ("https://a.b/p?one=1&&one=1", "https://a.b/p?one=1&one=1"),
        ("not a url at all", None),
        ("//protocol-relative.com/x", None),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "i long, raw string"
    )
    got = rows(
        df.select("i", U.url_normalize("raw").alias("n")), "i")
    assert [r["n"] for r in got] == [want for _, want in cases]


def test_url_normalize_idempotent(spark):
    from intervalaverage_spark.functions import urlnorm as U

    df = spark.createDataFrame(
        [(1, "HTTP://WWW.A.COM:80/x/?utm_a=1&b=2&a=1#f"),
         (2, "https://u@B.co.UK:8443///"),
         (3, "https://c.io/p?z=1&y=2")],
        "i long, raw string",
    )
    once = df.select("i", U.url_normalize("raw").alias("n1"))
    twice = once.select("i", "n1", U.url_normalize("n1").alias("n2"))
    for r in rows(twice):
        assert r["n1"] == r["n2"]


def test_url_registered_domain(spark):
    from intervalaverage_spark.functions import urlnorm as U

    cases = [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("a.b.c.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("shop.example.com.au", "example.com.au"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, h string")
    got = rows(df.select(
        "i", U.url_registered_domain("h").alias("d")), "i")
    assert [r["d"] for r in got] == [w for _, w in cases]
    # extra_suffixes extends the heuristic
    df2 = spark.createDataFrame([(0, "x.y.github.io")], "i long, h string")
    got2 = rows(df2.select(U.url_registered_domain(
        "h", extra_suffixes=("github.io",)).alias("d")))
    assert got2[0]["d"] == "y.github.io"


# --------------------------------------------- E74 prefix-filter Jaccard


def _mk_corpus(spark, n_base=40, seed=83):
    """LCG corpus with planted near-dups and a shared boilerplate
    sentence (hot shingles) in every doc — the adversarial case the
    max_df cap exists for, which the prefix filter must survive
    losslessly."""
    g = _lcg(seed)
    boiler = "terms of service apply all rights reserved contact us"
    docs = []
    for i in range(n_base):
        words = " ".join(f"w{next(g) % 500}" for _ in range(30))
        docs.append((i, f"{words} {boiler}"))
        if i % 5 == 0:  # planted near-dup: same words, one token changed
            docs.append((1000 + i, f"{words} extra {boiler}"))
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_prefix_jaccard_equals_uncapped_exact(spark):
    from intervalaverage_spark.functions.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    d = _mk_corpus(spark)
    for t in (0.3, 0.5, 0.8):
        got = rows(prefix_jaccard_pairs(d, threshold=t), "id1", "id2")
        want = rows(ngram_jaccard_pairs(d, threshold=t, max_df=None),
                    "id1", "id2")
        assert got == want, f"threshold {t}"
    assert len(rows(prefix_jaccard_pairs(d, threshold=0.5))) >= 8


def test_prefix_jaccard_exact_threshold_boundary(spark):
    from intervalaverage_spark.functions.dedup import prefix_jaccard_pairs

    # sets {a b c, b c d} and {b c d, c d e}: J = 1/3 exactly; the
    # reported jaccard is 6-dp-rounded BEFORE the threshold compare
    # (the ngram_jaccard_pairs contract), so the inclusive boundary is
    # the 6-dp value 0.333333, not the unrepresentable 1/3
    d = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e")], "doc_id long, text string"
    )
    got = rows(prefix_jaccard_pairs(d, n=3, threshold=0.333333))
    assert len(got) == 1 and abs(got[0]["jaccard"] - 0.333333) < 1e-9
    assert rows(prefix_jaccard_pairs(d, n=3, threshold=0.34)) == []


def test_prefix_jaccard_t1_exact_sets_only(spark):
    from intervalaverage_spark.functions.dedup import prefix_jaccard_pairs

    d = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w"), (3, "x y z q")],
        "doc_id long, text string",
    )
    got = rows(prefix_jaccard_pairs(d, threshold=1.0))
    assert [(r["id1"], r["id2"], r["jaccard"]) for r in got] == [(1, 2, 1.0)]


def test_prefix_jaccard_error_contract(spark):
    from intervalaverage_spark.functions.dedup import prefix_jaccard_pairs

    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        prefix_jaccard_pairs(d, threshold=0.0)
    with pytest.raises(ValueError):
        prefix_jaccard_pairs(d, threshold=1.5)


# ------------------------------------------------------ E73 cadence stats


def _py_cadence(times):
    ts = sorted(set(times))
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    if not gaps:
        return (len(ts), 0, None, None, None, None, None, None)

    def q(p):
        s = sorted(gaps)
        mid = (len(s) - 1) * p
        lo, hi = s[int(mid)], s[min(int(mid) + 1, len(s) - 1)]
        return round(lo + (hi - lo) * (mid - int(mid)), 6)

    n, sg, sgg = float(len(gaps)), float(sum(gaps)), float(
        sum(x * x for x in gaps))
    cv = (round((max(0.0, n * sgg - sg * sg)) ** 0.5 / sg, 6)
          if sg > 0 else None)
    return (len(ts), len(gaps), min(gaps), max(gaps),
            round(sg / n, 6), q(0.5), q(0.95), cv)


def test_cadence_python_replay(spark):
    from intervalaverage_spark.operators.analytics import cadence_stats

    g = _lcg(71)
    data, times = [], {}
    for k in ("a", "b", "c"):
        ts = sorted({next(g) % 100000 for _ in range(37)})
        times[k] = ts
        data += [(k, t) for t in ts]
    df = spark.createDataFrame(data, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("ts"))
    got = rows(cadence_stats(df, "ts", ["k"]), "k")
    for r in got:
        want = _py_cadence(times[r["k"]])
        assert (r["n_obs"], r["n_gaps"], r["min_gap"], r["max_gap"],
                r["mean_gap"], r["p50_gap"], r["p95_gap"],
                r["cv_gap"]) == want


def test_cadence_metronome_and_single(spark):
    from intervalaverage_spark.operators.analytics import cadence_stats

    data = [("m", t * 300) for t in range(20)] + [("solo", 42)]
    df = spark.createDataFrame(data, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("ts"))
    got = {r["k"]: r for r in rows(cadence_stats(df, "ts", ["k"]))}
    m = got["m"]
    assert (m["cv_gap"], m["mean_gap"], m["p50_gap"], m["min_gap"],
            m["max_gap"]) == (0.0, 300.0, 300.0, 300, 300)
    s = got["solo"]
    assert s["n_obs"] == 1 and s["n_gaps"] == 0
    assert all(s[c] is None for c in
               ("min_gap", "max_gap", "mean_gap", "p50_gap", "p95_gap",
                "cv_gap"))


def test_cadence_duplicate_ts_collapse(spark):
    from intervalaverage_spark.operators.analytics import cadence_stats

    data = [("a", 0), ("a", 0), ("a", 10), ("a", 10), ("a", 30)]
    df = spark.createDataFrame(data, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("ts"))
    got = rows(cadence_stats(df, "ts", ["k"]))
    assert got[0]["n_obs"] == 3 and got[0]["n_gaps"] == 2
    assert got[0]["min_gap"] == 10 and got[0]["max_gap"] == 20


def test_cadence_error_contracts(spark):
    from intervalaverage_spark.operators.analytics import cadence_stats

    df = spark.createDataFrame([("a", 0)], "k string, t long")
    with pytest.raises(IntervalSchemaError):
        cadence_stats(df, "nope", ["k"])
    with pytest.raises(IntervalSchemaError):
        cadence_stats(df, "t", [])


# ----------------------------------------------------- E71 streaming trend


def _tstamp(sec):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)


def test_streaming_trend_equals_batch_across_microbatches(spark, tmp_path):
    """Three parquet files streamed one per micro-batch: the per-key
    decimal-moment state must make an availableNow replay equal the
    batch trend BIT-FOR-BIT (sums are associative and exact — order-
    AND batching-insensitive, so unlike CUSUM no ordering boundary is
    even needed)."""
    from intervalaverage_spark.operators.analytics import (
        trend,
        trend_from_moments,
        trend_points,
        trend_t0,
    )
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_trend_moments,
    )

    src_dir = str(tmp_path / "trend_src")
    g = _lcg(59)
    for part in range(3):
        rows_in = [
            (k, _tstamp(t * 60),
             3.0 + 0.01 * t + (next(g) % 1000) / 1000.0)
            for k in ("a", "b")
            for t in range(part * 25, (part + 1) * 25)
        ]
        (spark.createDataFrame(rows_in, ["k", "ts", "v"])
         .coalesce(1).write.mode("append").parquet(src_dir))
    full = spark.read.parquet(src_dir)
    want = rows(trend(full, "ts", "v", ["k"]), "k")

    cal = trend_t0(trend_points(full, "ts", "v", ["k"]), ["k"])
    stream = (spark.readStream.schema(full.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    m = streaming_trend_moments(stream, "ts", "v", ("k",), cal)
    name = "t_stream_trend"
    q = (m.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()
    assert q.lastProgress["batchId"] >= 1  # state actually carried
    got = rows(trend_from_moments(spark.table(name)), "k")
    assert got == want
    assert len(got) == 2 and all(r["slope"] is not None for r in got)


def test_streaming_trend_uncalibrated_keys_dropped(spark, tmp_path):
    """The stream-static inner join is the monitoring contract: keys
    absent from the calibration relation emit nothing."""
    from intervalaverage_spark.operators.analytics import (
        trend_from_moments,
    )
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_trend_moments,
    )

    src_dir = str(tmp_path / "trend_src2")
    rows_in = [(k, _tstamp(t), float(t)) for k in ("a", "zz")
               for t in range(10)]
    (spark.createDataFrame(rows_in, ["k", "ts", "v"])
     .coalesce(1).write.mode("overwrite").parquet(src_dir))
    full = spark.read.parquet(src_dir)
    cal = spark.createDataFrame(
        [("a", int(_tstamp(0).timestamp()))], "k string, t0 long")
    stream = spark.readStream.schema(full.schema).parquet(src_dir)
    m = streaming_trend_moments(stream, "ts", "v", ("k",), cal)
    name = "t_stream_trend2"
    q = (m.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()
    got = rows(trend_from_moments(spark.table(name)), "k")
    assert [r["k"] for r in got] == ["a"]


def test_mad_error_contracts(spark):
    from intervalaverage_spark.operators.analytics import robust_anomalies
    from intervalaverage_spark.validation import IntervalDataError

    df = spark.createDataFrame([("a", 0, 1.0)], "k string, t long, v double")
    with pytest.raises(IntervalSchemaError):
        robust_anomalies(df, "t", "nope", ["k"])
    with pytest.raises(IntervalSchemaError):
        robust_anomalies(df, "t", "v", [])
    with pytest.raises(IntervalDataError):
        robust_anomalies(df, "t", "v", ["k"], k=-1.0)
    with pytest.raises(IntervalDataError):
        robust_anomalies(df, "t", "v", ["k"], k=float("nan"))
