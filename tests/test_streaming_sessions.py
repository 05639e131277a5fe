"""Streaming session windows == batch sessionize on the sealed prefix.

Sentinel technique: one event on a dummy key far in the future advances
the global watermark past every real session's close, so availableNow
emits ALL real sessions in append mode; the sentinel's own (still-open)
session is excluded from the compare.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.operators.sessions import sessionize
from intervalaverage_spark.streaming.session_stream import stream_sessions

GAP = 600
SENTINEL_KEY = 10**6


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    rng = np.random.RandomState(41)
    n = 2000
    pdf = pd.DataFrame({
        "k": rng.randint(0, 8, n).astype(np.int64),
        "t": rng.randint(0, 150000, n).astype(np.int64),
    }).drop_duplicates()
    sentinel = pd.DataFrame({"k": [SENTINEL_KEY],
                             "t": [int(pdf.t.max()) + 10 * GAP]})
    full = pd.concat([pdf, sentinel], ignore_index=True)
    src = str(tmp_path_factory.mktemp("sess_src"))
    spark.createDataFrame(full).select(
        "k", F.timestamp_seconds("t").alias("ts"), F.col("t").cast("double").alias("v")
    ).write.mode("overwrite").parquet(src)
    return pdf, src


def test_streaming_sessions_match_batch(spark, stream_input, tmp_path_factory):
    pdf, src = stream_input
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_sessions(stream, GAP, ("k",), "ts", value_col="v")
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))
    q = (
        out.writeStream.format("memory").queryName("sess_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("availableNow session stream did not finish")
    q.stop()
    got = (
        spark.table("sess_out").filter(F.col("k") != SENTINEL_KEY)
        .toPandas().sort_values(["k", "session_start"]).reset_index(drop=True)
    )
    # batch twin: strict-< streaming gap == inclusive-<= batch gap-1
    batch = (
        sessionize(spark.createDataFrame(pdf), "t", GAP - 1, ["k"])
        .groupBy("k", "session_id")
        .agg(F.min("t").alias("session_start"), F.max("t").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("t").cast("double")).alias("sum_v"))
        .toPandas().sort_values(["k", "session_start"]).reset_index(drop=True)
    )
    assert len(got) == len(batch) and len(got) > 50
    for c in ("session_start", "session_end", "n_events"):
        assert np.array_equal(got[c].to_numpy(), batch[c].to_numpy()), c
    assert np.allclose(got["sum_v"], batch["sum_v"])
