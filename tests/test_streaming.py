"""Structured-Streaming 1h tier: the streaming aggregate over a bounded
file stream must equal the same aggregate computed in batch (the sink
layout is what the batch cascade consumes)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark.sources.webts import synth_webpages
from intervalaverage_spark.streaming.rollup_stream import stream_hourly_state


@pytest.fixture(scope="module")
def visits_dir(spark):
    tmp = tempfile.mkdtemp(prefix="ia_stream_")
    pages = synth_webpages(spark, n_pages=80, n_domains=5)
    pages.withColumn("text_bytes", F.octet_length("text").cast("double")) \
        .select("url", "lang", "warc_ts", "text_bytes") \
        .write.mode("overwrite").parquet(tmp)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_equals_batch(spark, visits_dir):
    batch_df = spark.read.parquet(visits_dir)
    stream_src = (
        spark.readStream.schema(batch_df.schema).parquet(visits_dir)
    )
    state = stream_hourly_state(stream_src, delay="1 hour")
    q = (
        state.writeStream.format("memory").queryName("hourly")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hourly")

    v = F.col("text_bytes").cast("double")
    expected = (
        batch_df.groupBy("url", "lang", F.window("warc_ts", "1 hour").alias("w"))
        .agg(F.sum(v).alias("sum_v"), F.count(v).alias("n_obs"),
             F.min("warc_ts").alias("t_min"), F.max("warc_ts").alias("t_max"))
        .select("url", "lang",
                F.unix_timestamp("w.start").alias("ws"),
                (F.unix_timestamp("w.end") - 1).alias("we"),
                "sum_v", "n_obs", "t_min", "t_max")
    )
    assert got.count() == expected.count() > 0
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # hour windows are closed-integer tier windows: we == ws + 3599
    assert got.filter(F.col("we") != F.col("ws") + 3599).count() == 0
