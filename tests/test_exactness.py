"""Exact-arithmetic guarantees: integer fdiv beyond 2^53, duplicate-
sensitive bucket fingerprints, and decimal Σw·v determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from intervalaverage_spark.operators.average import interval_average
from intervalaverage_spark.plans.checkpoint import fingerprint_partitions
from intervalaverage_spark.plans.rangejoin import fdiv


def test_fdiv_exact_beyond_double_precision(spark):
    # 2^60 + 1 is not representable as a double; double-division fdiv
    # would round. Also check floor (not truncate) semantics on negatives.
    vals = [(1 << 60) + 1, -((1 << 60) + 1), -7, -6, -1, 0, 1, 6, 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["q"]
        for r in df.select("v", fdiv(F.col("v"), 3).alias("q")).collect()
    }
    for v in vals:
        assert got[v] == v // 3, (v, got[v], v // 3)


def test_fingerprint_sensitive_to_duplicate_pairs(spark):
    # XOR-of-hashes cancels an even number of identical added rows; the
    # modular-sum fingerprint must not.
    base = spark.createDataFrame([(0, i, "u") for i in range(10)], "p long, t long, url string")
    dup_row = spark.createDataFrame([(0, 3, "u"), (0, 3, "u")], "p long, t long, url string")
    fp0 = fingerprint_partitions(base).first()
    fp2 = fingerprint_partitions(base.unionAll(dup_row)).first()
    assert fp0["rows"] == 10 and fp2["rows"] == 12
    assert fp0["fingerprint"] != fp2["fingerprint"]
    # and it stays order-insensitive
    fp_rev = fingerprint_partitions(base.orderBy(F.desc("t"))).first()
    assert fp_rev["fingerprint"] == fp0["fingerprint"]


def test_decimal_weighted_mean_matches_double_path(spark):
    x = spark.createDataFrame(
        [(1, 0, 9, 10.5), (1, 10, 19, 20.25), (2, 0, 4, None)],
        "g long, start long, end long, value double",
    )
    y = spark.createDataFrame([(1, 0, 19), (2, 0, 9)], "g long, start long, end long")
    kw = dict(interval_vars=("start", "end"), value_vars=["value"],
              group_vars=["g"], required_percentage=0, validate=False)
    dbl = interval_average(x, y, **kw)
    dec = interval_average(
        x.withColumn("value", F.col("value").cast("decimal(26,12)")), y, **kw
    )
    assert dbl.schema == dec.schema  # output stays double either way
    a = sorted(map(tuple, dbl.collect()))
    b = sorted(map(tuple, dec.collect()))
    assert len(a) == len(b) == 2
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float):
                assert vb is not None and abs(va - vb) < 1e-9
            else:
                assert va == vb
