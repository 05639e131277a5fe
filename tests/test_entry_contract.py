"""Mimics the driver's correctness gate: every queries() entry runs on
Spark AND its oracle_sql() twin runs on DuckDB over the same parquet;
row-count, column names, and values must match (order-insensitive)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    pdf = ddb.execute(sql).fetchdf()
    scols = sorted(sdf.columns)
    ocols = sorted(pdf.columns)
    assert scols == ocols, f"column names differ: {scols} vs {ocols}"
    orows = pdf.where(pdf.notnull(), None).to_dict("records")
    a = _norm(srows, scols)
    b = _norm(orows, scols)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    mismatches = [i for i, (ra, rb) in enumerate(zip(a, b)) if ra != rb]
    assert not mismatches, f"{name}: first mismatch {a[mismatches[0]]} vs {b[mismatches[0]]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 5
