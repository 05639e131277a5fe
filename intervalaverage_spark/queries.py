"""Driver-contract queries: every implemented operator as a
(spark_callable, duckdb_oracle_sql) pair over /root/testdata parquet.

Conventions (driver compare is order-insensitive but NAME- and
VALUE-hash-sensitive):
  * every computed column aliased identically in Spark and SQL
  * every float column rounded to 6 decimals on BOTH sides
  * integer time domains only (epoch hours for events, epoch days for
    orders/lineitem) — avoids date/timestamp type mismatches across engines

The events-derived x table (per-user observation intervals from
consecutive event hours) mirrors the north-star's visit-validity windows
(FIXTURES.md F9); deterministic: in-hour dedup uses min(value).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from intervalaverage_spark import (
    cj,
    interval_average,
    interval_intersect,
    tier_grid,
)
from intervalaverage_spark.operators.isolate import isolate_overlaps
from intervalaverage_spark.operators.tiers import finalize, rollup_cascade, rollup_from_raw

# ------------------------------------------------------------ events → x

#: SQL twin of :func:`events_x` (keep in lockstep!)
X_EVENTS_SQL = """
pts AS (
  SELECT user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) AS h, min(value) AS v
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT user_id, h AS xs,
         COALESCE(lead(h) OVER (PARTITION BY user_id ORDER BY h) - 1, h + 23) AS xe,
         v
  FROM pts
)
"""


def events_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (
        ev.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
            "value",
        )
        .groupBy("user_id", "h")
        .agg(F.min("value").alias("v"))
    )
    w = Window.partitionBy("user_id").orderBy("h")
    return pts.select(
        "user_id",
        F.col("h").alias("start"),
        F.coalesce(F.lead("h").over(w) - 1, F.col("h") + 23).alias("end"),
        "v",
    )


def _events_grid(spark: SparkSession, sf_dir: str, width: int) -> DataFrame:
    x = events_x(spark, sf_dir)
    lohi = x.agg(F.min("start").alias("lo"), F.max("end").alias("hi")).first()
    return tier_grid(x.select("user_id").distinct(), lohi["lo"], lohi["hi"], width)


def _ia_oracle_sql(width: int, rp: float, sparse: bool) -> str:
    """interval_average / tier-rollup oracle: range join + weighted sums +
    gaps-and-islands maxgap on the unit grid. ``sparse`` keeps only covered
    windows (tier-state semantics); else dense grid with gap-fill rows.

    Σw·v accumulates in DECIMAL(38,12) — weights are exact integers, so the
    sum is exact, order-free and engine-independent; the compared ``value``
    is then one deterministic decimal→double cast + one IEEE division.
    Mirrors the Spark side exactly (operators/average.py _wv_term/_mean_of
    on the DECIMAL(26,12)-cast value column)."""
    value = (
        f"CASE WHEN COALESCE(a.nobs, 0) > 0 AND "
        f"100.0 * a.nobs / (y.ye - y.ys + 1) >= {rp} "
        f"THEN CAST(a.swv AS DOUBLE) / a.nobs END"
    )
    src = "JOIN" if sparse else "LEFT JOIN"
    return f"""
WITH {X_EVENTS_SQL},
b AS (SELECT CAST(floor(min(xs)/{width}.0) AS BIGINT) AS k0,
             CAST(floor(max(xe)/{width}.0) AS BIGINT) AS k1 FROM x),
y AS (
  SELECT user_id, {width}*k AS ys, {width}*k + {width} - 1 AS ye
  FROM (SELECT DISTINCT user_id FROM x), b, (SELECT UNNEST(generate_series(k0, k1)) AS k FROM b) ks
),
pairs AS (
  SELECT y.user_id, y.ys, y.ye,
         GREATEST(x.xs, y.ys) AS os, LEAST(x.xe, y.ye) AS oe, x.v
  FROM y JOIN x ON x.user_id = y.user_id AND x.xe >= y.ys AND x.xs <= y.ye
),
agg AS (
  -- integer sums cast back to BIGINT: DuckDB SUM(BIGINT) yields HUGEINT,
  -- which pandas renders as float64 and breaks the driver's value compare
  SELECT user_id, ys, ye,
         CAST(SUM(oe - os + 1) AS BIGINT) AS xduration,
         MIN(os) AS xminstart, MAX(oe) AS xmaxend,
         SUM(CASE WHEN v IS NOT NULL
                  THEN CAST(v AS DECIMAL(26,12)) * CAST(oe - os + 1 AS DECIMAL(10,0))
             END) AS swv,
         CAST(SUM(CASE WHEN v IS NOT NULL THEN oe - os + 1 END) AS BIGINT) AS nobs
  FROM pairs GROUP BY 1, 2, 3
),
grid AS (SELECT user_id, ys, ye, UNNEST(generate_series(ys, ye)) AS t FROM y),
cov AS (
  SELECT DISTINCT gr.user_id, gr.ys, gr.ye, gr.t
  FROM grid gr JOIN pairs p
    ON p.user_id = gr.user_id AND p.ys = gr.ys AND p.ye = gr.ye
   AND gr.t BETWEEN p.os AND p.oe AND p.v IS NOT NULL
),
unc AS (
  SELECT gr.user_id, gr.ys, gr.ye, gr.t,
         gr.t - ROW_NUMBER() OVER (PARTITION BY gr.user_id, gr.ys, gr.ye ORDER BY gr.t) AS grp
  FROM grid gr ANTI JOIN cov USING (user_id, ys, ye, t)
),
gaps AS (
  SELECT user_id, ys, ye, MAX(cnt) AS maxgap
  FROM (SELECT user_id, ys, ye, grp, COUNT(*) AS cnt FROM unc GROUP BY 1, 2, 3, 4)
  GROUP BY 1, 2, 3
)
SELECT y.user_id, y.ys AS start, y.ye AS "end",
       ROUND({value}, 6) AS value,
       y.ye - y.ys + 1 AS yduration,
       COALESCE(a.xduration, 0) AS xduration,
       COALESCE(a.nobs, 0) AS nobs_value,
       CAST(a.xminstart AS DOUBLE) AS xminstart,
       CAST(a.xmaxend AS DOUBLE) AS xmaxend,
       COALESCE(g.maxgap, 0) AS maxgap_value
FROM y {src} agg a ON a.user_id = y.user_id AND a.ys = y.ys AND a.ye = y.ye
LEFT JOIN gaps g ON g.user_id = y.user_id AND g.ys = y.ys AND g.ye = y.ye
"""


def _points_select(df: DataFrame) -> DataFrame:
    # xminstart/xmaxend as DOUBLE: they are NULL for unmatched-y rows, and a
    # nullable integer column turns into float64 in the oracle's pandas
    # frame — casting BOTH engines to double keeps the compared dtype (and
    # hash) identical; values are way below 2^53, so the cast is exact.
    return df.select(
        "user_id", "start", "end",
        F.round(F.col("value"), 6).alias("value"),
        "yduration", "xduration", "nobs_value",
        F.col("xminstart").cast("double").alias("xminstart"),
        F.col("xmaxend").cast("double").alias("xmaxend"),
        "maxgap_value",
    )


#: exact-arithmetic cast for the compared weighted mean (see _ia_oracle_sql)
_VALUE_DEC = "decimal(26,12)"


def q_interval_average_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = events_x(spark, sf_dir).withColumnRenamed("v", "value").withColumn(
        "value", F.col("value").cast(_VALUE_DEC)
    )
    y = _events_grid(spark, sf_dir, 24)
    # bucketed range join: 1500 users is low-cardinality for SMJ-with-
    # range-postfilter (per-user near-cartesian); weekly buckets measured
    # 1.7× faster (5.8s vs 9.6s at sf0.1/32 threads)
    out = interval_average(
        x, y, ("start", "end"), ["value"], ["user_id"],
        required_percentage=50, validate=False,
        strategy="bucket", bucket_width=168,
    )
    return _points_select(out)


def q_tier_rollup_events(width: int, cascade_from: int | None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        x = events_x(spark, sf_dir).withColumnRenamed("v", "value").withColumn(
            "value", F.col("value").cast(_VALUE_DEC)
        )
        if cascade_from:
            st = rollup_from_raw(x, cascade_from, ["value"], ["user_id"])
            st = rollup_cascade(st, cascade_from, width, ["value"], ["user_id"])
        else:
            st = rollup_from_raw(x, width, ["value"], ["user_id"])
        out = finalize(st, width, ["value"], ["user_id"], required_percentage=0)
        return _points_select(out)

    return run


def q_interval_intersect_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = events_x(spark, sf_dir)
    y = _events_grid(spark, sf_dir, 24).withColumnsRenamed({"start": "ws", "end": "we"})
    out = interval_intersect(
        x, y, {"start": "ws", "end": "we"}, group_vars=["user_id"],
        validate=False, strategy="bucket", bucket_width=168,
    )
    return out.select("user_id", "start", "end", F.round(F.col("v"), 6).alias("v"))


INTERSECT_EVENTS_SQL = f"""
WITH {X_EVENTS_SQL},
b AS (SELECT CAST(floor(min(xs)/24.0) AS BIGINT) AS k0,
             CAST(floor(max(xe)/24.0) AS BIGINT) AS k1 FROM x),
y AS (
  SELECT user_id, 24*k AS ys, 24*k + 23 AS ye
  FROM (SELECT DISTINCT user_id FROM x), b, (SELECT UNNEST(generate_series(k0, k1)) AS k FROM b) ks
)
SELECT y.user_id, GREATEST(x.xs, y.ys) AS start, LEAST(x.xe, y.ye) AS "end",
       ROUND(x.v, 6) AS v
FROM y JOIN x ON x.user_id = y.user_id AND x.xe >= y.ys AND x.xs <= y.ye
"""

ORDERS_X_SQL = """
ox AS (
  SELECT o_custkey AS custkey,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS s,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') + o_orderkey % 37 AS e
  FROM orders
)
"""


def orders_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        d.alias("s"),
        (d + F.pmod("o_orderkey", F.lit(37))).alias("e"),
    )


def q_isolate_overlaps_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = orders_x(spark, sf_dir)
    out = isolate_overlaps(x, ("s", "e"), ["custkey"], interval_vars_out=("start", "end"),
                           validate=False)
    return out.select("custkey", "start", "end", F.col("s").alias("s0"), F.col("e").alias("e0"))


ISOLATE_ORDERS_SQL = f"""
WITH {ORDERS_X_SQL},
pts AS (
  SELECT DISTINCT custkey, s AS value, 0 AS is_end FROM ox
  UNION SELECT DISTINCT custkey, e, 1 FROM ox
),
sw AS (
  SELECT custkey, value, is_end,
         lead(value) OVER w AS nv, lead(is_end) OVER w AS ne
  FROM pts WINDOW w AS (PARTITION BY custkey ORDER BY value, is_end)
),
frags AS (
  SELECT DISTINCT custkey,
         CASE WHEN is_end = 0 THEN value ELSE value + 1 END AS fs,
         CASE WHEN ne = 1 THEN nv ELSE nv - 1 END AS fe
  FROM sw WHERE nv IS NOT NULL
)
SELECT ox.custkey, f.fs AS start, f.fe AS "end", ox.s AS s0, ox.e AS e0
FROM (SELECT * FROM frags WHERE fs <= fe) f
JOIN ox ON ox.custkey = f.custkey AND f.fe >= ox.s AND f.fs <= ox.e
"""


def q_overlap_flags_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = orders_x(spark, sf_dir)
    w = Window.partitionBy("custkey").orderBy("s", "e")
    return (
        x.select("custkey", (F.col("s") <= F.lag("e").over(w)).alias("ov"))
        .groupBy("custkey")
        .agg(F.coalesce(F.max("ov"), F.lit(False)).alias("any_overlap"))
    )


OVERLAP_ORDERS_SQL = f"""
WITH {ORDERS_X_SQL},
fl AS (
  SELECT custkey, s <= lag(e) OVER (PARTITION BY custkey ORDER BY s, e) AS ov
  FROM ox
)
SELECT custkey, COALESCE(max(ov), FALSE) AS any_overlap FROM fl GROUP BY custkey
"""


def q_cj_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = spark.read.parquet(f"{sf_dir}/region.parquet").select("r_name")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_name")
    return cj(r, n)


def q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.groupBy(F.md5("text").alias("text_md5")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id")
    )


def q_lang_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.min("doc_id").alias("first_doc"),
    )


def q_topk_cosine_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = e.orderBy("vec_id").first()
    qv = F.array(*[F.lit(float(v)) for v in qrow["embedding"]])
    a = F.col("embedding").cast("array<double>")
    dot = F.aggregate(F.zip_with(a, qv, lambda u, v: u * v), F.lit(0.0), lambda s, p: s + p)
    na = F.sqrt(F.aggregate(F.transform(a, lambda u: u * u), F.lit(0.0), lambda s, p: s + p))
    nq = F.sqrt(F.aggregate(F.transform(qv, lambda u: u * u), F.lit(0.0), lambda s, p: s + p))
    return (
        e.filter(F.col("vec_id") != qrow["vec_id"])
        .select("vec_id", F.round(dot / (na * nq), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


TOPK_COSINE_SQL = """
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
FROM embeddings e, q WHERE e.vec_id <> q.qid
ORDER BY cosine DESC, e.vec_id LIMIT 10
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from intervalaverage_spark import queries_pipeline as qp

    return {
        "interval_average_events_daily": q_interval_average_events_daily,
        "tier_rollup_1d_events": q_tier_rollup_events(24, None),
        "tier_rollup_30d_events_cascade": q_tier_rollup_events(720, cascade_from=24),
        "interval_intersect_events_daily": q_interval_intersect_events_daily,
        "isolate_overlaps_orders": q_isolate_overlaps_orders,
        "overlap_flags_orders": q_overlap_flags_orders,
        "cj_region_nation": q_cj_region_nation,
        "dedup_exact_documents": q_dedup_exact_documents,
        "lang_stats_documents": q_lang_stats_documents,
        "topk_cosine_embeddings": q_topk_cosine_embeddings,
        **qp.queries(),
    }


def oracle_sql() -> dict[str, str]:
    from intervalaverage_spark import queries_pipeline as qp

    return {
        **qp.oracle_sql(),
        "interval_average_events_daily": _ia_oracle_sql(24, 50.0, sparse=False),
        "tier_rollup_1d_events": _ia_oracle_sql(24, 0.0, sparse=True),
        "tier_rollup_30d_events_cascade": _ia_oracle_sql(720, 0.0, sparse=True),
        "interval_intersect_events_daily": INTERSECT_EVENTS_SQL,
        "isolate_overlaps_orders": ISOLATE_ORDERS_SQL,
        "overlap_flags_orders": OVERLAP_ORDERS_SQL,
        "cj_region_nation": "SELECT r_name, n_name FROM region CROSS JOIN nation",
        "dedup_exact_documents": (
            "SELECT md5(text) AS text_md5, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id "
            "FROM documents GROUP BY 1"
        ),
        "lang_stats_documents": (
            "SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 6) AS avg_chars, "
            "MIN(doc_id) AS first_doc FROM documents GROUP BY 1"
        ),
        "topk_cosine_embeddings": TOPK_COSINE_SQL,
    }
