"""Common-Crawl-style web-page table: deterministic synthetic source +
observation-interval derivation.

BASELINE.json input_hint pins the exact shape: ``(url:string,
warc_ts:timestamp, html:binary, text:string, lang:string)``. At 10^12 rows
this is an Iceberg table; here we synthesize it deterministically at small
scale (seeded, no external data) with the features the scale layer needs:

* Zipf-skewed page counts per domain → hot-domain skew for salting tests
* irregular per-url ``warc_ts`` sequences spanning ≥90 days → 1h/1d/30d
  tiers all hit non-aligned interval boundaries
* ``text``/``html`` deterministic functions of (url, visit index) → the
  byte-identity-per-url invariant is checkable end-to-end

Generation is distributed: a ``spark.range`` over page ids, all columns
derived with JVM-side expressions (xxhash64-based hashing) — no driver
loop, no Python UDF — so the same generator scales to any row count.

``observation_intervals`` turns visits into closed integer validity
windows [visit_time, next_visit_time - 1] per url (lead window), the
engine's x-table. This is the as-of construction SURVEY §1.5 describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LANGS = ("en", "de", "fr", "es", "zh", "ru", "ja", "pt")

#: epoch seconds of 2024-01-01T00:00:00Z — crawl window start
T0 = 1704067200
#: crawl window length: 120 days of seconds (≥90 days per FIXTURES F8)
SPAN = 120 * 86400


def _h(*cols, salt: int = 0):
    """Deterministic 64-bit hash column."""
    return F.xxhash64(*cols, F.lit(salt))


def synth_webpages(
    spark: SparkSession,
    n_pages: int = 500,
    n_domains: int = 40,
    visits_lambda: float = 8.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic synthetic web-page visit table with the input_hint
    schema ``(url, warc_ts, html, text, lang)``; one row per crawl visit.

    Zipf-ish domain assignment: page p belongs to domain
    ``floor(n_domains * (h%1)^3)`` — cubing a uniform concentrates mass on
    low domain ids, so domain 0 is hot (skew for the salting path).
    """
    pages = spark.range(n_pages).withColumnRenamed("id", "page_id")
    u = (F.pmod(_h("page_id", salt=seed), F.lit(10**9)) / F.lit(10**9.0))
    dom = F.floor(F.lit(float(n_domains)) * F.pow(u, F.lit(3.0))).cast("long")
    pages = pages.select(
        "page_id",
        F.concat(
            F.lit("https://d"), dom.cast("string"), F.lit(".example.org/p/"),
            F.col("page_id").cast("string"),
        ).alias("url"),
        (F.pmod(_h("page_id", salt=seed + 1), F.lit(len(LANGS)))).alias("__li"),
        # 1..~3*lambda visits per page, deterministic
        (F.pmod(_h("page_id", salt=seed + 2), F.lit(int(visits_lambda * 3))) + 1).alias("__nv"),
    )
    lang = F.element_at(F.array(*[F.lit(l) for l in LANGS]), F.col("__li").cast("int") + 1)
    visits = pages.select(
        "page_id", "url", lang.alias("lang"),
        F.explode(F.sequence(F.lit(0), F.col("__nv") - 1)).alias("visit_idx"),
    )
    # irregular timestamps: sorted deterministic pseudo-uniforms in the window
    frac = F.pmod(_h("url", "visit_idx", salt=seed + 3), F.lit(10**9)) / F.lit(10**9.0)
    ts_sec = (F.lit(T0) + (frac * F.lit(SPAN)).cast("long"))
    text = F.concat(
        F.lit("text:"), F.col("url"), F.lit("#"), F.col("visit_idx").cast("string"),
        F.lit(":"),
        F.repeat(F.lit("x"), F.pmod(_h("url", "visit_idx", salt=seed + 4), F.lit(2000)).cast("int") + 10),
    )
    return visits.select(
        "url",
        F.timestamp_seconds(ts_sec).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html>"), text, F.lit("</html>")), "utf-8").alias("html"),
        text.alias("text"),
        "lang",
    ).dropDuplicates(["url", "warc_ts"])


def observation_intervals(
    pages: DataFrame,
    unit: int = 3600,
    horizon: int | None = None,
) -> DataFrame:
    """Derive the engine's x-table from visit rows: per url, closed integer
    validity windows on the ``unit`` grid (default hours):

        start = floor(epoch(warc_ts)/unit)
        end   = next visit's start - 1   (last visit: capped at `horizon`
                or its own start — a 1-unit observation)

    Values carried per window (the north-star's series):
      * ``text_bytes``  — UTF-8 byte length of extracted text
      * ``crawl_gap``   — units since the previous visit (crawl activity)

    Output: (url, lang, start, end, text_bytes, crawl_gap) — non-overlapping
    within url by construction (lead window), ready for interval_average.
    """
    t = F.floor(F.unix_timestamp("warc_ts") / F.lit(unit)).cast("long")
    w = Window.partitionBy("url").orderBy("t")
    base = (
        pages.select(
            "url", "lang", t.alias("t"),
            F.octet_length("text").cast("double").alias("text_bytes"),
        )
        # two visits in the same unit: keep the later row's stats (dedup)
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("url", "t").orderBy(F.desc("text_bytes"))))
        .filter(F.col("__rn") == 1).drop("__rn")
    )
    nxt = F.lead("t").over(w)
    prev = F.lag("t").over(w)
    cap = F.lit(horizon) if horizon is not None else F.col("t")
    return base.select(
        "url", "lang",
        F.col("t").alias("start"),
        F.coalesce(nxt - 1, F.greatest(cap, F.col("t"))).alias("end"),
        "text_bytes",
        (F.col("t") - prev).cast("double").alias("crawl_gap"),
    )
