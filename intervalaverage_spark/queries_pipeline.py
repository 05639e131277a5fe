"""Driver-contract queries for the training-data-pipeline operators
(text analysis, fuzzy dedup, ANN, multimodal) over the documents /
embeddings testdata tables, each with a DuckDB oracle.

Cross-engine determinism rules (same as queries.py, plus):
  * all hashes are md5 hex strings — identical in Spark and DuckDB;
  * LSH hyperplanes are pure-integer-arithmetic literals inlined into BOTH
    the Spark plan and the SQL text (functions/ann.py plane_weight);
  * float expressions mirror operation ORDER exactly (left-to-right
    folds), so IEEE doubles agree bit-for-bit before the 6-dp round.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from intervalaverage_spark.functions import ann
from intervalaverage_spark.functions.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from intervalaverage_spark.functions.multimodal import decode_media
from intervalaverage_spark.functions.textstats import (
    LANG_MARKERS,
    STOPWORDS,
    TOKEN_RE,
    text_stats,
)

_HEXD = "0123456789abcdef"

#: shared SQL fragment: whitespace tokens per doc (empty-filtered)
_TOKS_SQL = r"""
toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents
)
"""

#: shared SQL fragment: distinct word 3-grams per doc (len>=3 → grams,
#: else whole text), mirroring functions/dedup.py shingles(n=3)
_SHINGLES_SQL = _TOKS_SQL + r""",
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 3
              THEN list_distinct([array_to_string(tk[i:i+2], ' ')
                                  for i in range(1, len(tk) - 1)])
              ELSE [array_to_string(tk, ' ')] END AS s
  FROM toks
)
"""


# -------------------------------------------------------------- text stats

def q_text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_stats(d.select("doc_id", "text")).drop("text")


def _text_stats_sql() -> str:
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"len(list_filter(tk, x -> list_contains([{arr}], lower(x)))) AS s_{lang}"
        )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lg} = {best} AND {best} > 0 THEN '{lg}'" for lg in langs
    ) + " ELSE 'und' END"
    return rf"""
WITH {_TOKS_SQL},
st AS (
  SELECT doc_id, text, tk,
         len(tk) AS n_tokens,
         len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_bpe_tokens,
         CASE WHEN length(text) > 0
              THEN len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) / length(text)
              ELSE 0.0 END AS pr,
         CASE WHEN len(tk) > 0
              THEN len(list_filter(tk, x -> list_contains([{sw}], lower(x)))) / len(tk)
              ELSE 0.0 END AS sr,
         {", ".join(score_cols)},
         CASE WHEN len(tk) >= 3
              THEN list_min([md5(array_to_string(tk[i:i+2], ' '))
                             for i in range(1, len(tk) - 1)])
              ELSE md5(array_to_string(tk, ' ')) END AS fingerprint
  FROM toks
)
SELECT doc_id, n_tokens, n_bpe_tokens,
       floor(pr * 1000000.0) / 1000000.0 AS punct_ratio,
       floor(sr * 1000000.0) / 1000000.0 AS stopword_ratio,
       floor((least(length(text) / 500.0, 1.0) * 0.4
              + (1.0 - least(pr * 5.0, 1.0)) * 0.3
              + least(sr * 5.0, 1.0) * 0.3) * 1000000.0) / 1000000.0 AS quality,
       {case} AS lang_pred,
       fingerprint
FROM st
"""


def q_repetition_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/Dolma-style within-doc repetition signals (duplicate-line
    fractions + repeated / top n-gram character coverage) — the quality-
    filter family a curation pipeline gates on before dedup."""
    from intervalaverage_spark.functions.textstats import repetition_stats

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = repetition_stats(d.select("doc_id", "text"), ns=(2, 3))
    return out.select(
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
        "dup_2gram_frac", "top_2gram_char_frac",
        "dup_3gram_frac", "top_3gram_char_frac",
    )


def _repetition_sql() -> str:
    def gfrag(n: int) -> str:
        # non-distinct n-grams with multiplicity; mirrors ngram_list
        return (
            f"g{n} AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= {n} THEN "
            f"[array_to_string(tk[i:i+{n - 1}], ' ') "
            f"for i in range(1, len(tk) - {n} + 2)] "
            "ELSE [] END) AS g FROM toks),\n"
            f"gc{n} AS (SELECT doc_id, g, COUNT(*) AS c FROM g{n} GROUP BY 1, 2),\n"
            f"gs{n} AS (SELECT doc_id, SUM(c) AS tot, COUNT(*) AS dst,\n"
            f"          MAX(struct_pack(c := c, l := length(g), g := g)) AS top\n"
            f"          FROM gc{n} GROUP BY 1)"
        )

    def gcols(n: int) -> str:
        return (
            f"floor(CASE WHEN gs{n}.tot > 0 THEN (gs{n}.tot - gs{n}.dst) / gs{n}.tot "
            f"ELSE 0.0 END * 1000000.0) / 1000000.0 AS dup_{n}gram_frac,\n"
            f"       floor(CASE WHEN length(d.text) > 0 THEN "
            f"COALESCE(struct_extract(gs{n}.top, 'c') * struct_extract(gs{n}.top, 'l'), 0) "
            f"/ length(d.text) ELSE 0.0 END * 1000000.0) / 1000000.0 "
            f"AS top_{n}gram_char_frac"
        )

    return f"""
WITH {_TOKS_SQL},
ln AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents),
lc AS (SELECT doc_id, l, COUNT(*) AS c FROM ln GROUP BY 1, 2),
lstat AS (
  SELECT doc_id, SUM(c)::BIGINT AS n_lines,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dl,
         SUM(CASE WHEN c > 1 THEN length(l) * c ELSE 0 END) AS dlc,
         SUM(length(l) * c) AS lc2
  FROM lc GROUP BY 1
),
{gfrag(2)},
{gfrag(3)}
SELECT d.doc_id, COALESCE(lstat.n_lines, 0) AS n_lines,
       floor(CASE WHEN lstat.n_lines > 0 THEN lstat.dl / lstat.n_lines
             ELSE 0.0 END * 1000000.0) / 1000000.0 AS dup_line_frac,
       floor(CASE WHEN lstat.lc2 > 0 THEN lstat.dlc / lstat.lc2
             ELSE 0.0 END * 1000000.0) / 1000000.0 AS dup_line_char_frac,
       {gcols(2)},
       {gcols(3)}
FROM documents d
LEFT JOIN lstat USING (doc_id)
LEFT JOIN gs2 ON gs2.doc_id = d.doc_id
LEFT JOIN gs3 ON gs3.doc_id = d.doc_id
"""


def q_streaming_text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming on the WEB-TEXT axis: documents as a bounded file stream
    (availableNow), :func:`text_stats` applied per micro-batch — a pure
    stateless projection, so no watermark and no state store — into a
    memory sink. The oracle is the SAME batch text-stats SQL: a stateless
    streaming map must be indistinguishable from batch (the timeseries
    streaming rows prove the stateful/windowed side; this pins the
    stateless side of the streaming surface)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select("doc_id", "text")
    )
    out = text_stats(src).drop("text")
    name = "q_streaming_text_stats_documents"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_text_stats: availableNow query did not finish "
            "within 300s; refusing to compare a truncated sink"
        )
    q.stop()
    return spark.table(name)


# ------------------------------------------------------------ fuzzy dedup

#: stop-shingle document-frequency cap — bounds the inverted-index
#: self-join fan-out (a boilerplate shingle shared by 10^6 docs makes the
#: candidate join quadratic at 100 TB). Mirrored exactly in the oracle.
NGRAM_MAX_DF = 256


def q_ngram_jaccard_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5,
                               max_df=NGRAM_MAX_DF)


# mirrors ngram_jaccard_pairs WITH the max_df cap: shingles with document
# frequency > max_df are dropped from the inverted index BEFORE the
# self-join (bounding candidate fan-out) — but candidates are scored by
# TRUE Jaccard over the FULL shingle sets, exactly the Spark plan's
# semantics (Spark computes the same integer as kept_common + |hot∩hot|;
# the oracle uses the equivalent full-list intersect).
NGRAM_JACCARD_SQL = rf"""
WITH {_SHINGLES_SQL},
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
hot AS (SELECT g FROM ex GROUP BY g HAVING COUNT(*) > {NGRAM_MAX_DF}),
kept AS (SELECT ex.* FROM ex ANTI JOIN hot USING (g)),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
),
v AS (
  SELECT c.id1, c.id2,
         len(list_intersect(x.s, y.s))
           / (x.sz + y.sz - len(list_intersect(x.s, y.s))) AS j
  FROM cand c
  JOIN (SELECT doc_id, s, len(s) AS sz FROM sh) x ON x.doc_id = c.id1
  JOIN (SELECT doc_id, s, len(s) AS sz FROM sh) y ON y.doc_id = c.id2
)
SELECT id1, id2, ROUND(j, 6) AS jaccard FROM v WHERE ROUND(j, 6) >= 0.5
"""


def q_prefix_jaccard_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard pairs (E74, functions/dedup.py
    prefix_jaccard_pairs): the PPJoin prefix + length filters prune
    candidates LOSSLESSLY (no max_df recall knob), then full-set verify.
    The oracle is deliberately the brute-force all-pairs scan — every
    driver round re-proves that the pruning drops no qualifying pair."""
    from intervalaverage_spark.functions.dedup import prefix_jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return prefix_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)


# brute force on purpose: candidates from the FULL inverted index (no
# cap, no prefix) — if the Spark side's prefix/length pruning lost a
# pair, this row goes red
PREFIX_JACCARD_SQL = rf"""
WITH {_SHINGLES_SQL},
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
),
v AS (
  SELECT c.id1, c.id2,
         len(list_intersect(x.s, y.s))
           / (x.sz + y.sz - len(list_intersect(x.s, y.s))) AS j
  FROM cand c
  JOIN (SELECT doc_id, s, len(s) AS sz FROM sh) x ON x.doc_id = c.id1
  JOIN (SELECT doc_id, s, len(s) AS sz FROM sh) y ON y.doc_id = c.id2
)
SELECT id1, id2, ROUND(j, 6) AS jaccard FROM v WHERE ROUND(j, 6) >= 0.5
"""


def q_hll_daily_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed distinct counting (E78): the E58 HLL sketch folded PER
    TIME BUCKET — "distinct users per day" as ≤2^b register rows per
    day, the shape a 30d tier stores so per-day sketches MERGE into
    per-month distincts without recounting (hll_merge is a max — the
    property COUNT(DISTINCT) fundamentally lacks). n_true rides along
    per bucket (tiny here; at 10^12 rows it is the quantity you can no
    longer afford — the sketch is the point)."""
    from intervalaverage_spark.functions.hll import (
        hll_estimate,
        hll_registers,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        "user_id",
    )
    regs = hll_registers(pts, "user_id", b=4, seed="hll7",
                         group_cols=["day"])
    est = hll_estimate(regs, 4, group_cols=["day"])
    true = pts.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_true"))
    return true.join(est, "day").select("day", "n_true", "hll_est")


def _hll_daily_sql() -> str:
    return f"""
WITH pts AS (
  SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day, user_id
  FROM events),
regs AS ({_hll_sketch_sql('pts', 'user_id', 'day', 4)}),
est AS (SELECT day, {_hll_estimate_sql(4, 0.673)} AS hll_est
        FROM regs GROUP BY day),
tr AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
       FROM pts GROUP BY day)
SELECT tr.day AS day, n_true, hll_est FROM tr JOIN est USING (day)
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (E77, functions/packing.py
    chunk_documents): every document split into 40-token windows with
    8-token overlap — the pre-packing training op (compose chunk →
    pack_sequences for the full pipeline). Pure map, zero shuffle; the
    oracle replays starts/slices in DuckDB list arithmetic."""
    from intervalaverage_spark.functions.packing import chunk_documents

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(d, "doc_id", "text",
                           chunk_tokens=40, overlap_tokens=8)


_CHUNK_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents),
st AS (
  SELECT doc_id, tk, len(tk) AS n,
         unnest(range(1, GREATEST(len(tk) - 8, 1) + 1, 32)) AS s
  FROM tk)
SELECT doc_id,
       CAST((s - 1) // 32 AS INTEGER) AS chunk_id,
       CAST(s AS INTEGER) AS start_token,
       CAST(len(list_slice(tk, s, LEAST(s + 39, n))) AS BIGINT)
         AS n_tokens,
       COALESCE(array_to_string(list_slice(tk, s, LEAST(s + 39, n)), ' '),
                '') AS chunk_text
FROM st
"""


def q_skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostics (E76, plans/skew.py skew_profile): the per-user
    row-count distribution of the event stream as one summary row —
    exact count percentiles + the max/p50 straggler predictor. The
    north rule's 'skew handled explicitly' as queryable data."""
    from intervalaverage_spark.plans.skew import skew_profile

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return skew_profile(ev, ["user_id"])


_SKEW_PROFILE_SQL = """
WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
a AS (
  SELECT COUNT(*) AS n_keys, SUM(n) AS n_rows, MAX(n) AS max_rows,
         quantile_cont(CAST(n AS DOUBLE), 0.5) AS p50,
         quantile_cont(CAST(n AS DOUBLE), 0.95) AS p95,
         quantile_cont(CAST(n AS DOUBLE), 0.99) AS p99
  FROM c)
SELECT CAST(n_keys AS BIGINT) AS n_keys, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(max_rows AS BIGINT) AS max_rows,
       ROUND(p50, 6) AS p50_rows, ROUND(p95, 6) AS p95_rows,
       ROUND(p99, 6) AS p99_rows,
       CASE WHEN p50 > 0.0
            THEN ROUND(CAST(max_rows AS DOUBLE) / p50, 6) END AS skew_ratio
FROM a
"""


def q_salt_plan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt planning (E76, plans/skew.py salt_plan): per-hot-key salt
    factors ceil(rows/64) in exact integer arithmetic — the rangejoin
    hot-only path's inputs derived from data instead of folklore."""
    from intervalaverage_spark.plans.skew import salt_plan

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return salt_plan(ev, ["event_type"], rows_per_task=64)


_SALT_PLAN_SQL = """
WITH c AS (SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY 1)
SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows,
       CAST((n_rows + 63) // 64 AS BIGINT) AS salt
FROM c WHERE n_rows > 64
"""


def q_url_normalize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (E75, functions/urlnorm.py): deterministic
    messy URLs built from doc_id (mixed case, userinfo, www, default +
    explicit ports, trailing slashes, tracking params, unsorted query,
    fragments) are normalized by the module's documented rule set, plus
    host and heuristic registered-domain extraction. All whole-stage-
    codegen expressions — at 10^12 rows this is a free map on the scan.
    The oracle replays the rules 1:1 in DuckDB's regex/list dialect."""
    from intervalaverage_spark.functions import urlnorm as U

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    raw = F.concat(
        F.when(did % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(did % 11 == 0, F.lit("user:pw@")).otherwise(F.lit("")),
        F.lit("WWW.Host"), s(did % 37), F.lit(".Example."),
        F.when(did % 5 == 0, F.lit("CO.UK")).otherwise(F.lit("COM")),
        F.when(did % 4 == 0, F.lit(":80"))
        .when(did % 4 == 1, F.lit(":443"))
        .when(did % 4 == 2, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/Path/"), s(did % 13),
        F.when(did % 3 == 0, F.lit("///"))
        .when(did % 3 == 1, F.lit("/"))
        .otherwise(F.lit("")),
        F.when(did % 2 == 0,
               F.lit("?b=2&utm_source=x&a=1&ref=z&")).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    host = U.url_host(raw)
    return d.select(
        "doc_id",
        U.url_normalize(raw).alias("url_norm"),
        host.alias("host"),
        U.url_registered_domain(host).alias("reg_domain"),
    )


_URLNORM_SQL = r"""
WITH u AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://' ||
    CASE WHEN doc_id % 11 = 0 THEN 'user:pw@' ELSE '' END ||
    'WWW.Host' || CAST(doc_id % 37 AS VARCHAR) || '.Example.' ||
    CASE WHEN doc_id % 5 = 0 THEN 'CO.UK' ELSE 'COM' END ||
    CASE WHEN doc_id % 4 = 0 THEN ':80' WHEN doc_id % 4 = 1 THEN ':443'
         WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END ||
    '/Path/' || CAST(doc_id % 13 AS VARCHAR) ||
    CASE WHEN doc_id % 3 = 0 THEN '///' WHEN doc_id % 3 = 1 THEN '/'
         ELSE '' END ||
    CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=x&a=1&ref=z&'
         ELSE '' END ||
    CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END AS raw
  FROM documents),
p AS (
  SELECT doc_id,
    lower(regexp_extract(raw, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1))
      AS scheme,
    regexp_replace(
      lower(regexp_replace(
        regexp_replace(
          regexp_extract(raw, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1),
          '^[^@]*@', ''),
        ':[0-9]*$', '')),
      '^www\.', '') AS host,
    regexp_extract(
      regexp_replace(
        regexp_extract(raw, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1),
        '^[^@]*@', ''),
      ':([0-9]+)$', 1) AS port,
    regexp_extract(raw, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1)
      AS path,
    regexp_extract(raw, '\?([^#]*)', 1) AS q
  FROM u),
n AS (
  SELECT doc_id, scheme, host, port,
    CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
         ELSE regexp_replace(path, '/+$', '') END AS path_norm,
    array_to_string(
      list_sort(list_filter(string_split(q, '&'),
        x -> x <> '' AND NOT regexp_matches(
               x, '^(utm_[^=]*|gclid|fbclid|ref|msclkid)(=|$)'))),
      '&') AS qs
  FROM p)
SELECT doc_id,
  scheme || '://' || host ||
  CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
            AND NOT (scheme = 'https' AND port = '443')
       THEN ':' || port ELSE '' END ||
  path_norm ||
  CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS url_norm,
  host,
  CASE WHEN len(string_split(host, '.')) <= 1 THEN host
       WHEN len(string_split(host, '.')) >= 3
            AND list_contains(
                  ['co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
                   'org.au','co.jp','ne.jp','or.jp','com.br','com.cn',
                   'com.mx','com.ar','com.tr','co.in','co.kr','co.za',
                   'co.nz'],
                  string_split(host, '.')[-2] || '.'
                  || string_split(host, '.')[-1])
       THEN string_split(host, '.')[-3] || '.'
            || string_split(host, '.')[-2] || '.'
            || string_split(host, '.')[-1]
       ELSE string_split(host, '.')[-2] || '.'
            || string_split(host, '.')[-1] END AS reg_domain
FROM n
"""


def q_minhash_lsh_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=16, bands=4,
                             threshold=0.5)


def _minhash_lsh_sql(num_hashes: int = 16, bands: int = 4, threshold: float = 0.5,
                     pair_filter: str = "") -> str:
    """``pair_filter``: extra predicate on the FINAL (id1, id2) pairs —
    the incremental-dedup oracle restricts the full-corpus recompute to
    pairs touching the delta (the incremental contract)."""
    r = num_hashes // bands
    mins = ",\n         ".join(
        f"min(md5('{j}:' || g)) AS mh_{j}" for j in range(num_hashes)
    )
    band_rows = ", ".join(
        "(%d, md5(%s))" % (
            b, " || '|' || ".join(f"mh_{b * r + i}" for i in range(r)),
        )
        for b in range(bands)
    )
    return rf"""
WITH {_SHINGLES_SQL},
g AS (SELECT doc_id, unnest(s) AS g FROM sh),
sig AS (
  SELECT doc_id,
         {mins}
  FROM g GROUP BY doc_id
),
bandkeys AS (
  SELECT doc_id, b.* FROM sig,
         LATERAL (SELECT * FROM (VALUES {band_rows}) t(band, bkey)) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bandkeys a JOIN bandkeys b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
v AS (
  SELECT c.id1, c.id2,
         len(list_intersect(x.s, y.s))
           / (x.sz + y.sz - len(list_intersect(x.s, y.s))) AS j
  FROM cand c
  JOIN (SELECT doc_id, s, len(s) AS sz FROM sh) x ON x.doc_id = c.id1
  JOIN (SELECT doc_id, s, len(s) AS sz FROM sh) y ON y.doc_id = c.id2
)
SELECT id1, id2, ROUND(j, 6) AS jaccard FROM v WHERE ROUND(j, 6) >= {threshold}{pair_filter}
"""


#: the delta split for the incremental-dedup driver row: every 10th doc
#: plays the "new crawl snapshot" arriving against the other 90 %
_INC_DELTA_PRED = "doc_id % 10 = 0"


def q_incremental_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (delta) dedup — the crawl-snapshot ingest path, driver-
    oracled end to end. The corpus is split 90/10: the 90 % plays the
    EXISTING corpus whose band index was persisted at its own ingest
    (written to parquet here, read back — the real round-trip), the 10 %
    plays the newly arrived batch. Candidates are generated ONLY from the
    delta's band keys probing the index (broadcast delta — the index side
    never shuffles); verified pairs must equal the whole-corpus LSH
    recompute restricted to delta-touching pairs, which is exactly what
    the oracle computes (same banded minhash, ``pair_filter``)."""
    from intervalaverage_spark.functions.dedup import (
        incremental_minhash_lsh_pairs,
        minhash_band_index,
    )
    from intervalaverage_spark.queries import _scratch_dir

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    delta = d.filter(F.expr(_INC_DELTA_PRED))
    base = d.filter(~F.expr(_INC_DELTA_PRED))
    idx_dir = _scratch_dir("inc_dedup_index")
    minhash_band_index(base, "doc_id", "text", n=3, num_hashes=16,
                       bands=4).write.mode("overwrite").parquet(idx_dir)
    index = spark.read.parquet(idx_dir)
    pairs, _new_bands = incremental_minhash_lsh_pairs(
        d, delta, index, "doc_id", "text", n=3, num_hashes=16, bands=4,
        threshold=0.5,
    )
    return pairs


def q_simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3)


def _simhash_sql(max_hamming: int = 3) -> str:
    votes = []
    for b in range(60):
        nib, sh = divmod(b, 4)
        mask = 1 << (3 - sh)
        votes.append(
            f"SUM(CASE WHEN (strpos('{_HEXD}', substr(hx, {nib + 1}, 1)) - 1) "
            f"& {mask} > 0 THEN 1 ELSE -1 END) AS v{b}"
        )
    simbits = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(60)
    )
    chunks = ", ".join(f"({c}, (sim >> {c * 15}) & 32767)" for c in range(4))
    return rf"""
WITH {_TOKS_SQL},
h AS (SELECT doc_id, substr(md5(unnest(tk)), 1, 15) AS hx FROM toks),
votes AS (
  SELECT doc_id, {", ".join(votes)}
  FROM h GROUP BY doc_id
),
simt AS (SELECT doc_id, {simbits} AS sim FROM votes),
ck AS (
  SELECT doc_id, sim, c.* FROM simt,
         LATERAL (SELECT * FROM (VALUES {chunks}) t(chunk, ckey)) c
),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
         a.sim AS s1, b.sim AS s2
  FROM ck a JOIN ck b
    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id
)
SELECT id1, id2, bit_count(xor(s1, s2))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(s1, s2)) <= {max_hamming}
"""


# ------------------------------------------------------- embeddings / ANN

def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from intervalaverage_spark.functions.dedup import embedding_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(e, "vec_id", "embedding", threshold=0.4)


EMBEDDING_NEARDUP_SQL = """
WITH p AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS c
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id1, id2, ROUND(c, 6) AS cosine FROM p WHERE ROUND(c, 6) >= 0.4
"""

def q_shard_assign_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing via the distributed prefix sum
    (functions/sharding.py): docs in id order, ~2000 whitespace tokens per
    shard. Exact integer math — the oracle is one SUM() OVER (ORDER BY)."""
    from intervalaverage_spark.functions.sharding import assign_shards
    from intervalaverage_spark.functions.textstats import tokens

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = d.select("doc_id", F.size(tokens("text")).cast("long").alias("n_tokens"))
    return assign_shards(t, "doc_id", "n_tokens", shard_weight=2000)


SHARD_ASSIGN_SQL = rf"""
WITH {_TOKS_SQL},
t AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM toks),
c AS (SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_weight
      FROM t)
SELECT doc_id, n_tokens, cum_weight,
       CAST((cum_weight - n_tokens) // 2000 AS BIGINT) AS shard
FROM c
"""


def q_dedup_clusters_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS (not just pairs): connected components over the
    MinHash-LSH near-dup graph — every doc with its canonical id and
    cluster size. Iterative min-label propagation on the Spark side; the
    oracle computes the same fixpoint with a recursive CTE."""
    from intervalaverage_spark.functions.dedup import dedup_clusters

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=16, bands=4,
                              threshold=0.5)
    return dedup_clusters(d.select("doc_id"), pairs)


def _dedup_clusters_sql() -> str:
    inner = _minhash_lsh_sql()
    return f"""
WITH RECURSIVE
p AS (SELECT id1, id2 FROM ({inner})),
e AS (SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p),
walk(n, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, w.lab FROM walk w JOIN e ON e.a = w.n
),
comp AS (SELECT n AS doc_id, MIN(lab) AS canonical_id FROM walk GROUP BY n)
SELECT c.doc_id, c.canonical_id, CAST(s.cnt AS BIGINT) AS cluster_size
FROM comp c
JOIN (SELECT canonical_id, COUNT(*) AS cnt FROM comp GROUP BY 1) s
  USING (canonical_id)
"""


def q_weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (E60): per language, the
    20 docs with the largest Efraimidis–Spirakis priority u^(1/n_chars)
    — selection probability rises with document length. The oracle
    replays the md5 uniform, the 6-dp-rounded pow, and the
    (priority desc, uniform asc) rank exactly."""
    from intervalaverage_spark.functions.sampling import weighted_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = weighted_sample(d, 20, "n_chars", ["doc_id"],
                          group_cols=["lang"], seed="ws7")
    return out.select("lang", "doc_id", "n_chars", "sample_priority")


def _weighted_sample_sql() -> str:
    u = _u_sql("doc_id", "ws7")
    return f"""
WITH p AS (
  SELECT lang, doc_id, n_chars,
         ROUND(pow({u}, 1.0 / CAST(n_chars AS DOUBLE)), 6) AS sample_priority
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
r AS (
  SELECT *, row_number() OVER (PARTITION BY lang
             ORDER BY sample_priority DESC, {u} ASC) AS rn
  FROM p)
SELECT lang, doc_id, n_chars, sample_priority FROM r WHERE rn <= 20
"""


def q_cluster_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test splits (E54): near-dup clusters from
    MinHash-LSH + connected components, split keyed on the CLUSTER's
    canonical id — so no near-duplicate pair can straddle a split
    boundary — alongside the naive doc-keyed label for contrast. The
    oracle replays clusters (recursive CTE) and both md5 split
    decisions; tests/test_round7c.py audits straddle counts (cluster
    split: always 0; naive: >0 on the planted families)."""
    from intervalaverage_spark.functions.dedup import dedup_clusters
    from intervalaverage_spark.functions.sampling import (
        assign_splits,
        leakage_safe_splits,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=16, bands=4,
                              threshold=0.5)
    clusters = dedup_clusters(d.select("doc_id"), pairs)
    out = leakage_safe_splits(
        clusters, {"train": 0.9, "val": 0.05, "test": 0.05}, seed="lsplit7")
    out = assign_splits(out, {"train": 0.9, "val": 0.05, "test": 0.05},
                        ["doc_id"], seed="lsplit7", out_col="naive_split")
    return out.select("doc_id", "canonical_id", "cluster_size",
                      "split", "naive_split")


def _cluster_split_sql() -> str:
    uc = _u_sql("canonical_id", "lsplit7")
    ud = _u_sql("doc_id", "lsplit7")
    return f"""
SELECT doc_id, canonical_id, cluster_size,
       CASE WHEN {uc} < 0.9 THEN 'train'
            WHEN {uc} < 0.95 THEN 'val'
            ELSE 'test' END AS split,
       CASE WHEN {ud} < 0.9 THEN 'train'
            WHEN {ud} < 0.95 THEN 'val'
            ELSE 'test' END AS naive_split
FROM ({_dedup_clusters_sql()})
"""


#: bloom driver-query parameters — small m so the sf0.01 fixture exercises
#: real collision pressure (n≈333 distinct member fps → theory fp ≈ 5e-4)
_BLOOM_M, _BLOOM_K, _BLOOM_SEED = 16384, 4, "bloomq7"


def q_bloom_membership_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter corpus membership (E55): build the constant-size
    bitset over the text fingerprints of a 2/3 'corpus' subset, probe
    EVERY doc. ``maybe_present=False`` ⟹ definitely-new (the dedup-safe
    direction); ground truth rides along as ``fp_in_corpus``. The
    oracle replays the md5 bit positions, the bit_or word fold, and the
    all-k-bits probe — pure integer arithmetic, so even a false
    positive reproduces bit-for-bit cross-engine."""
    from intervalaverage_spark.functions.bloom import bloom_build, bloom_probe

    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .select("doc_id", F.md5("text").alias("fp")))
    members = (d.filter(F.col("doc_id") % 3 != 0)
               .select("fp").distinct())
    words = bloom_build(members, "fp", _BLOOM_M, _BLOOM_K, seed=_BLOOM_SEED)
    probed = bloom_probe(d, "fp", words, _BLOOM_M, _BLOOM_K,
                         seed=_BLOOM_SEED)
    return (
        probed.join(members.withColumn("__m", F.lit(True)), "fp", "left")
        .select("doc_id",
                F.col("__m").isNotNull().alias("fp_in_corpus"),
                "maybe_present")
    )


def _bloom_sql() -> str:
    m, k, seed = _BLOOM_M, _BLOOM_K, _BLOOM_SEED

    def pos(key: str) -> str:
        return (f"CAST(('0x' || substr(md5(concat_ws(chr(31), '{seed}', "
                f"CAST(i AS VARCHAR), {key})), 1, 12)) AS BIGINT) % {m}")

    return f"""
WITH members AS (
  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0),
bpos AS (
  SELECT {pos('fp')} AS p FROM members, range({k}) t(i)),
words AS (
  SELECT p // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS word
  FROM bpos GROUP BY 1),
docs AS (SELECT doc_id, md5(text) AS fp FROM documents),
ppos AS (
  SELECT doc_id, fp, {pos('fp')} AS p FROM docs, range({k}) t(i)),
verdict AS (
  SELECT doc_id, fp,
         COUNT(*) FILTER (WHERE w.word IS NOT NULL AND
           (w.word & (CAST(1 AS BIGINT) << CAST(p % 32 AS INT))) <> 0)
           = {k} AS maybe_present
  FROM ppos LEFT JOIN words w ON w.word_idx = p // 32
  GROUP BY doc_id, fp)
SELECT v.doc_id, (m.fp IS NOT NULL) AS fp_in_corpus, v.maybe_present
FROM verdict v LEFT JOIN members m ON m.fp = v.fp
"""


def q_embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path of embedding near-dup: SRP-bucket blocking (one
    4-plane band → 16 blocks) so the self-join is per-block instead of
    O(n²) — the shape :func:`embedding_neardup_pairs` demands at 10^9
    vectors, here oracle-checked. Recall < 1 by design (pairs straddling a
    hyperplane are missed); the unblocked exact entry stays alongside."""
    from intervalaverage_spark.functions.dedup import embedding_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eb = ann.with_srp_buckets(e, "embedding", dims=ANN_DIMS, bands=1,
                              planes=ANN_PLANES)
    return embedding_neardup_pairs(eb, "vec_id", "embedding", threshold=0.4,
                                   group_col="srp_b0")


def _neardup_blocked_sql() -> str:
    def bucket(vec_expr: str) -> str:
        bits = " + ".join(
            f"(CASE WHEN {_dot_sql(vec_expr, ann.plane_vector(0, p, ANN_DIMS))} >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
            for p in range(ANN_PLANES)
        )
        return f"({bits})"

    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
vb AS (SELECT vec_id, v, {bucket('v')} AS b FROM v),
p AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         list_cosine_similarity(a.v, b.v) AS c
  FROM vb a JOIN vb b ON a.b = b.b AND a.vec_id < b.vec_id
)
SELECT id1, id2, ROUND(c, 6) AS cosine FROM p WHERE ROUND(c, 6) >= 0.4
"""


ANN_BANDS, ANN_PLANES, ANN_DIMS = 2, 4, 64


def q_ann_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = e.orderBy("vec_id").first()
    qv = [float(x) for x in qrow["embedding"]]
    return ann.srp_topk(
        e.filter(F.col("vec_id") != qrow["vec_id"]), qv, "vec_id", "embedding",
        k=10, bands=ANN_BANDS, planes=ANN_PLANES,
    )


IVF_CELLS, IVF_NPROBE = 16, 2


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second ANN scale path: IVF-flat with deterministic sampled
    centroids (functions/ann.py ivf_cells) — quantize, probe the nprobe
    nearest cells, exact-rerank. Complements SRP-LSH with the
    data-dependent (centroid-based) pruning family."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = e.orderBy("vec_id").first()
    qv = [float(x) for x in qrow["embedding"]]
    return ann.ivf_topk(
        e.filter(F.col("vec_id") != qrow["vec_id"]), qv, "vec_id", "embedding",
        k=10, n_cells=IVF_CELLS, nprobe=IVF_NPROBE,
    )


def q_ann_ivf_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PARTITION-PRUNED IVF read path, driver-oracled end to end:
    assign cells, WRITE the embeddings table ``partitionBy('ivf_cell')``
    (the layout-as-index step a 10^9-vector deployment does once at ingest),
    then answer the probe by READING BACK with the nprobe cell predicate —
    the scan lists only nprobe of the n_cells partition directories
    (PartitionFilters asserted in BENCH/PLANS.md §ivf-pruned and
    tests/test_layout.py). Same oracle as the in-memory IVF query, so the
    write → prune → rerank loop must be exact."""
    from intervalaverage_spark.queries import _scratch_dir

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = e.orderBy("vec_id").first()
    qv = [float(x) for x in qrow["embedding"]]
    assigned, cents = ann.ivf_cells(
        e.filter(F.col("vec_id") != qrow["vec_id"]), "vec_id", "embedding",
        n_cells=IVF_CELLS,
    )
    # _scratch_dir (not bare mkdtemp): self-cleaning at interpreter exit,
    # so repeated driver runs never accumulate ia_ivf_layout dirs (r5 ask)
    tmp = _scratch_dir("ivf_layout")
    assigned.write.partitionBy("ivf_cell").mode("overwrite").parquet(tmp)
    probes = ann.ivf_probe_cells(qv, cents, IVF_NPROBE)
    pruned = spark.read.parquet(tmp).filter(F.col("ivf_cell").isin(probes))
    return ann.brute_topk(pruned, qv, "vec_id", "embedding", k=10)


def _ann_ivf_sql() -> str:
    # NOTE the query vector is EXCLUDED from the table before centroid
    # sampling (mirrors the Spark side, which filters first): centroids
    # are the IVF_CELLS lowest ids of the remaining vectors.
    return f"""
WITH vv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM vv
      WHERE vec_id = (SELECT min(vec_id) FROM vv)),
e AS (SELECT vv.* FROM vv, q WHERE vv.vec_id <> q.qid),
c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {IVF_CELLS}),
assign AS (
  SELECT e.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC, c.cid
         ) AS rn
  FROM e, c
),
cells AS (SELECT vec_id, cid FROM assign WHERE rn = 1),
probes AS (
  SELECT cid FROM (
    SELECT c.cid,
           ROW_NUMBER() OVER (
             ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cid
           ) AS rn
    FROM c, q
  ) WHERE rn <= {IVF_NPROBE}
)
SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS cosine
FROM e JOIN cells USING (vec_id) JOIN probes ON probes.cid = cells.cid, q
ORDER BY cosine DESC, e.vec_id LIMIT 10
"""


def q_knn_join_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN (every 25th vector queries the whole table through the
    shared IVF quantizer — the semantic-dedup/retrieval primitive; the
    other ANN rows answer ONE query, this answers them all in one
    distributed plan). Probe fan-out and exact re-rank are deterministic,
    so DuckDB replays index assignment, per-query probes, and the final
    ranking exactly."""
    from intervalaverage_spark.functions.ann import knn_join

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") % 25 == 0)
    out = knn_join(qs, e, "vec_id", "embedding", "vec_id", "embedding",
                   k=5, n_cells=IVF_CELLS, nprobe=IVF_NPROBE,
                   exclude_self=True)
    return out.select("q_id", "nn_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def _knn_join_sql(qpred: str = "vec_id % 25 = 0", k: int = 5) -> str:
    return f"""
WITH vv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM vv ORDER BY vec_id LIMIT {IVF_CELLS}),
assign AS (
  SELECT vv.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY vv.vec_id
           ORDER BY ROUND(list_cosine_similarity(vv.v, c.cv), 6) DESC, c.cid
         ) AS rn
  FROM vv, c
),
cells AS (SELECT vec_id, cid FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS qid, v AS qv FROM vv WHERE {qpred}),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cid
           ) AS rn
    FROM q, c
  ) WHERE rn <= {IVF_NPROBE}
),
cand AS (
  SELECT q.qid, vv.vec_id AS nn,
         ROUND(list_cosine_similarity(vv.v, q.qv), 6) AS cosine
  FROM q JOIN probes USING (qid)
       JOIN cells ON cells.cid = probes.cid
       JOIN vv ON vv.vec_id = cells.vec_id
  WHERE vv.vec_id <> q.qid
)
SELECT qid AS q_id, nn AS nn_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, nn) AS rank
  FROM cand
) WHERE rank <= {k}
"""


def _dot_sql(vec_expr: str, weights: list[float]) -> str:
    """Explicit left-to-right dot product — same fold order as
    F.aggregate(zip_with(...)) and srp_bucket_py."""
    terms = " + ".join(f"{vec_expr}[{d + 1}] * {w!r}" for d, w in enumerate(weights))
    return f"(0.0 + {terms})"


def _ann_srp_sql() -> str:
    def bucket(vec_expr: str, band: int) -> str:
        bits = " + ".join(
            f"(CASE WHEN {_dot_sql(vec_expr, ann.plane_vector(band, p, ANN_DIMS))} >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
            for p in range(ANN_PLANES)
        )
        return f"({bits})"

    conds = " OR ".join(
        f"{bucket('v', b)} = {bucket('qv', b)}" for b in range(ANN_BANDS)
    )
    return f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
),
c AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, q.qv
  FROM embeddings e, q WHERE e.vec_id <> q.qid
)
SELECT vec_id,
       ROUND(list_cosine_similarity(v, qv), 6) AS cosine
FROM c WHERE {conds}
ORDER BY cosine DESC, vec_id LIMIT 10
"""


# --------------------------------------------- sampling / splits / caps

#: the md5 uniform's SQL twin (functions/sampling.py md5_uniform): first
#: 48 md5 bits over (seed ␟ key), divided by 2^48 — exact in a double, so
#: both engines land on the bit-identical value and every comparison
#: against a literal threshold agrees
def _u_sql(key: str, seed: str) -> str:
    return (f"CAST(('0x' || substr(md5(concat_ws(chr(31), '{seed}', "
            f"CAST({key} AS VARCHAR))), 1, 12)) AS BIGINT) "
            "/ 281474976710656.0")


def q_sample_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus selection end-to-end: a stratified Bernoulli
    sample (90 % of non-en docs, 40 % of en) followed by a train/val/test
    split — both pure functions of (seed, doc_id), so DuckDB replays the
    exact decisions (hash compare, not row-count compare)."""
    from intervalaverage_spark.functions.sampling import (
        assign_splits,
        deterministic_sample,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = deterministic_sample(
        d, F.when(F.col("lang") == "en", 0.4).otherwise(0.9),
        ["doc_id"], seed="samp5")
    out = assign_splits(kept, {"train": 0.9, "val": 0.05, "test": 0.05},
                        ["doc_id"], seed="split5")
    return out.select("doc_id", "lang", "source", "split")


def _sample_split_sql() -> str:
    us, up = _u_sql("doc_id", "samp5"), _u_sql("doc_id", "split5")
    return f"""
SELECT doc_id, lang, source,
       CASE WHEN {up} < 0.9 THEN 'train'
            WHEN {up} < 0.95 THEN 'val'
            ELSE 'test' END AS split
FROM documents
WHERE {us} < CASE WHEN lang = 'en' THEN 0.4 ELSE 0.9 END
"""


def q_cap_per_source_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (CCNet/RefinedWeb-style curation): keep the 15
    longest docs per source, hash-tiebroken, on the SALTED hot-key path —
    the flat ROW_NUMBER oracle must match bit-for-bit (salted==flat is
    the operator's correctness contract)."""
    from intervalaverage_spark.functions.sampling import cap_per_key

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = cap_per_key(d, ["source"], 15, ["doc_id"], order_col="n_chars",
                      descending=True, seed="cap5", salt_buckets=4)
    return out.select("doc_id", "source", "n_chars")


def _cap_per_source_sql() -> str:
    return f"""
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC,
                                     {_u_sql("doc_id", "cap5")} ASC) AS rn
  FROM documents
) WHERE rn <= 15
"""


def q_curation_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline in ONE driver row — exact-dedup
    (keep the canonical doc per md5(text)) → length-stratified
    deterministic sample → growth-stable splits → per-(source, split)
    cap on the salted path. Every stage is the library operator; the
    oracle replays the whole chain in SQL, so the COMPOSITION (not just
    each stage) is hash-pinned cross-engine."""
    from intervalaverage_spark.functions.sampling import (
        assign_splits,
        cap_per_key,
        deterministic_sample,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    canon = d.groupBy(F.md5("text").alias("__h")).agg(
        F.min("doc_id").alias("doc_id"))
    uniq = d.join(canon.select("doc_id"), "doc_id", "left_semi")
    kept = deterministic_sample(
        uniq, F.when(F.col("n_chars") >= 200, 0.9).otherwise(0.4),
        ["doc_id"], seed="cur5")
    split = assign_splits(kept, {"train": 0.9, "val": 0.05, "test": 0.05},
                          ["doc_id"], seed="cur5s")
    capped = cap_per_key(split, ["source", "split"], 12, ["doc_id"],
                         order_col="n_chars", descending=True, seed="cur5c",
                         salt_buckets=4)
    return capped.select("doc_id", "source", "split", "n_chars")


def _curation_pipeline_sql() -> str:
    us, up = _u_sql("doc_id", "cur5"), _u_sql("doc_id", "cur5s")
    return f"""
WITH canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
k AS (
  SELECT d.* FROM documents d SEMI JOIN canon USING (doc_id)
  WHERE {us} < CASE WHEN n_chars >= 200 THEN 0.9 ELSE 0.4 END
),
s AS (
  SELECT *, CASE WHEN {up} < 0.9 THEN 'train'
                 WHEN {up} < 0.95 THEN 'val'
                 ELSE 'test' END AS split
  FROM k
),
c AS (
  SELECT doc_id, source, split, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source, split
                            ORDER BY n_chars DESC,
                                     {_u_sql("doc_id", "cur5c")} ASC) AS rn
  FROM s
)
SELECT doc_id, source, split, n_chars FROM c WHERE rn <= 12
"""


def q_semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup end-to-end in ONE driver row — every vector finds
    its k nearest through the shared IVF quantizer (knn_join), pairs at
    cosine ≥ 0.4 feed connected components (dedup_clusters), and each
    vector lands in a canonical cluster. The composition a real
    embedding-dedup pipeline runs; the oracle replays kNN, thresholding,
    AND the recursive component walk, so the whole chain is hash-pinned."""
    from intervalaverage_spark.functions.ann import knn_join
    from intervalaverage_spark.functions.dedup import dedup_clusters

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nn = knn_join(e, e, "vec_id", "embedding", "vec_id", "embedding",
                  k=3, n_cells=IVF_CELLS, nprobe=IVF_NPROBE,
                  exclude_self=True)
    pairs = (
        nn.filter(F.col("cosine") >= 0.4)
        .select(F.least("q_id", "nn_id").alias("id1"),
                F.greatest("q_id", "nn_id").alias("id2"))
        .distinct()
    )
    return dedup_clusters(e.select("vec_id"), pairs, id_col="vec_id")


def _semantic_dedup_sql() -> str:
    inner = _knn_join_sql(qpred="TRUE", k=3)
    return f"""
WITH RECURSIVE
nn AS (SELECT q_id, nn_id, cosine FROM ({inner})),
p AS (
  SELECT DISTINCT least(q_id, nn_id) AS id1, greatest(q_id, nn_id) AS id2
  FROM nn WHERE cosine >= 0.4
),
e AS (SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p),
walk(n, lab) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.b, w.lab FROM walk w JOIN e ON e.a = w.n
),
comp AS (SELECT n AS vec_id, MIN(lab) AS canonical_id FROM walk GROUP BY n)
SELECT c.vec_id, c.canonical_id, CAST(s.cnt AS BIGINT) AS cluster_size
FROM comp c
JOIN (SELECT canonical_id, COUNT(*) AS cnt FROM comp GROUP BY 1) s
  USING (canonical_id)
"""


# ----------------------------------------------------------- multimodal

def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents' text bytes as an opaque media payload through the real
    mapInPandas decode plumbing (deterministic fake codec). Only the
    SQL-replicable feature columns are projected for the oracle compare;
    checksum/feat are covered by pytest round-trip tests."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select(
        F.col("doc_id").alias("id"),
        F.lit("text/plain").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )
    return decode_media(media).select("id", "kind", "n_bytes", "head")


MULTIMODAL_SQL = """
SELECT doc_id AS id, 'text/plain' AS kind,
       octet_length(encode(text)) AS n_bytes,
       substr(lower(hex(encode(text))), 1, 16) AS head
FROM documents
"""


def q_streaming_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL streaming on the web-text axis: exact dedup of a document
    stream via watermarked ``dropDuplicatesWithinWatermark`` on
    ``md5(text)`` — the streaming twin of ``dedup_exact_documents``
    (the timeseries rows prove stateful WINDOWED streaming; the text-stats
    row proves stateless; this adds the stateful KEYED member).

    Event time is synthetic-deterministic (epoch + doc_id seconds — a
    replayable stand-in for crawl fetch time). State-store bound: one
    entry per distinct key whose event time is newer than
    ``watermark − delay``; keys older than that are EVICTED, so state is
    O(distinct keys per dedup horizon), not O(stream). The delay is
    DERIVED from the fixture's doc_id span (span + 1 day), so the bounded
    availableNow replay stays exact — equal to batch DISTINCT — at EVERY
    scale factor (a fixed 30-day horizon would silently re-emit
    duplicates once doc_id spans past it; round-6 ADVICE). Production
    replaces this derivation with the dedup horizon it wants to pay
    state for — the point of the watermark is precisely that exactness
    is scoped to a horizon.

    Output is (text_md5, n_chars): both are functions of the TEXT, so
    whichever duplicate arrives first yields the same row — deterministic
    under any micro-batch order. Oracle: batch DISTINCT over the same
    projection."""
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    schema = batch.schema
    # bounded setup read: two scalars (min/max doc_id), never collected rows
    span_row = batch.agg(
        (F.max("doc_id") - F.min("doc_id")).alias("span")).first()
    delay_s = int(span_row["span"] or 0) + 86400
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(
            F.md5("text").alias("text_md5"),
            F.length("text").cast("long").alias("n_chars"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")).alias("event_time"),
        )
        .withWatermark("event_time", f"{delay_s} seconds")
        .dropDuplicatesWithinWatermark(["text_md5"])
        .select("text_md5", "n_chars")
    )
    name = "q_streaming_dedup_exact_documents"
    q = (
        src.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_dedup_exact: availableNow query did not finish "
            "within 300s; refusing to compare a truncated sink"
        )
    q.stop()
    return spark.table(name)


STREAMING_DEDUP_EXACT_SQL = """
SELECT DISTINCT md5(text) AS text_md5, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def q_knn_join_self_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-kNN over ALL vectors (every vector queries the whole table,
    ``exclude_self``) on the BROADCAST-CENTROID path (``method=
    'broadcast'``): cell assignment and probe fan-out run as one numpy
    GEMM per Arrow batch against a broadcast centroid matrix instead of
    literal-centroid expressions — the n_cells ≈ √n shape a 10^8-vector
    table needs. Same oracle family as knn_join_embeddings: the driver's
    hash compare pins the broadcast path to the literal path's exact
    semantics cross-engine (assignment ties, probe order, rerank)."""
    from intervalaverage_spark.functions.ann import knn_join

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_join(e, e, "vec_id", "embedding", "vec_id", "embedding",
                   k=3, n_cells=IVF_CELLS, nprobe=IVF_NPROBE,
                   exclude_self=True, method="broadcast")
    return out.select("q_id", "nn_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def q_decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (round 7, E42): docs with
    ``doc_id % 7 == 0`` play the benchmark set (1/7 of the corpus — a
    modulus chosen so planted near-dup families straddle the split and
    the driver row exercises REAL hits, 9 contaminated docs at sf0.01); every OTHER doc gets
    per-doc contamination stats — how many of its distinct lowercased
    word 8-grams appear anywhere in the benchmark set. The corpus side
    meets the broadcast gram set in a map-side join and aggregates by
    doc id (functions/decontam.py — the corpus never shuffles). n=8
    (not the classic 13) because synthetic fixture docs are short; the
    operator is n-parameterized."""
    from intervalaverage_spark.functions.decontam import decontaminate

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = d.filter(F.col("doc_id") % 7 == 0)
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    out = decontaminate(corpus, bench, n=8)
    return out.select(
        "doc_id", "n_contam_grams",
        F.col("is_contaminated").cast("long").alias("is_contaminated"),
    )


DECONTAM_SQL = r"""
WITH toksl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 8
              THEN list_distinct([array_to_string(tk[i:i+7], ' ')
                                  for i in range(1, len(tk) - 6)])
              ELSE CAST([] AS VARCHAR[]) END AS g
  FROM toksl
),
cg AS (
  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 7 = 0
),
hits AS (
  SELECT t.doc_id, count(*) AS h
  FROM (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 7 <> 0) t
  JOIN cg USING (gram)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.h, 0) AS BIGINT) AS n_contam_grams,
       CAST(coalesce(h.h, 0) > 0 AS BIGINT) AS is_contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 7 <> 0
"""

#: the token-mix targets of the driver row (fixture langs: en/zh/es/de/fr)
_MIX_TARGETS = {"en": 0.4, "zh": 0.15, "es": 0.15, "de": 0.15, "fr": 0.15}


def q_token_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing (round 7, E43): sample the corpus down to a target
    per-language share of total WEIGHT (n_chars here; tokens in
    production) — the "50 % en / 15 % each other" step of a training
    mix. The binding stratum is kept whole, every other stratum is
    deterministically downsampled to match (functions/sampling.py
    token_mix_sample); the DuckDB oracle replays the whole derivation —
    per-stratum totals, the binding budget, the truncated rates, and the
    md5 keep decisions — from the same table."""
    from intervalaverage_spark.functions.sampling import token_mix_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = token_mix_sample(d, "lang", _MIX_TARGETS, "n_chars",
                           ["doc_id"], seed="mix7")
    return out.select("doc_id", "lang",
                      F.col("n_chars").cast("long").alias("n_chars"),
                      "mix_rate")


def _token_mix_sql() -> str:
    shares = ", ".join(f"('{s}', {w})" for s, w in _MIX_TARGETS.items())
    return f"""
WITH s(lang, share) AS (VALUES {shares}),
w AS (
  SELECT lang, SUM(CAST(n_chars AS BIGINT)) AS aw
  FROM documents JOIN s USING (lang) GROUP BY lang
),
t AS (SELECT min(aw / share) AS budget FROM w JOIN s USING (lang)),
r AS (
  SELECT w.lang,
         floor(((s.share * t.budget) / w.aw) * 1000000.0) / 1000000.0 AS rate
  FROM w JOIN s USING (lang), t
)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       r.rate AS mix_rate
FROM documents d JOIN r USING (lang)
WHERE {_u_sql("doc_id", "mix7")} < r.rate
"""


def q_snapshot_delta_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta storage (round 7, E44): keep one row per run of identical
    consecutive snapshots of a key — the ingest-side filter that drops
    unchanged re-crawls before they reach a tier (functions/churn.py
    snapshot_changes; events stand in for (url, warc_ts, html): key =
    user_id, payload = props). One shuffle on the key; the payload is
    pruned to an md5 fingerprint before it."""
    from intervalaverage_spark.functions.churn import snapshot_changes

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ch = snapshot_changes(ev, "user_id", "ts", "props")
    return ch.filter(F.col("is_changed")).select(
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("ts_sec"),
        "fingerprint",
    )


SNAPSHOT_DELTA_SQL = """
WITH f AS (
  SELECT user_id, ts, md5(CAST(props AS VARCHAR)) AS fingerprint FROM events
),
ch AS (
  SELECT user_id, ts, fingerprint,
         lag(fingerprint) OVER (PARTITION BY user_id
                                ORDER BY ts, fingerprint) AS prev_fp
  FROM f
)
SELECT user_id,
       epoch_us(ts) // 1000000 AS ts_sec,
       fingerprint
FROM ch
WHERE prev_fp IS NULL OR prev_fp <> fingerprint
"""


def q_crawl_churn_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl churn stats (round 7, E44): per-key change rate and mean
    revisit gap across snapshots (functions/churn.py churn_stats) — the
    crawl-scheduling signal. Shares the key-hash exchange with the
    change-detection window: one shuffle end to end (BENCH/PLANS.md
    §29)."""
    from intervalaverage_spark.functions.churn import churn_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return churn_stats(ev, "user_id", "ts", "props", min_snapshots=2)


CRAWL_CHURN_SQL = """
WITH f AS (
  SELECT user_id, ts, md5(CAST(props AS VARCHAR)) AS fingerprint FROM events
),
ch AS (
  SELECT user_id, fingerprint,
         lag(fingerprint) OVER w AS prev_fp,
         (epoch_us(ts) // 1000000)
           - (epoch_us(lag(ts) OVER w) // 1000000) AS revisit_secs
  FROM f
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, fingerprint)
)
SELECT user_id,
       count(*) AS n_snapshots,
       CAST(sum(CASE WHEN prev_fp IS NOT NULL AND prev_fp <> fingerprint
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
       round(CAST(sum(CASE WHEN prev_fp IS NOT NULL AND prev_fp <> fingerprint
                           THEN 1 ELSE 0 END) AS DOUBLE) / (count(*) - 1), 6)
         AS change_rate,
       round(avg(revisit_secs), 6) AS avg_revisit_secs
FROM ch
GROUP BY user_id
HAVING count(*) >= 2
"""


def q_snapshot_intervals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 validity intervals (round 7, E45): collapse runs of
    identical consecutive snapshots into (key, valid_from, valid_to)
    interval rows — manufacturing exactly the interval table the
    reference's operators (and this engine's interval_average /
    interval_intersect) consume, directly from raw crawl snapshots
    (functions/churn.py snapshot_intervals). Whole chain = one key-hash
    exchange."""
    from intervalaverage_spark.functions.churn import snapshot_intervals

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = snapshot_intervals(ev, "user_id", "ts", "props")
    return iv.select(
        "user_id",
        "fingerprint",
        F.unix_timestamp("valid_from").cast("long").alias("valid_from_sec"),
        F.unix_timestamp("valid_to").cast("long").alias("valid_to_sec"),
        F.unix_timestamp("last_seen").cast("long").alias("last_seen_sec"),
        "n_snapshots",
    )


SNAPSHOT_INTERVALS_SQL = """
WITH f AS (
  SELECT user_id, ts, md5(CAST(props AS VARCHAR)) AS fingerprint FROM events
),
ch AS (
  SELECT user_id, ts, fingerprint,
         CASE WHEN lag(fingerprint) OVER w IS NULL
                OR lag(fingerprint) OVER w <> fingerprint
              THEN 1 ELSE 0 END AS is_changed
  FROM f
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, fingerprint)
),
runs AS (
  SELECT *, sum(is_changed) OVER (PARTITION BY user_id
                                  ORDER BY ts, fingerprint
                                  ROWS UNBOUNDED PRECEDING) AS run_id
  FROM ch
),
iv AS (
  SELECT user_id, run_id,
         min(fingerprint) AS fingerprint,
         min(ts) AS valid_from,
         max(ts) AS last_seen,
         count(*) AS n_snapshots
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id, fingerprint,
       epoch_us(valid_from) // 1000000 AS valid_from_sec,
       epoch_us(lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id))
         // 1000000 AS valid_to_sec,
       epoch_us(last_seen) // 1000000 AS last_seen_sec,
       n_snapshots
FROM iv
"""


def q_streaming_snapshot_delta_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming delta storage (round 7, E47): the engine's first
    ``applyInPandasWithState`` operator — keyed last-fingerprint state
    (one 32-char string per key) drops unchanged re-crawls at ingest
    (streaming/churn_stream.py). Bounded availableNow replay over the
    events fixture must equal the BATCH delta operator row-for-row —
    same oracle as snapshot_delta_events."""
    from intervalaverage_spark.streaming.churn_stream import (
        streaming_snapshot_deltas,
    )

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    deltas = streaming_snapshot_deltas(src, "user_id", "ts", "props")
    name = "q_streaming_snapshot_delta_events"
    q = (
        deltas.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_snapshot_delta: availableNow query did not finish "
            "within 300s; refusing to compare a truncated sink"
        )
    q.stop()
    return spark.table(name).select(
        F.col("key").alias("user_id"),
        F.unix_timestamp("ts").cast("long").alias("ts_sec"),
        "fingerprint",
    )


def q_duplicated_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring duplication (round 7, E46): per-doc fraction of
    token positions covered by word 8-grams that occur in ≥2 distinct
    docs — the Lee et al. 2022 ExactSubstr filter signal, with the span
    union computed by the engine's own interval_coalesce over token-
    position intervals (functions/substr.py). 47 docs carry real
    duplicated spans at sf0.01 (the planted near-dup families)."""
    from intervalaverage_spark.functions.substr import duplicated_span_stats

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicated_span_stats(d, "doc_id", "text", n=8, min_docs=2)


DUP_SPANS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
  FROM documents
),
pg AS (
  SELECT doc_id, u.pos AS pos, md5(u.gram) AS gkey FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(tk) >= 8
                  THEN [struct_pack(pos := i,
                                    gram := array_to_string(tk[i:i+7], ' '))
                        for i in range(1, len(tk) - 6)]
                  ELSE [] END) AS u
    FROM toks)
),
dup AS (SELECT gkey FROM pg GROUP BY gkey HAVING count(DISTINCT doc_id) >= 2),
spans AS (SELECT doc_id, pos AS s, pos + 7 AS e FROM pg JOIN dup USING (gkey)),
isl AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM spans
),
run AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN pme IS NULL OR s > pme + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
),
cov AS (
  SELECT doc_id, sum(mx - mn + 1) AS dup_tokens FROM (
    SELECT doc_id, island, min(s) AS mn, max(e) AS mx
    FROM run GROUP BY doc_id, island)
  GROUP BY doc_id
),
base AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CASE WHEN b.n_tokens > 0
            THEN round(CAST(coalesce(c.dup_tokens, 0) AS DOUBLE) / b.n_tokens, 6)
            ELSE 0.0 END AS dup_fraction
FROM base b LEFT JOIN cov c USING (doc_id)
"""


def q_recrawl_priority_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed churn (round 7, E48): per-key recency-weighted
    change propensity + staleness — the crawl-queue ranking signal
    (functions/churn.py recrawl_priority). Same one-key-exchange shape
    as churn_stats; the decay anchor is a 1-row broadcast."""
    from intervalaverage_spark.functions.churn import recrawl_priority

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return recrawl_priority(
        ev, "user_id", "ts", "props", half_life_secs=7 * 86400
    )


RECRAWL_PRIORITY_SQL = """
WITH f AS (
  SELECT user_id, ts, md5(CAST(props AS VARCHAR)) AS fingerprint FROM events
),
ch AS (
  SELECT user_id,
         epoch_us(ts) // 1000000 AS t,
         fingerprint,
         lag(fingerprint) OVER w AS prev_fp
  FROM f
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, fingerprint)
),
a AS (SELECT max(t) AS as_of FROM ch)
SELECT user_id,
       count(*) AS n_snapshots,
       round(sum(CASE WHEN prev_fp IS NOT NULL AND prev_fp <> fingerprint
                      THEN power(2.0, (-CAST(a.as_of - t AS DOUBLE)) / 604800.0)
                      ELSE 0.0 END), 6) AS decayed_changes,
       round(sum(CASE WHEN prev_fp IS NOT NULL
                      THEN power(2.0, (-CAST(a.as_of - t AS DOUBLE)) / 604800.0)
                      ELSE 0.0 END), 6) AS decayed_visit_mass,
       round(sum(CASE WHEN prev_fp IS NOT NULL AND prev_fp <> fingerprint
                      THEN power(2.0, (-CAST(a.as_of - t AS DOUBLE)) / 604800.0)
                      ELSE 0.0 END)
             / sum(CASE WHEN prev_fp IS NOT NULL
                        THEN power(2.0, (-CAST(a.as_of - t AS DOUBLE)) / 604800.0)
                        ELSE 0.0 END), 6) AS decayed_change_rate,
       CAST(a.as_of - max(t) AS BIGINT) AS secs_since_last
FROM ch, a
GROUP BY user_id, a.as_of
HAVING count(*) >= 2
"""


def q_crawl_frontier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier emission (E56): the scheduler end-to-end — E48's
    time-decayed change propensity ranks every page, then a per-host
    POLITENESS cap (cap_per_key, the E33 salted-top-n operator) keeps
    the top 3 per host so no origin is hammered regardless of how
    churn-heavy its pages are. Host here is ``user_id % 16`` (the
    fixture's stand-in for the URL's registrable domain — the synthetic
    tables carry no URL column; at ingest the real pipeline substitutes
    the parsed host). Composition of two already-oracled operators; the
    oracle replays decay, rank, and the md5 tie-break exactly."""
    from intervalaverage_spark.functions.churn import recrawl_priority
    from intervalaverage_spark.functions.sampling import cap_per_key

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pr = recrawl_priority(ev, "user_id", "ts", "props",
                          half_life_secs=7 * 86400)
    pr = pr.withColumn("host", F.pmod(F.col("user_id"), F.lit(16)))
    top = cap_per_key(pr, ["host"], 3, ["user_id"],
                      order_col="decayed_changes", descending=True,
                      seed="front7")
    return top.select("host", "user_id", "decayed_changes",
                      "decayed_change_rate", "secs_since_last")


def _crawl_frontier_sql() -> str:
    u = _u_sql("user_id", "front7")
    return f"""
WITH pr AS ({RECRAWL_PRIORITY_SQL}),
r AS (
  SELECT user_id % 16 AS host, user_id, decayed_changes,
         decayed_change_rate, secs_since_last,
         row_number() OVER (PARTITION BY user_id % 16
                            ORDER BY decayed_changes DESC, {u} ASC) AS rn
  FROM pr)
SELECT host, user_id, decayed_changes, decayed_change_rate, secs_since_last
FROM r WHERE rn <= 3
"""


def q_pack_sequences_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (round 7, E49): concat-and-chunk the
    corpus into 512-token sequences — per-doc stream offset, first/last
    sequence id, boundary-crossing flag (functions/packing.py
    pack_sequences). The global token offset is the two-phase
    distributed prefix sum (sharding.py) — never a single-task window;
    the oracle replays it as a plain SUM() OVER (ORDER BY doc_id)."""
    from intervalaverage_spark.functions.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, "doc_id", "text", budget=512)


PACK_SEQUENCES_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id) AS cum
  FROM t
)
SELECT doc_id,
       n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_first,
       CAST(greatest(cum - 1, cum - n_tokens) // 512 AS BIGINT) AS seq_last,
       (greatest(cum - 1, cum - n_tokens) // 512)
         > ((cum - n_tokens) // 512) AS crosses_boundary
FROM c
"""


def q_sequence_fill_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence fill accounting for the 512-token pack (round 7,
    E49): docs exploded to the sequences they touch, token intervals
    clipped per sequence — every interior sequence must be exactly
    full; the tail's fill_fraction is the padding waste
    (functions/packing.py sequence_fill_stats)."""
    from intervalaverage_spark.functions.packing import sequence_fill_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sequence_fill_stats(docs, "doc_id", "text", budget=512)


SEQUENCE_FILL_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum
  FROM t
),
x AS (
  SELECT doc_id, n_tokens,
         cum - n_tokens AS s,
         cum AS e,
         unnest(generate_series((cum - n_tokens) // 512,
                                (cum - 1) // 512)) AS seq
  FROM c WHERE n_tokens > 0
)
SELECT CAST(seq AS BIGINT) AS seq,
       count(DISTINCT doc_id) AS n_docs,
       CAST(sum(least(e, (seq + 1) * 512) - greatest(s, seq * 512))
            AS BIGINT) AS n_tokens,
       round(CAST(sum(least(e, (seq + 1) * 512) - greatest(s, seq * 512))
                  AS DOUBLE) / 512.0, 6) AS fill_fraction
FROM x
GROUP BY seq
"""


def q_top_terms_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary stats (round 7, E50): top-20 terms per language by
    collection frequency, with document frequency and smoothed idf
    (functions/vocab.py top_terms). The explode shuffles vocabulary-
    sized traffic (map-side combine absorbs stopword skew); the rank
    window is over per-lang vocabularies, never token instances."""
    from intervalaverage_spark.functions.vocab import top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = top_terms(docs, "doc_id", "text", group_col="lang", k=20)
    return out.withColumn("rnk", F.col("rnk").cast("long"))


TOP_TERMS_SQL = r"""
WITH w AS (
  SELECT lang, doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
),
pt AS (
  SELECT lang, term, count(*) AS cf, count(DISTINCT doc_id) AS df
  FROM w GROUP BY lang, term
),
nd AS (
  SELECT lang, count(DISTINCT doc_id) AS n_docs FROM documents GROUP BY lang
),
j AS (
  SELECT pt.lang AS lang, term, cf, pt.df AS df, n_docs,
         round(ln((n_docs + 1) / (pt.df + 1)) + 1, 6) AS idf,
         row_number() OVER (PARTITION BY pt.lang
                            ORDER BY cf DESC, term ASC) AS rnk
  FROM pt JOIN nd ON pt.lang = nd.lang
)
SELECT lang, term, cf, df, n_docs, idf, CAST(rnk AS BIGINT) AS rnk
FROM j WHERE rnk <= 20
"""


#: cms driver-query parameters — width far below the fixture vocabulary
#: (31 distinct terms at sf0.01) so counter collisions actually occur and
#: the overcounts replay cross-engine
_CMS_W, _CMS_D, _CMS_SEED = 16, 4, "cms7"


def q_cms_term_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (E57): estimated vs exact collection frequency
    for the top-50 terms. The sketch builds from the pre-aggregated
    (term, cf) relation via ``weight_col`` — identical counters to
    re-exploding the token stream, for a fraction of the work — and the
    estimate is the min over depth=4 counters: never below ``cf``, and
    the width is deliberately tiny (16 ≪ vocabulary) so real collisions
    land in the output and the oracle must replay the OVERcounts
    bit-for-bit too. Top-50 selection is a TakeOrderedAndProject
    (total order with the term tie-break), not a global window."""
    from intervalaverage_spark.functions.cms import cms_build, cms_estimate
    from intervalaverage_spark.functions.textstats import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cf = (docs.select(F.explode(tokens(F.lower(F.col("text"))))
                      .alias("term"))
          .groupBy("term").agg(F.count(F.lit(1)).alias("cf")))
    sketch = cms_build(cf, "term", _CMS_W, _CMS_D, seed=_CMS_SEED,
                       weight_col="cf")
    est = cms_estimate(cf, "term", sketch, _CMS_W, _CMS_D, seed=_CMS_SEED)
    return (est.orderBy(F.col("cf").desc(), F.col("term").asc())
            .limit(50)
            .select("term", "cf", "cms_est"))


def _cms_sql() -> str:
    w, d, seed = _CMS_W, _CMS_D, _CMS_SEED
    return rf"""
WITH tk AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents),
cf AS (SELECT term, count(*) AS cf FROM tk GROUP BY term),
pos AS (
  SELECT term, cf, i AS row,
         CAST(('0x' || substr(md5(concat_ws(chr(31), '{seed}',
           CAST(i AS VARCHAR), term)), 1, 12)) AS BIGINT) % {w} AS col
  FROM cf, range({d}) t(i)),
cms AS (SELECT row, col, SUM(cf) AS cnt FROM pos GROUP BY 1, 2),
est AS (
  SELECT p.term, CAST(min(c.cnt) AS BIGINT) AS cms_est
  FROM pos p JOIN cms c ON c.row = p.row AND c.col = p.col
  GROUP BY p.term),
ranked AS (
  SELECT term, cf, row_number() OVER (ORDER BY cf DESC, term ASC) AS rn
  FROM cf)
SELECT r.term, r.cf, e.cms_est
FROM ranked r JOIN est e USING (term) WHERE rn <= 50
"""


def q_hll_cardinality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct counting (E58), BOTH estimator regimes in
    one result: per-language distinct-term sketches at b=6 (true counts
    ≈ 31 ≪ 2.5·64 — the linear-counting fallback) and a doc-fingerprint
    sketch at b=4 (500 ≫ 2.5·16 — the raw α·m²/Z path). Exact
    ``n_true`` rides along. The oracle replays register selection,
    integer bin-length ranks, the dyadic-exact 2^−M sum and the single
    fixed-order final expression — hash-exact even though the estimate
    is a float."""
    from intervalaverage_spark.functions.hll import (
        hll_estimate,
        hll_registers,
    )
    from intervalaverage_spark.functions.textstats import tokens

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = d.select("lang", F.explode(tokens(F.lower(F.col("text"))))
                     .alias("term"))
    est_l = hll_estimate(
        hll_registers(terms, "term", 6, seed="hll7", group_cols=["lang"]),
        6, group_cols=["lang"])
    true_l = terms.groupBy("lang").agg(
        F.countDistinct("term").alias("n_true"))
    part1 = (true_l.join(est_l, "lang")
             .select(F.concat(F.lit("terms_"), F.col("lang"))
                     .alias("sketch"), "n_true", "hll_est"))
    fps = d.select(F.md5("text").alias("fp"))
    est_f = hll_estimate(hll_registers(fps, "fp", 4, seed="hll7"), 4)
    part2 = (fps.agg(F.countDistinct("fp").alias("n_true"))
             .crossJoin(est_f)
             .select(F.lit("doc_fps").alias("sketch"), "n_true", "hll_est"))
    return part1.unionByName(part2)


def _hll_sketch_sql(keys_cte: str, key: str, group: str, b: int) -> str:
    m = 1 << b
    width = 48 - b
    g_sel = f"{group}, " if group else ""
    return f"""
  SELECT {g_sel}reg, MAX(rank) AS max_rank FROM (
    SELECT {g_sel}h % {m} AS reg,
           CASE WHEN h // {m} = 0 THEN {width + 1}
                ELSE {width} - length(bin(h // {m})) + 1 END AS rank
    FROM (SELECT {g_sel}CAST(('0x' || substr(md5(concat_ws(chr(31),
           'hll7', {key})), 1, 12)) AS BIGINT) AS h FROM {keys_cte})
  ) GROUP BY {g_sel}reg"""


def _hll_estimate_sql(b: int, alpha: float) -> str:
    m = 1 << b
    z = f"(SUM(power(2.0, -max_rank)) + ({m} - COUNT(*)))"
    v = f"({m} - COUNT(*))"
    raw = f"({alpha * m * m!r} / {z})"
    return (f"ROUND(CASE WHEN {raw} < {2.5 * m} AND {v} > 0 "
            f"THEN {m}.0 * ln({m}.0 / {v}) ELSE {raw} END, 6)")


def _hll_sql() -> str:
    def sketch(keys_cte: str, key: str, group: str, b: int,
               alpha: float) -> str:
        return _hll_sketch_sql(keys_cte, key, group, b)

    e6 = _hll_estimate_sql(6, 0.709)
    e4 = _hll_estimate_sql(4, 0.673)
    return rf"""
WITH tk AS (
  SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS term
  FROM documents),
regs_l AS ({sketch('tk', 'term', 'lang', 6, 0.709)}),
est_l AS (SELECT lang, {e6} AS hll_est FROM regs_l GROUP BY lang),
true_l AS (SELECT lang, COUNT(DISTINCT term) AS n_true FROM tk GROUP BY lang),
fp AS (SELECT md5(text) AS fp FROM documents),
regs_f AS ({sketch('fp', 'fp', '', 4, 0.673)}),
est_f AS (SELECT {e4} AS hll_est FROM regs_f),
true_f AS (SELECT COUNT(DISTINCT fp) AS n_true FROM fp)
SELECT 'terms_' || t.lang AS sketch, t.n_true, e.hll_est
FROM true_l t JOIN est_l e USING (lang)
UNION ALL
SELECT 'doc_fps' AS sketch, true_f.n_true, est_f.hll_est
FROM true_f, est_f
"""


def q_streaming_hll_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HLL (E59): doc-fingerprint registers maintained by a
    NATIVE streaming aggregation — ``groupBy(reg).max(rank)`` against
    the state store, state bounded at 2^b rows however long the stream
    runs, no watermark (max never expires), no custom state operator.
    availableNow replay of the documents table; the final registers
    feed the batch estimator. Oracle = the BATCH sketch SQL over the
    same rows — max is order- and batching-insensitive, so stream must
    equal batch exactly."""
    from intervalaverage_spark.functions.hll import hll_estimate
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_hll_registers,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(F.md5("text").alias("fp"))
    )
    regs = streaming_hll_registers(src, "fp", 6, seed="hll7")
    name = "q_streaming_hll_documents"
    q = (
        regs.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_hll: availableNow query did not finish within "
            "300s; refusing to compare a truncated sink"
        )
    q.stop()
    est = hll_estimate(spark.table(name), 6)
    n_true = (spark.read.parquet(f"{sf_dir}/documents.parquet")
              .agg(F.countDistinct(F.md5("text")).alias("n_true")))
    return (n_true.crossJoin(est)
            .select(F.lit("doc_fps_stream").alias("sketch"),
                    "n_true", "hll_est"))


def _streaming_hll_sql() -> str:
    e6 = _hll_estimate_sql(6, 0.709)
    return f"""
WITH fp AS (SELECT md5(text) AS fp FROM documents),
regs AS ({_hll_sketch_sql('fp', 'fp', '', 6)}),
est AS (SELECT {e6} AS hll_est FROM regs),
tru AS (SELECT COUNT(DISTINCT fp) AS n_true FROM fp)
SELECT 'doc_fps_stream' AS sketch, tru.n_true, est.hll_est FROM tru, est
"""


#: histogram-quantile flagship geometry: events.value spans [0, ~561]
#: at every shipped scale factor → [0, 1024) × 512 bins = 2-unit width
_HQ_LO, _HQ_HI, _HQ_BINS = 0.0, 1024.0, 512
_HQ_QS = [0.5, 0.95, 0.99]


def q_hist_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles (E61,
    functions/quantiles.py): per-event-type p50/p95/p99 of the metric
    value from a ≤512-counter sketch, with the EXACT percentile riding
    along (the same Spark percentile == DuckDB quantile_cont bridge the
    percentiles_daily query pinned) so the ≤ one-bin-width error is
    visible in the result itself. The oracle replays binning, the
    integer cumulative walk, and the single fixed-order interpolation
    expression — hash-exact even though the estimate is a float."""
    from intervalaverage_spark.functions.quantiles import (
        hist_quantiles,
        hist_registers,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = hist_registers(ev, "value", _HQ_LO, _HQ_HI, _HQ_BINS,
                        group_cols=["event_type"])
    est = hist_quantiles(sk, _HQ_QS, _HQ_LO, _HQ_HI, _HQ_BINS,
                         group_cols=["event_type"])
    qarr = F.array(*[F.lit(float(q)) for q in _HQ_QS])
    exact = (
        ev.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.percentile(F.col("value").cast("double"), qarr).alias("ps"))
        .select("event_type", F.posexplode("ps").alias("pos", "ex"))
        .select("event_type",
                F.element_at(qarr, F.col("pos") + 1).alias("q"),
                F.round("ex", 6).alias("exact_q"))
    )
    return (est.join(exact, ["event_type", "q"])
            .select("event_type", "q", "hist_est", "exact_q", "n_points"))


def _hist_quantiles_sql() -> str:
    lo, hi, bins = _HQ_LO, _HQ_HI, _HQ_BINS
    width = (hi - lo) / bins
    qlist = ", ".join(repr(q) for q in _HQ_QS)
    return f"""
WITH sk AS (
  SELECT event_type,
         LEAST({bins - 1}, GREATEST(0,
           CAST(floor((CAST(value AS DOUBLE) - {lo!r}) / {width!r})
                AS BIGINT))) AS bin,
         COUNT(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n_points
  FROM sk),
cand AS (
  SELECT c.*, qs.q FROM cum c, (SELECT unnest([{qlist}]) AS q) qs
  WHERE CAST(c.cum AS DOUBLE) >= qs.q * CAST(c.n_points AS DOUBLE)),
pick AS (
  SELECT event_type, q,
         ROUND({lo!r} + {width!r} * (CAST(bin AS DOUBLE)
           + (q * CAST(n_points AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
             / CAST(cnt AS DOUBLE)), 6) AS hist_est,
         CAST(n_points AS BIGINT) AS n_points,
         row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rn
  FROM cand),
ex AS (
  SELECT event_type, unnest([{qlist}]) AS q,
         unnest(qv) AS exact_raw
  FROM (SELECT event_type,
               quantile_cont(CAST(value AS DOUBLE), [{qlist}]) AS qv
        FROM events WHERE value IS NOT NULL GROUP BY event_type))
SELECT p.event_type, p.q, p.hist_est, ROUND(e.exact_raw, 6) AS exact_q,
       p.n_points
FROM pick p JOIN ex e ON e.event_type = p.event_type AND e.q = p.q
WHERE p.rn = 1
"""


def q_streaming_hist_quantiles_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming histogram quantiles (E63): the E61 distribution sketch
    maintained by a NATIVE streaming aggregation — the same
    select + groupBy(bin).count fold against the state store, state
    bounded at event_types × 512 rows however long the stream runs, no
    watermark (counts only grow), no custom state operator (the E59
    streaming-HLL pattern applied to the distribution member of the
    sketch family). availableNow replay of the events table; quantile
    extraction runs on the emitted registers as a tiny batch step.
    Oracle = the BATCH sketch SQL over the same rows — counting is
    order- and batching-insensitive, so stream must equal batch
    exactly (same hash-exact interpolation bridge as E61)."""
    from intervalaverage_spark.functions.quantiles import hist_quantiles
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_hist_registers,
    )

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_type", "value")
    )
    regs = streaming_hist_registers(
        src, "value", _HQ_LO, _HQ_HI, _HQ_BINS, group_cols=("event_type",)
    )
    name = "q_streaming_hist_events"
    q = (
        regs.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_hist: availableNow query did not finish within "
            "300s; refusing to compare a truncated sink"
        )
    q.stop()
    return hist_quantiles(
        spark.table(name), _HQ_QS, _HQ_LO, _HQ_HI, _HQ_BINS,
        group_cols=["event_type"],
    ).select("event_type", "q", "hist_est", "n_points")


def _streaming_hist_sql() -> str:
    # The batch replay of the streamed registers: identical binning,
    # cumulative walk, and interpolation text as _hist_quantiles_sql,
    # minus the exact-percentile ride-along (that bridge is E61's row;
    # this row pins stream == batch on the sketch itself).
    lo, hi, bins = _HQ_LO, _HQ_HI, _HQ_BINS
    width = (hi - lo) / bins
    qlist = ", ".join(repr(q) for q in _HQ_QS)
    return f"""
WITH sk AS (
  SELECT event_type,
         LEAST({bins - 1}, GREATEST(0,
           CAST(floor((CAST(value AS DOUBLE) - {lo!r}) / {width!r})
                AS BIGINT))) AS bin,
         COUNT(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n_points
  FROM sk),
cand AS (
  SELECT c.*, qs.q FROM cum c, (SELECT unnest([{qlist}]) AS q) qs
  WHERE CAST(c.cum AS DOUBLE) >= qs.q * CAST(c.n_points AS DOUBLE)),
pick AS (
  SELECT event_type, q,
         ROUND({lo!r} + {width!r} * (CAST(bin AS DOUBLE)
           + (q * CAST(n_points AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
             / CAST(cnt AS DOUBLE)), 6) AS hist_est,
         CAST(n_points AS BIGINT) AS n_points,
         row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rn
  FROM cand)
SELECT event_type, q, hist_est, n_points FROM pick WHERE rn = 1
"""


#: BM25 probe queries (E64) — deterministic literals over the synthetic
#: corpus vocabulary; small by construction so the term set broadcasts.
_BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "hash join order"),
    (2, "window merge sort"),
    (3, "stream batch spark"),
    (4, "table scan dup"),
)
_BM25_K1, _BM25_B, _BM25_K = 1.2, 0.75, 10


def q_bm25_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (E64, functions/retrieval.py): top-10
    documents per probe query. Postings explode collapses to
    (doc × term) rows map-side; the query-term set (plus df and corpus
    stats) broadcasts onto the postings so the corpus never shuffles
    for the match; per-(query, doc) scores sum in DECIMAL(18,6) from
    6-dp-rounded fixed-order contributions — exact and order-free, so
    the DuckDB replay is hash-identical including every float."""
    from intervalaverage_spark.functions.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qs = spark.createDataFrame(
        list(_BM25_QUERIES), ["query_id", "query_text"]
    )
    out = bm25_topk(
        docs, qs, k1=_BM25_K1, b=_BM25_B, k=_BM25_K
    )
    return out.withColumn("query_id", F.col("query_id").cast("long"))


def _bm25_sql() -> str:
    # Replays tokenisation, postings, Lucene idf, the fixed-order
    # contribution expression (constants injected via repr on BOTH
    # sides so each engine folds the identical double literal), the
    # exact decimal sum, and the (score desc, doc_id asc) rank.
    k1, b, k = _BM25_K1, _BM25_B, _BM25_K
    qvals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    return rf"""
WITH q(query_id, query_text) AS (VALUES {qvals}),
posts AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS term
        FROM documents)
  GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM posts GROUP BY 1),
corpus AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         CAST((SELECT SUM(dl) FROM dl) AS DOUBLE)
           / (SELECT count(*) FROM dl) AS avgdl),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM posts GROUP BY 1),
qt AS (
  SELECT DISTINCT query_id,
         unnest(list_filter(string_split_regex(lower(query_text), '\s+'),
                            x -> x <> '')) AS term
  FROM q),
qtd AS (
  SELECT query_id, qt.term AS term, coalesce(df, 0) AS df
  FROM qt LEFT JOIN dfs ON qt.term = dfs.term),
m AS (
  SELECT qtd.query_id AS query_id, p.doc_id AS doc_id,
         CAST(ROUND(
           ROUND(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
           * ((tf * {k1 + 1.0!r})
              / (tf + {k1!r} * ({1.0 - b!r}
                                + {b!r} * (dl / avgdl)))), 6)
           AS DECIMAL(18,6)) AS w
  FROM posts p
  JOIN qtd ON p.term = qtd.term
  JOIN dl ON p.doc_id = dl.doc_id
  CROSS JOIN corpus),
s AS (
  SELECT query_id, doc_id, SUM(w) AS score_dec,
         count(*) AS n_terms_hit
  FROM m GROUP BY 1, 2),
r AS (
  SELECT query_id, doc_id, CAST(score_dec AS DOUBLE) AS score,
         n_terms_hit,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_dec DESC, doc_id ASC) AS rnk
  FROM s)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
       CAST(n_terms_hit AS BIGINT) AS n_terms_hit,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {k}
"""


_CUSUM_KM, _CUSUM_HM = 0.5, 4.0


def q_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint alarms (E65, operators/changepoint.py): Page's
    two-sided statistic per event_type over the per-timestamp mean
    value series, self-calibrated (kappa = 0.5 sigma, h = 4 sigma). The
    nonlinear max-reset recurrence is rewritten as prefix-sum minus
    running-min — two window passes on ONE exchange, no UDF, no
    iteration — and every accumulated quantity is decimal, so the
    DuckDB replay is hash-exact including the statistics."""
    from intervalaverage_spark.operators.changepoint import cusum

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cusum(
        ev, "ts", "value", ["event_type"],
        kappa_mult=_CUSUM_KM, h_mult=_CUSUM_HM, alarms_only=True,
    )


def _cusum_sql() -> str:
    km, hm = _CUSUM_KM, _CUSUM_HM
    return f"""
WITH pts AS (
  SELECT event_type, ts,
         CAST(ROUND(CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                               AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*), 6) AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
st AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS s1, SUM(x * x) AS s2
  FROM pts GROUP BY 1),
cal AS (
  SELECT event_type,
         CAST(ROUND(CAST(s1 AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS mu,
         CAST(ROUND(sqrt(GREATEST(0.0,
                CAST(s2 AS DOUBLE) / n
                - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
              * {km!r}, 6) AS DECIMAL(18,6)) AS kappa,
         CAST(ROUND(sqrt(GREATEST(0.0,
                CAST(s2 AS DOUBLE) / n
                - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
              * {hm!r}, 6) AS DECIMAL(18,6)) AS h
  FROM st),
run AS (
  SELECT p.event_type AS event_type, ts, x, mu, kappa, h,
         SUM(x - mu - kappa) OVER w AS pp,
         SUM(mu - kappa - x) OVER w AS pn
  FROM pts p JOIN cal USING (event_type)
  WINDOW w AS (PARTITION BY p.event_type ORDER BY ts
               ROWS UNBOUNDED PRECEDING)),
s AS (
  SELECT event_type, ts, x, h,
         pp - LEAST(CAST(0 AS DECIMAL(18,6)), MIN(pp) OVER w) AS sp,
         pn - LEAST(CAST(0 AS DECIMAL(18,6)), MIN(pn) OVER w) AS sn
  FROM run
  WINDOW w AS (PARTITION BY event_type ORDER BY ts
               ROWS UNBOUNDED PRECEDING))
SELECT event_type, ts, CAST(x AS DOUBLE) AS x,
       ROUND(CAST(sp AS DOUBLE), 6) AS s_pos,
       ROUND(CAST(sn AS DOUBLE), 6) AS s_neg,
       ROUND(CAST(h AS DOUBLE), 6) AS h,
       (sp > h OR sn > h) AS alarm
FROM s WHERE sp > h OR sn > h
"""


def q_streaming_cusum_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming CUSUM (E67, streaming/cusum_stream.py): the E65
    detector run AT INGEST — calibration (mu/kappa/h) computed offline
    from the batch decimal moments, then the stream carries just
    (s+, s-) per key as integer micro-units through
    applyInPandasWithState (the carry-in prefix identity vectorizes
    each micro-batch: one cumsum + one cummin per side). A bounded
    availableNow replay must equal the batch operator row-for-row, so
    the oracle is the SAME SQL as the batch cusum_events row — the
    strongest pin a stateful streaming operator can have."""
    from intervalaverage_spark.operators.changepoint import (
        cusum_calibration_from_points,
        cusum_points,
    )
    from intervalaverage_spark.streaming.cusum_stream import streaming_cusum

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cal = cusum_calibration_from_points(
        cusum_points(ev, "ts", "value", ["event_type"]),
        ["event_type"], _CUSUM_KM, _CUSUM_HM,
    )
    schema = ev.schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_type", "ts", "value")
    )
    out = streaming_cusum(src, cal, "event_type", "ts", "value")
    name = "q_streaming_cusum_events"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_cusum: availableNow query did not finish within "
            "300s; refusing to compare a truncated sink"
        )
    q.stop()
    return spark.table(name).select(
        F.col("key").alias("event_type"),
        "ts", "x", "s_pos", "s_neg", "h", "alarm",
    )


def q_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) OLS trend (E66,
    operators/analytics.py trend): slope (value-units/day), intercept
    at the key's first observation, and r² — closed-form least squares
    from five exact decimal moments with time centred per key, each
    final statistic one fixed-order float expression. Two map-side-
    combined aggregations and one join; no window, no sort, no UDF."""
    from intervalaverage_spark.operators.analytics import trend

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trend(ev, "ts", "value", ["user_id", "event_type"])


_TREND_SQL = """
WITH pts AS (
  SELECT user_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
         CAST(ROUND(CAST(value AS DOUBLE), 6) AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL),
t0 AS (
  SELECT user_id, event_type, MIN(t) AS t0
  FROM pts GROUP BY 1, 2),
ctr AS (
  SELECT p.user_id AS user_id, p.event_type AS event_type, t0.t0 AS t0,
         CAST(p.t - t0.t0 AS DECIMAL(12,0)) AS u, x
  FROM pts p JOIN t0 ON p.user_id = t0.user_id
                    AND p.event_type = t0.event_type),
m AS (
  SELECT user_id, event_type, MAX(t0) AS t0,
         COUNT(*) AS n_points,
         SUM(u) AS su, SUM(x) AS sx, SUM(u * x) AS sux,
         SUM(u * u) AS suu, SUM(x * x) AS sxx
  FROM ctr GROUP BY 1, 2),
f AS (
  SELECT user_id, event_type, n_points, t0,
         CAST(n_points AS DOUBLE) AS n,
         CAST(su AS DOUBLE) AS dsu, CAST(sx AS DOUBLE) AS dsx,
         CAST(sux AS DOUBLE) AS dsux, CAST(suu AS DOUBLE) AS dsuu,
         CAST(sxx AS DOUBLE) AS dsxx
  FROM m),
e AS (
  SELECT user_id, event_type, n_points, t0,
         n * dsux - dsu * dsx AS cov_n,
         n * dsuu - dsu * dsu AS var_t,
         n * dsxx - dsx * dsx AS var_x,
         n, dsu, dsx
  FROM f)
SELECT user_id, event_type, CAST(n_points AS BIGINT) AS n_points, t0,
       CASE WHEN var_t > 0.0
            THEN ROUND((cov_n / var_t) * 86400.0, 6) + 0 END AS slope,
       CASE WHEN var_t > 0.0
            THEN ROUND((dsx - (cov_n / var_t) * dsu) / n, 6) + 0
            END AS intercept,
       CASE WHEN var_t > 0.0 AND var_x > 0.0
            THEN ROUND((cov_n * cov_n) / (var_t * var_x), 6)
            END AS r2
FROM e
"""


def q_autocorr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type sequence autocorrelation at lags 1–3 (E70,
    operators/analytics.py autocorr): Pearson correlation of
    consecutive observation pairs of the per-timestamp mean value
    series — trend's companion statistic (drift vs memory). Exact
    decimal pair moments, one fixed-order float per (key, lag), 6-dp
    rounded; one window sort + one map-side-combined fold, no join."""
    from intervalaverage_spark.operators.analytics import autocorr

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return autocorr(ev, "ts", "value", ["event_type"], max_lag=3)


_AUTOCORR_SQL = """
WITH pts AS (
  SELECT event_type, ts,
         CAST(ROUND(CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                               AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*), 6) AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
lagd AS (
  SELECT event_type, x AS a,
         LEAD(x, 1) OVER w AS b1,
         LEAD(x, 2) OVER w AS b2,
         LEAD(x, 3) OVER w AS b3
  FROM pts
  WINDOW w AS (PARTITION BY event_type ORDER BY ts)),
pairs AS (
  SELECT event_type, 1 AS lag, a, b1 AS b FROM lagd WHERE b1 IS NOT NULL
  UNION ALL
  SELECT event_type, 2, a, b2 FROM lagd WHERE b2 IS NOT NULL
  UNION ALL
  SELECT event_type, 3, a, b3 FROM lagd WHERE b3 IS NOT NULL),
m AS (
  SELECT event_type, lag, COUNT(*) AS n_pairs,
         SUM(a) AS sa, SUM(b) AS sb, SUM(a * b) AS sab,
         SUM(a * a) AS saa, SUM(b * b) AS sbb
  FROM pairs GROUP BY 1, 2),
f AS (
  SELECT event_type, lag, n_pairs,
         CAST(n_pairs AS DOUBLE) AS n,
         CAST(sa AS DOUBLE) AS dsa, CAST(sb AS DOUBLE) AS dsb,
         CAST(sab AS DOUBLE) AS dsab,
         CAST(saa AS DOUBLE) AS dsaa, CAST(sbb AS DOUBLE) AS dsbb
  FROM m),
e AS (
  SELECT event_type, lag, n_pairs,
         n * dsab - dsa * dsb AS num,
         n * dsaa - dsa * dsa AS va,
         n * dsbb - dsb * dsb AS vb
  FROM f)
SELECT event_type, lag, CAST(n_pairs AS BIGINT) AS n_pairs,
       CASE WHEN va > 0.0 AND vb > 0.0
            THEN ROUND(num / sqrt(va * vb), 6) + 0 END AS acf
FROM e
"""


def q_streaming_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trend (E71, streaming/sketch_stream.py
    streaming_trend_moments): the E66 drift statistic maintained at
    ingest — per-key exact decimal moments as a NATIVE streaming
    aggregation (state = one row of sums per key, no watermark, no
    custom state operator), centred on an offline-calibrated t0
    relation (the cusum deployment pattern). Closed forms run on the
    emitted moments as a tiny batch step. Oracle = the SAME SQL as the
    batch trend_events row: decimal sums are associative and exact, so
    an availableNow replay equals batch trend bit-for-bit — the E59/E63
    equality contract extended to a five-sum statistic."""
    from intervalaverage_spark.operators.analytics import (
        trend_from_moments,
        trend_points,
        trend_t0,
    )
    from intervalaverage_spark.streaming.sketch_stream import (
        streaming_trend_moments,
    )

    keys = ("user_id", "event_type")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cal = trend_t0(trend_points(ev, "ts", "value", list(keys)), list(keys))

    schema = ev.schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "event_type", "ts", "value")
    )
    m = streaming_trend_moments(src, "ts", "value", keys, cal)
    name = "q_streaming_trend_events"
    q = (
        m.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_trend: availableNow query did not finish within "
            "300s; refusing to compare a truncated sink"
        )
    q.stop()
    return trend_from_moments(spark.table(name))


def q_cadence_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) inter-arrival cadence statistics (E73,
    operators/analytics.py cadence_stats): gap distribution between
    consecutive distinct observation times — recrawl-scheduling's
    measurement side. Exact decimal gap moments + exact percentiles;
    one window + one fold, no join."""
    from intervalaverage_spark.operators.analytics import cadence_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cadence_stats(ev, "ts", ["user_id", "event_type"])


_CADENCE_SQL = """
WITH obs AS (
  SELECT DISTINCT user_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
  FROM events WHERE ts IS NOT NULL),
gaps AS (
  SELECT user_id, event_type,
         t - LAG(t) OVER (PARTITION BY user_id, event_type ORDER BY t)
           AS gap
  FROM obs),
agg AS (
  SELECT user_id, event_type,
         COUNT(*) AS n_obs, COUNT(gap) AS n_gaps,
         MIN(gap) AS min_gap, MAX(gap) AS max_gap,
         SUM(CAST(gap AS DECIMAL(18,0))) AS sg,
         SUM(CAST(gap AS DECIMAL(18,0)) * CAST(gap AS DECIMAL(18,0)))
           AS sgg,
         quantile_cont(CAST(gap AS DOUBLE), 0.5) AS p50,
         quantile_cont(CAST(gap AS DOUBLE), 0.95) AS p95
  FROM gaps GROUP BY 1, 2)
SELECT user_id, event_type,
       CAST(n_obs AS BIGINT) AS n_obs, CAST(n_gaps AS BIGINT) AS n_gaps,
       min_gap, max_gap,
       CASE WHEN n_gaps > 0
            THEN ROUND(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE), 6)
            END AS mean_gap,
       ROUND(p50, 6) AS p50_gap, ROUND(p95, 6) AS p95_gap,
       CASE WHEN n_gaps > 0 AND CAST(sg AS DOUBLE) > 0.0
            THEN ROUND(sqrt(GREATEST(0.0,
                   CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
                   - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)))
                 / CAST(sg AS DOUBLE), 6)
            END AS cv_gap
FROM agg
"""


def q_streaming_seasonal_anomalies_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming seasonal detection (E81,
    streaming/seasonal_stream.py): the E79 hour-of-day profile computed
    offline, the event stream tested against it at ingest — a STATELESS
    stream-static join, no state store, no watermark (the cheapest
    possible streaming member; restart-safe because there is nothing to
    restore). Observation-level contract: every arriving row is tested
    individually (a stream cannot collapse duplicates across
    micro-batches — and live alerting wants per-observation flags); the
    oracle replays exactly that over the same rows."""
    from intervalaverage_spark.operators.analytics import seasonal_profile
    from intervalaverage_spark.streaming.seasonal_stream import (
        streaming_seasonal_anomalies,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    prof = seasonal_profile(ev, "ts", "value", ["event_type"])
    src = (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_type", "ts", "value")
    )
    out = streaming_seasonal_anomalies(
        src, prof, "ts", "value", ["event_type"], k=2.0)
    name = "q_streaming_seasonal_anoms"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_seasonal: availableNow query did not finish "
            "within 300s; refusing to compare a truncated sink"
        )
    q.stop()
    return spark.table(name).select(
        "event_type", "ts", "phase", "x", "mean_v", "sd_v", "rz")


def _streaming_seasonal_sql() -> str:
    # function, not module constant: _SEASONAL_PTS_SQL is defined later
    # in the file (next to the batch seasonal queries)
    return f"""
WITH {_SEASONAL_PTS_SQL},
obs AS (
  SELECT event_type, ts,
         CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) % 86400) / 3600.0)
              AS BIGINT) AS phase,
         CAST(ROUND(CAST(value AS DOUBLE), 6) AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL)
SELECT o.event_type AS event_type, o.ts AS ts, o.phase AS phase,
       CAST(o.x AS DOUBLE) AS x, mean_v, sd_v,
       CASE WHEN CAST(sd_v AS DECIMAL(18,6)) > 0
            THEN ROUND(CAST(o.x - CAST(mean_v AS DECIMAL(18,6)) AS DOUBLE)
                       / CAST(CAST(sd_v AS DECIMAL(18,6)) AS DOUBLE), 6)
                 + 0 END AS rz
FROM obs o
JOIN proff f ON o.event_type = f.event_type AND o.phase = f.phase
WHERE sd_v IS NOT NULL
  AND ABS(o.x - CAST(mean_v AS DECIMAL(18,6)))
      > CAST(2.0 AS DECIMAL(18,6)) * CAST(sd_v AS DECIMAL(18,6))
"""


def q_theil_sen_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend (E80, operators/analytics.py theil_sen):
    median-of-pairwise-slopes per (user, event_type) — the
    outlier-proof companion of the OLS trend row (same keys, so the
    two are directly comparable). Pair fan-out bounded by max_points
    by construction."""
    from intervalaverage_spark.operators.analytics import theil_sen

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return theil_sen(ev, "ts", "value", ["user_id", "event_type"],
                     max_points=2000)


_THEIL_SEN_SQL = """
WITH pts AS (
  SELECT user_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
         CAST(ROUND(CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                               AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*), 6) AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
b AS (
  SELECT user_id, event_type, COUNT(*) AS n_points, MIN(t) AS t0
  FROM pts GROUP BY 1, 2
  HAVING COUNT(*) >= 2 AND COUNT(*) <= 2000),
pr AS (
  SELECT p1.user_id AS user_id, p1.event_type AS event_type,
         CAST(p2.x - p1.x AS DOUBLE) * 86400.0
               / CAST(p2.t - p1.t AS DOUBLE) AS s
  FROM pts p1
  JOIN pts p2 ON p1.user_id = p2.user_id
             AND p1.event_type = p2.event_type AND p1.t < p2.t
  JOIN b ON b.user_id = p1.user_id AND b.event_type = p1.event_type),
ms AS (
  SELECT user_id, event_type, COUNT(*) AS n_pairs,
         ROUND(quantile_cont(s, 0.5), 6) + 0 AS ts_slope
  FROM pr GROUP BY 1, 2),
rs AS (
  SELECT p.user_id AS user_id, p.event_type AS event_type,
         b.n_points AS n_points, ms.n_pairs AS n_pairs,
         ms.ts_slope AS ts_slope,
         CAST(p.x AS DOUBLE)
               - ms.ts_slope * (CAST(p.t - b.t0 AS DOUBLE) / 86400.0)
           AS r
  FROM pts p
  JOIN b ON b.user_id = p.user_id AND b.event_type = p.event_type
  JOIN ms ON ms.user_id = p.user_id AND ms.event_type = p.event_type)
SELECT user_id, event_type,
       CAST(MAX(n_points) AS BIGINT) AS n_points,
       CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
       MAX(ts_slope) AS ts_slope,
       ROUND(quantile_cont(r, 0.5), 6) + 0 AS ts_intercept
FROM rs GROUP BY 1, 2
"""


def q_seasonal_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal baseline (E79, operators/analytics.py seasonal_profile):
    per-event-type hour-of-day mean/σ of the value series — the diurnal
    profile every 'is this high?' question needs. One map-side-combined
    fold over (key, phase); the profile is keys × 24 rows."""
    from intervalaverage_spark.operators.analytics import seasonal_profile

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return seasonal_profile(ev, "ts", "value", ["event_type"])


_SEASONAL_PTS_SQL = """
pts AS (
  SELECT event_type, ts,
         CAST(ROUND(CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                               AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*), 6) AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
ph AS (
  SELECT event_type, ts,
         CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) % 86400) / 3600.0)
              AS BIGINT) AS phase, x
  FROM pts),
prof AS (
  SELECT event_type, phase, COUNT(*) AS n_obs,
         SUM(x) AS s1, SUM(x * x) AS s2
  FROM ph GROUP BY 1, 2),
proff AS (
  SELECT event_type, phase, n_obs,
         ROUND(CAST(s1 AS DOUBLE) / n_obs, 6) AS mean_v,
         CASE WHEN n_obs >= 2 THEN
           ROUND(sqrt(GREATEST(0.0,
             CAST(s2 AS DOUBLE) / n_obs
             - (CAST(s1 AS DOUBLE) / n_obs)
               * (CAST(s1 AS DOUBLE) / n_obs))), 6) END AS sd_v
  FROM prof)
"""


_SEASONAL_PROFILE_SQL = f"""
WITH {_SEASONAL_PTS_SQL}
SELECT event_type, phase, CAST(n_obs AS BIGINT) AS n_obs, mean_v, sd_v
FROM proff
"""


def q_seasonal_anomalies_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonal anomalies (E79): points > 2σ from their OWN hour-of-day
    bucket's mean — the 3am-spike-normal-at-3pm detector. Decimal flag
    compare ⇒ the anomaly set is cross-engine exact."""
    from intervalaverage_spark.operators.analytics import (
        seasonal_anomalies,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return seasonal_anomalies(ev, "ts", "value", ["event_type"], k=2.0)


_SEASONAL_ANOM_SQL = f"""
WITH {_SEASONAL_PTS_SQL}
SELECT p.event_type AS event_type, ts, p.phase AS phase,
       CAST(x AS DOUBLE) AS x, mean_v, sd_v,
       CASE WHEN CAST(sd_v AS DECIMAL(18,6)) > 0
            THEN ROUND(CAST(x - CAST(mean_v AS DECIMAL(18,6)) AS DOUBLE)
                       / CAST(CAST(sd_v AS DECIMAL(18,6)) AS DOUBLE), 6)
                 + 0 END AS rz
FROM ph p JOIN proff f ON p.event_type = f.event_type AND p.phase = f.phase
WHERE sd_v IS NOT NULL
  AND ABS(x - CAST(mean_v AS DECIMAL(18,6)))
      > CAST(2.0 AS DECIMAL(18,6)) * CAST(sd_v AS DECIMAL(18,6))
"""


def q_robust_anomalies_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outliers per event_type (E72,
    operators/analytics.py robust_anomalies): points whose absolute
    deviation from the key median exceeds 3×MAD — the 50%-breakdown
    point-anomaly screen beside CUSUM's level-shift detector. The flag
    compare runs entirely in decimal, so the anomaly SET is
    cross-engine exact; rz is one fixed-order float, 6-dp."""
    from intervalaverage_spark.operators.analytics import robust_anomalies

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return robust_anomalies(ev, "ts", "value", ["event_type"], k=3.0)


_ROBUST_ANOMALIES_SQL = """
WITH pts AS (
  SELECT event_type, ts,
         CAST(ROUND(CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                               AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*), 6) AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
med AS (
  SELECT event_type,
         CAST(ROUND(quantile_cont(CAST(x AS DOUBLE), 0.5), 6)
              AS DECIMAL(18,6)) AS md
  FROM pts GROUP BY 1),
dev AS (
  SELECT p.event_type AS event_type, ts, x, md,
         ABS(x - md) AS dv
  FROM pts p JOIN med USING (event_type)),
mad AS (
  SELECT event_type,
         CAST(ROUND(quantile_cont(CAST(dv AS DOUBLE), 0.5), 6)
              AS DECIMAL(18,6)) AS mv
  FROM dev GROUP BY 1)
SELECT d.event_type AS event_type, ts, CAST(x AS DOUBLE) AS x,
       CAST(md AS DOUBLE) AS med, CAST(mv AS DOUBLE) AS mad,
       CASE WHEN mv > 0
            THEN ROUND(CAST(x - md AS DOUBLE)
                       / (1.4826 * CAST(mv AS DOUBLE)), 6) + 0 END AS rz
FROM dev d JOIN mad USING (event_type)
WHERE dv > CAST(3.0 AS DECIMAL(18,6)) * mv
"""


def q_ivf_train_quality_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trained IVF quantizer (round 7, E51): 3 Lloyd iterations of
    spherical k-means (functions/ann.py train_ivf_centroids) vs the
    deterministic sampled init, scored by the quantizer objective (mean
    assigned cosine, functions/ann.py quantizer_quality). Rows-only by
    necessity: the per-cell float means sum in partition order, so the
    trained centroids are not cross-engine replayable (same adjudicated
    class as the xxhash64 checkpoint rows). The monotone-improvement
    property is pytest-pinned instead (tests/test_round7b.py)."""
    from intervalaverage_spark.functions.ann import (
        ivf_cells,
        quantizer_quality,
        train_ivf_centroids,
    )

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, sampled = ivf_cells(vecs, "vec_id", "embedding", n_cells=16,
                           method="broadcast")
    trained = train_ivf_centroids(vecs, "vec_id", "embedding", n_cells=16,
                                  n_iter=3)
    rows = [
        ("sampled", 16, float(quantizer_quality(vecs, "embedding", sampled))),
        ("trained_3it", 16,
         float(quantizer_quality(vecs, "embedding", trained))),
    ]
    return spark.createDataFrame(
        rows, "quantizer string, n_cells long, mean_cosine double"
    )


def q_version_coexistence_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dimension version coexistence (round 7, E52): SCD-2
    validity intervals built from TWO payload dimensions of the same
    crawl stream (content fingerprint = props; type fingerprint =
    event_type), then intersected with the engine's own
    interval_intersect — which (content-version, type-version) pairs
    were live simultaneously, and for how long. This is E45's bridge
    claim executed end to end: snapshot_intervals manufactures interval
    tables, and the reference's core operator consumes them unchanged.

    Closed-interval convention: a version is valid [valid_from,
    next_valid_from), so closed end = valid_to_sec − 1; the CURRENT
    version closes at the dataset's max snapshot second (broadcast
    1-row anchor). Zero-duration versions (superseded within the same
    second — only possible via same-ts tie snapshots) are dropped on
    BOTH sides; they never coexist with anything for a measurable
    interval."""
    from intervalaverage_spark.functions.churn import snapshot_intervals
    from intervalaverage_spark.operators.intersect import interval_intersect

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    anchor = ev.agg(
        F.unix_timestamp(F.max("ts")).cast("long").alias("__mx")
    )

    def closed(payload: str, fp_out: str, s: str, e: str) -> DataFrame:
        iv = snapshot_intervals(ev, "user_id", "ts", payload)
        out = iv.crossJoin(F.broadcast(anchor)).select(
            "user_id",
            F.col("fingerprint").alias(fp_out),
            F.unix_timestamp("valid_from").cast("long").alias(s),
            (
                F.coalesce(
                    F.unix_timestamp("valid_to").cast("long"),
                    F.col("__mx") + 1,
                )
                - 1
            ).alias(e),
        )
        return out.filter(F.col(e) >= F.col(s))

    x = closed("props", "fp_props", "vs", "ve")
    y = closed("event_type", "fp_type", "ws", "we")
    out = interval_intersect(
        x, y, {"vs": "ws", "ve": "we"}, group_vars=["user_id"],
        validate=False, sort=False,
    )
    return out.select(
        "user_id", "fp_props", "fp_type", "start", "end",
        (F.col("end") - F.col("start") + 1).alias("coexist_secs"),
    )


def _scd2_closed_sql(payload: str, fp_out: str) -> str:
    return f"""
  SELECT user_id, fingerprint AS {fp_out},
         vf AS s,
         COALESCE(vt, (SELECT m FROM mx) + 1) - 1 AS e
  FROM (
    SELECT user_id, fingerprint,
           epoch_us(valid_from) // 1000000 AS vf,
           epoch_us(lead(valid_from) OVER (PARTITION BY user_id
                                           ORDER BY run_id)) // 1000000 AS vt
    FROM (
      SELECT user_id, run_id,
             min(fingerprint) AS fingerprint,
             min(ts) AS valid_from
      FROM (
        SELECT *, sum(is_changed) OVER (PARTITION BY user_id
                                        ORDER BY ts, fingerprint
                                        ROWS UNBOUNDED PRECEDING) AS run_id
        FROM (
          SELECT user_id, ts, fingerprint,
                 CASE WHEN lag(fingerprint) OVER w IS NULL
                        OR lag(fingerprint) OVER w <> fingerprint
                      THEN 1 ELSE 0 END AS is_changed
          FROM (SELECT user_id, ts,
                       md5(CAST({payload} AS VARCHAR)) AS fingerprint
                FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, fingerprint)
        )
      ) GROUP BY user_id, run_id
    )
  )
  WHERE COALESCE(vt, (SELECT m FROM mx) + 1) - 1 >= vf
"""


VERSION_COEXISTENCE_SQL = f"""
WITH mx AS (SELECT max(epoch_us(ts) // 1000000) AS m FROM events),
a AS ({_scd2_closed_sql("props", "fp_props")}),
b AS ({_scd2_closed_sql("event_type", "fp_type")})
SELECT a.user_id,
       fp_props,
       fp_type,
       GREATEST(a.s, b.s) AS start,
       LEAST(a.e, b.e) AS "end",
       LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS coexist_secs
FROM a JOIN b
  ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
"""


def q_streaming_recrawl_priority_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming decayed churn (round 7, E53): incremental recrawl-
    priority state via applyInPandasWithState — per-key EWMA recurrence
    S ← S·2^(−Δt/hl) + x anchored at the key's own latest snapshot
    (streaming/churn_stream.py streaming_decayed_churn), then a batch
    finalize that rescales every key to the GLOBAL anchor (one
    2^(−Δ/hl) factor) and applies the min_snapshots filter. Bounded
    availableNow replay must equal the batch operator — same oracle as
    recrawl_priority_events. The decayed_change_rate is the unscaled
    ratio (the anchor factor cancels exactly)."""
    from intervalaverage_spark.streaming.churn_stream import (
        streaming_decayed_churn,
    )

    hl = 7 * 86400
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    churn = streaming_decayed_churn(src, "user_id", "ts", "props",
                                    half_life_secs=hl)
    name = "q_streaming_recrawl_priority_events"
    q = (
        churn.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_recrawl_priority: availableNow query did not "
            "finish within 300s; refusing to compare a truncated sink"
        )
    q.stop()
    sink = spark.table(name)
    # per-key latest running total (monotone in n_snapshots; one row per
    # key under single-batch availableNow, robust to multi-batch replays)
    from pyspark.sql import Window as _W

    latest = (
        sink.withColumn(
            "__rn",
            F.row_number().over(
                _W.partitionBy("key").orderBy(F.col("n_snapshots").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    anchor = latest.agg(F.max("last_ts_sec").alias("__as_of"))
    fac = F.pow(
        F.lit(2.0),
        -(F.col("__as_of") - F.col("last_ts_sec")).cast("double")
        / F.lit(float(hl)),
    )
    return (
        latest.crossJoin(F.broadcast(anchor))
        .filter(F.col("n_snapshots") >= 2)
        .select(
            F.col("key").alias("user_id"),
            "n_snapshots",
            F.round(F.col("decayed_changes") * fac, 6).alias(
                "decayed_changes"
            ),
            F.round(F.col("decayed_visit_mass") * fac, 6).alias(
                "decayed_visit_mass"
            ),
            F.round(
                F.col("decayed_changes") / F.col("decayed_visit_mass"), 6
            ).alias("decayed_change_rate"),
            (F.col("__as_of") - F.col("last_ts_sec")).alias(
                "secs_since_last"
            ),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "recrawl_priority_events": q_recrawl_priority_events,
        "streaming_recrawl_priority_events":
            q_streaming_recrawl_priority_events,
        "version_coexistence_events": q_version_coexistence_events,
        "ivf_train_quality_embeddings": q_ivf_train_quality_embeddings,
        "pack_sequences_documents": q_pack_sequences_documents,
        "sequence_fill_documents": q_sequence_fill_documents,
        "top_terms_documents": q_top_terms_documents,
        "decontaminate_documents": q_decontaminate_documents,
        "token_mix_documents": q_token_mix_documents,
        "text_stats_documents": q_text_stats_documents,
        "repetition_stats_documents": q_repetition_stats_documents,
        "streaming_text_stats_documents": q_streaming_text_stats_documents,
        "ngram_jaccard_documents": q_ngram_jaccard_documents,
        "minhash_lsh_documents": q_minhash_lsh_documents,
        "dedup_clusters_documents": q_dedup_clusters_documents,
        "cluster_split_documents": q_cluster_split_documents,
        "bloom_membership_documents": q_bloom_membership_documents,
        "crawl_frontier_events": q_crawl_frontier_events,
        "cms_term_counts_documents": q_cms_term_counts_documents,
        "hll_cardinality_documents": q_hll_cardinality_documents,
        "streaming_hll_documents": q_streaming_hll_documents,
        "hist_quantiles_events": q_hist_quantiles_events,
        "streaming_hist_quantiles_events": q_streaming_hist_quantiles_events,
        "bm25_topk_documents": q_bm25_topk_documents,
        "cusum_events": q_cusum_events,
        "trend_events": q_trend_events,
        "autocorr_events": q_autocorr_events,
        "robust_anomalies_events": q_robust_anomalies_events,
        "streaming_trend_events": q_streaming_trend_events,
        "cadence_stats_events": q_cadence_stats_events,
        "prefix_jaccard_documents": q_prefix_jaccard_documents,
        "url_normalize_documents": q_url_normalize_documents,
        "skew_profile_events": q_skew_profile_events,
        "salt_plan_events": q_salt_plan_events,
        "chunk_documents": q_chunk_documents,
        "hll_daily_users_events": q_hll_daily_users_events,
        "seasonal_profile_events": q_seasonal_profile_events,
        "seasonal_anomalies_events": q_seasonal_anomalies_events,
        "theil_sen_events": q_theil_sen_events,
        "streaming_seasonal_anomalies_events":
            q_streaming_seasonal_anomalies_events,
        "streaming_cusum_events": q_streaming_cusum_events,
        "weighted_sample_documents": q_weighted_sample_documents,
        "shard_assign_documents": q_shard_assign_documents,
        "simhash_documents": q_simhash_documents,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_blocked": q_embedding_neardup_blocked,
        "ann_srp_topk_embeddings": q_ann_srp_topk,
        "ann_ivf_topk_embeddings": q_ann_ivf_topk,
        "ann_ivf_pruned_topk_embeddings": q_ann_ivf_pruned_topk,
        "knn_join_embeddings": q_knn_join_embeddings,
        "semantic_dedup_embeddings": q_semantic_dedup_embeddings,
        "multimodal_decode_documents": q_multimodal_decode,
        "sample_split_documents": q_sample_split_documents,
        "cap_per_source_documents": q_cap_per_source_documents,
        "curation_pipeline_documents": q_curation_pipeline_documents,
        "incremental_dedup_documents": q_incremental_dedup_documents,
        "streaming_dedup_exact_documents": q_streaming_dedup_exact_documents,
        "knn_join_self_embeddings": q_knn_join_self_embeddings,
        "snapshot_delta_events": q_snapshot_delta_events,
        "crawl_churn_events": q_crawl_churn_events,
        "snapshot_intervals_events": q_snapshot_intervals_events,
        "duplicated_spans_documents": q_duplicated_spans_documents,
        "streaming_snapshot_delta_events": q_streaming_snapshot_delta_events,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "recrawl_priority_events": RECRAWL_PRIORITY_SQL,
        "version_coexistence_events": VERSION_COEXISTENCE_SQL,
        # the streaming EWMA replay must equal the batch decayed-churn
        # operator — identical oracle by design (anchor factor rescale)
        "streaming_recrawl_priority_events": RECRAWL_PRIORITY_SQL,
        "pack_sequences_documents": PACK_SEQUENCES_SQL,
        "sequence_fill_documents": SEQUENCE_FILL_SQL,
        "top_terms_documents": TOP_TERMS_SQL,
        "snapshot_delta_events": SNAPSHOT_DELTA_SQL,
        "crawl_churn_events": CRAWL_CHURN_SQL,
        "snapshot_intervals_events": SNAPSHOT_INTERVALS_SQL,
        "duplicated_spans_documents": DUP_SPANS_SQL,
        # the streaming delta replay must equal the batch delta operator
        # row-for-row — identical oracle by design
        "streaming_snapshot_delta_events": SNAPSHOT_DELTA_SQL,
        "decontaminate_documents": DECONTAM_SQL,
        "token_mix_documents": _token_mix_sql(),
        "text_stats_documents": _text_stats_sql(),
        "repetition_stats_documents": _repetition_sql(),
        # identical oracle to the batch text stats: a stateless streaming
        # projection must be indistinguishable from the batch plan
        "streaming_text_stats_documents": _text_stats_sql(),
        "ngram_jaccard_documents": NGRAM_JACCARD_SQL,
        "minhash_lsh_documents": _minhash_lsh_sql(),
        "dedup_clusters_documents": _dedup_clusters_sql(),
        "cluster_split_documents": _cluster_split_sql(),
        "bloom_membership_documents": _bloom_sql(),
        "crawl_frontier_events": _crawl_frontier_sql(),
        "cms_term_counts_documents": _cms_sql(),
        "hll_cardinality_documents": _hll_sql(),
        # the streamed register fold must equal the batch sketch — max is
        # order/batching-insensitive, so the oracle is the batch SQL
        "streaming_hll_documents": _streaming_hll_sql(),
        "hist_quantiles_events": _hist_quantiles_sql(),
        "streaming_hist_quantiles_events": _streaming_hist_sql(),
        "bm25_topk_documents": _bm25_sql(),
        "cusum_events": _cusum_sql(),
        "trend_events": _TREND_SQL,
        "autocorr_events": _AUTOCORR_SQL,
        "robust_anomalies_events": _ROBUST_ANOMALIES_SQL,
        "streaming_trend_events": _TREND_SQL,
        "cadence_stats_events": _CADENCE_SQL,
        "prefix_jaccard_documents": PREFIX_JACCARD_SQL,
        "url_normalize_documents": _URLNORM_SQL,
        "skew_profile_events": _SKEW_PROFILE_SQL,
        "salt_plan_events": _SALT_PLAN_SQL,
        "chunk_documents": _CHUNK_SQL,
        "hll_daily_users_events": _hll_daily_sql(),
        "seasonal_profile_events": _SEASONAL_PROFILE_SQL,
        "seasonal_anomalies_events": _SEASONAL_ANOM_SQL,
        "theil_sen_events": _THEIL_SEN_SQL,
        "streaming_seasonal_anomalies_events": _streaming_seasonal_sql(),
        # stream must equal batch row-for-row: the oracle IS the batch
        # CUSUM SQL (the replay is bounded and per-key ordered)
        "streaming_cusum_events": _cusum_sql(),
        "weighted_sample_documents": _weighted_sample_sql(),
        "shard_assign_documents": SHARD_ASSIGN_SQL,
        "simhash_documents": _simhash_sql(),
        "embedding_neardup": EMBEDDING_NEARDUP_SQL,
        "embedding_neardup_blocked": _neardup_blocked_sql(),
        "ann_srp_topk_embeddings": _ann_srp_sql(),
        "ann_ivf_topk_embeddings": _ann_ivf_sql(),
        # the pruned-layout read answers the SAME query as the in-memory
        # IVF path — identical oracle; only the physical plan differs
        # (PartitionFilters on ivf_cell, asserted in BENCH/PLANS.md)
        "ann_ivf_pruned_topk_embeddings": _ann_ivf_sql(),
        "knn_join_embeddings": _knn_join_sql(),
        "semantic_dedup_embeddings": _semantic_dedup_sql(),
        "multimodal_decode_documents": MULTIMODAL_SQL,
        "sample_split_documents": _sample_split_sql(),
        "cap_per_source_documents": _cap_per_source_sql(),
        "curation_pipeline_documents": _curation_pipeline_sql(),
        # full-corpus recompute RESTRICTED to delta-touching pairs — the
        # incremental contract (pairs found at the delta's ingest)
        "incremental_dedup_documents": _minhash_lsh_sql(
            pair_filter=" AND (id1 % 10 = 0 OR id2 % 10 = 0)"),
        "streaming_dedup_exact_documents": STREAMING_DEDUP_EXACT_SQL,
        # same oracle family as knn_join_embeddings (self-mode, k=3) —
        # the broadcast-centroid path must answer identically
        "knn_join_self_embeddings": _knn_join_sql(qpred="TRUE", k=3),
    }
