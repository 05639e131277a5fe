"""Skew diagnostics + salt planning — measure the shuffle before paying it.

The north rule requires "partitioning / shuffle / skew handled
explicitly"; the range join (plans/rangejoin.py) and the per-source cap
(functions/sampling.py) already HAVE hot-key salt paths — this module
makes the DECISION first-class data instead of a hand-tuned constant:

* :func:`skew_profile` — one summary row per key-set: key/row counts,
  exact count percentiles (p50/p95/p99), the max key, and
  ``skew_ratio = max/p50`` — the number that says whether a plain hash
  shuffle will strand a straggler task;
* :func:`hot_keys` — the offenders, deterministically ordered;
* :func:`salt_plan` — per-hot-key salt factors ``⌈rows/rows_per_task⌉``
  (exact integer arithmetic), i.e. the ``salt=k`` / ``hot_threshold``
  arguments rangejoin's hot-only path wants, derived from data instead
  of folklore. Keys at or under ``rows_per_task`` are absent (salt 1).

Everything is count aggregates + exact percentiles + integer ceilings:
cross-engine replayable (the driver oracle recomputes the plan), cheap
(one partially-aggregated count per key, then a fold over KEY-cardinality
rows, not data rows), and deployable as a nightly artifact next to the
band index — the crawl's hot hosts drift slowly, so yesterday's salt
plan is tomorrow's broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intervalaverage_spark.validation import IntervalDataError, IntervalSchemaError


def _counts(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    for c in key_cols:
        if c not in df.columns:
            raise IntervalSchemaError(f"skew: missing key column {c!r}")
    if not key_cols:
        raise IntervalSchemaError("skew: key_cols must be non-empty")
    return df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))


def skew_profile(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """One row: ``(n_keys, n_rows, max_rows, p50_rows, p95_rows,
    p99_rows, skew_ratio)`` for the distribution of per-key row counts.

    ``skew_ratio`` (max/p50, one fixed-order float, 6-dp) is the
    straggler predictor: ≈1 means a hash shuffle balances; ≫1 means
    the biggest reducer runs skew_ratio× longer than the typical one
    unless salted. Percentiles are exact linear interpolation (the
    E25/E72/E73 cross-engine contract)."""
    k = list(key_cols)
    c = _counts(df, k)
    agg = c.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("n_rows"),
        F.max("n_rows").alias("max_rows"),
        F.percentile(F.col("n_rows").cast("double"), F.lit(0.5)).alias("_p50"),
        F.percentile(F.col("n_rows").cast("double"), F.lit(0.95)).alias("_p95"),
        F.percentile(F.col("n_rows").cast("double"), F.lit(0.99)).alias("_p99"),
    )
    ratio = F.when(
        F.col("_p50") > 0.0, F.col("max_rows").cast("double") / F.col("_p50")
    )
    return agg.select(
        "n_keys", "n_rows", "max_rows",
        F.round("_p50", 6).alias("p50_rows"),
        F.round("_p95", 6).alias("p95_rows"),
        F.round("_p99", 6).alias("p99_rows"),
        F.round(ratio, 6).alias("skew_ratio"),
    )


def hot_keys(
    df: DataFrame, key_cols: Sequence[str], top_k: int = 10
) -> DataFrame:
    """The ``top_k`` heaviest keys, deterministically ordered (rows
    DESC, then key ASC — ties never flap between runs/engines).
    Output: ``(*key_cols, n_rows, rank)``."""
    if top_k < 1:
        raise IntervalDataError(f"hot_keys: top_k must be >= 1, got {top_k}")
    k = list(key_cols)
    c = _counts(df, k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_rows").desc(), *[F.col(x) for x in k])
    return (
        c.select(*k, "n_rows", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= top_k)
    )


def salt_plan(
    df: DataFrame, key_cols: Sequence[str], rows_per_task: int
) -> DataFrame:
    """Per-hot-key salt factors: keys whose row count exceeds
    ``rows_per_task`` get ``salt = ⌈n_rows / rows_per_task⌉`` (exact
    integer ceiling — no float in the plan). Output: ``(*key_cols,
    n_rows, salt)``; keys that fit one task are absent. Feed the max
    salt / the key list into rangejoin's hot-only path, or join the
    plan onto the data to spread writes."""
    if rows_per_task < 1:
        raise IntervalDataError(
            f"salt_plan: rows_per_task must be >= 1, got {rows_per_task}")
    k = list(key_cols)
    c = _counts(df, k)
    r = F.lit(int(rows_per_task)).cast("long")
    num = F.col("n_rows") + r - 1
    salt = ((num - num % r) / r).cast("long")
    return (
        c.where(F.col("n_rows") > r)
        .select(*k, "n_rows", salt.alias("salt"))
    )
