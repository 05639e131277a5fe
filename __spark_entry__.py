"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship tiered rollup on sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator (SURVEY.md §2) as a
(Spark DataFrame, DuckDB ANSI-SQL) pair — see
``intervalaverage_spark/queries.py`` for the definitions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from intervalaverage_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → observation intervals → 1d tier rollup
    (reference `intervalaverage` semantics, join-free tier path)."""
    return _q.q_tier_rollup_events(24, None)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
