"""Input validation mirroring the reference's error contract.

The reference front-loads ~20 error checks so its kernels can be check-free
(R/intervalaverage_functions.R:218-338, technicaloverview.Rmd:79). We do the
same split: cheap driver-side schema assertions (no job), plus ONE Spark job
per table for the data-dependent checks (null/inverted bounds, exact
duplicates, within-group overlap) fused into a single window pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

#: output names the operators create; rejected as input columns
#: (reference: R/intervalaverage_functions.R:236-240)
RESERVED = ("yduration", "xduration", "xminstart", "xmaxend")


class IntervalSchemaError(ValueError):
    """Schema-level violation (wrong types, missing/reserved columns)."""


class IntervalDataError(ValueError):
    """Data-level violation (null/inverted bounds, dups, overlaps)."""


def _dtype(df: DataFrame, col: str) -> T.DataType:
    return df.schema[col].dataType


def check_schema(
    df: DataFrame,
    interval_vars: Sequence[str],
    group_vars: Sequence[str] = (),
    value_vars: Sequence[str] = (),
    reserved_ok: bool = False,
) -> bool:
    """Driver-side (no job) schema checks. Returns True if the interval
    columns are DateType (caller must coerce to int days and restore).

    Reference checks: cols exist & disjoint roles
    (R/intervalaverage_functions.R:233-262), interval cols integer/IDate and
    same class (:272-284), reserved names absent (:236-240).
    """
    iv = list(interval_vars)
    if len(iv) != 2:
        raise IntervalSchemaError(f"interval_vars must be length 2, got {iv}")
    all_cols = list(iv) + list(group_vars) + list(value_vars)
    missing = [c for c in all_cols if c not in df.columns]
    if missing:
        raise IntervalSchemaError(f"columns not in DataFrame: {missing}")
    if len(set(all_cols)) != len(all_cols):
        raise IntervalSchemaError(
            "interval_vars, group_vars, value_vars must be mutually disjoint"
        )
    if not reserved_ok:
        bad = [c for c in df.columns if c in RESERVED or c.startswith(("nobs_", "maxgap_"))]
        if bad:
            raise IntervalSchemaError(
                f"reserved output names present in input: {bad} "
                f"(reference rejects these: R/intervalaverage_functions.R:236-240)"
            )
    t0, t1 = _dtype(df, iv[0]), _dtype(df, iv[1])
    both_date = isinstance(t0, T.DateType) and isinstance(t1, T.DateType)
    both_int = isinstance(t0, INTEGRAL_TYPES) and isinstance(t1, INTEGRAL_TYPES)
    if not (both_date or both_int):
        raise IntervalSchemaError(
            f"interval columns must both be integral or both DateType, got "
            f"({t0.simpleString()}, {t1.simpleString()}); discretize continuous "
            f"time first (reference: technicaloverview.Rmd:35-36)"
        )
    for v in value_vars:
        if not isinstance(_dtype(df, v), (T.NumericType,)):
            raise IntervalSchemaError(f"value_var {v} must be numeric")
    return both_date


def check_intervals(
    df: DataFrame,
    start: str,
    end: str,
    group_vars: Sequence[str] = (),
    require_non_overlapping: bool = False,
    forbid_duplicates: bool = False,
    label: str = "x",
) -> None:
    """ONE Spark job validating data-dependent invariants.

    Fuses four reference checks into a single sorted window pass per group:
      * null bounds forbidden            (R/intervalaverage_functions.R:264-270)
      * start <= end                     (:301-305)
      * exact duplicate (group,start,end) rows (:307-312)
      * within-group interval overlap — closed intervals, so touching
        endpoints overlap (:324-338, src/Cisoverlapping.cpp:16-21)
    """
    def as_long(c: str) -> F.Column:
        if isinstance(_dtype(df, c), T.DateType):
            return F.unix_date(F.col(c))  # DATE can't CAST to BIGINT (ANSI)
        return F.col(c).cast("long")

    s, e = as_long(start), as_long(end)
    problems = [
        F.when(F.col(start).isNull() | F.col(end).isNull(), F.lit("null interval bound")),
        F.when(s > e, F.lit("interval start > end")),
    ]
    if forbid_duplicates or require_non_overlapping:
        w = Window.partitionBy(*[F.col(g) for g in group_vars]).orderBy(s, e)
        prev_s, prev_e = F.lag(s).over(w), F.lag(e).over(w)
        if forbid_duplicates:
            problems.append(
                F.when((prev_s == s) & (prev_e == e), F.lit("exact duplicate interval row"))
            )
        if require_non_overlapping:
            # sorted by (start,end): any overlap shows up between neighbors
            problems.append(F.when(s <= prev_e, F.lit("overlapping intervals within group")))
    prob = F.coalesce(*problems) if len(problems) > 1 else problems[0]
    bad = df.select(prob.alias("problem"), *group_vars, start, end).filter(
        F.col("problem").isNotNull()
    )
    row = bad.limit(1).collect()
    if row:
        r = row[0]
        raise IntervalDataError(
            f"invalid intervals in {label}: {r['problem']} at "
            f"{ {k: r[k] for k in r.asDict() if k != 'problem'} }"
        )
