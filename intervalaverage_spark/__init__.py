"""intervalaverage_spark — a PySpark-native interval/time-series rollup engine.

A from-scratch reimplementation of the query semantics of the R package
``kaufman-lab/intervalaverage`` (reference at /root/reference) as lazy,
immutable ``pyspark.sql.DataFrame`` transformations, plus the scale layer
(bucketed/salted range joins, tiered continuous aggregates, Gorilla segment
compression, lineage checkpoints) that the single-node reference never needed.

All intervals are CLOSED (inclusive) on integer domains; interval length is
``end - start + 1`` (reference: src/code.cpp:118, R/intervalaverage_functions.R:452).
"""

from intervalaverage_spark.operators.average import interval_average, interval_average_slow
from intervalaverage_spark.operators.asof import asof_join
from intervalaverage_spark.operators.coalesce import interval_coalesce
from intervalaverage_spark.operators.fill import interpolate_linear, locf, nocb
from intervalaverage_spark.operators.intersect import interval_intersect
from intervalaverage_spark.operators.isolate import isolate_overlaps
from intervalaverage_spark.operators.overlap import is_overlapping
from intervalaverage_spark.operators.grid import cj, tier_grid
from intervalaverage_spark.plans.rangejoin import range_join

__all__ = [
    "interval_average",
    "interval_average_slow",
    "interval_intersect",
    "interval_coalesce",
    "isolate_overlaps",
    "is_overlapping",
    "asof_join",
    "locf",
    "nocb",
    "interpolate_linear",
    "cj",
    "tier_grid",
    "range_join",
]

__version__ = "0.1.0"
