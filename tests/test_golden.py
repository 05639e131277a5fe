"""Golden tests pinning exact reference outputs.

F1: README example values (reference README.md:107-161).
F2: required_percentage boundaries + fully-unmatched y
    (tests/testthat/test-intervalaverage_functions.R:249-284).
F3: isolateoverlaps 3-row golden (test-intervalaverage_functions.R:6-35).
"""

from __future__ import annotations

import math

import pytest

from intervalaverage_spark import (
    interval_average,
    interval_intersect,
    is_overlapping,
    isolate_overlaps,
)
from tests.conftest import rows


@pytest.fixture(scope="module")
def readme_xy(spark):
    x = spark.createDataFrame(
        [(1, 7, 10.0), (8, 14, 12.0), (15, 21, 8.0), (22, 28, 14.0), (29, 35, 22.0), (36, 42, 18.0)],
        "start int, end int, pm25 double",
    )
    y = spark.createDataFrame(
        [(3, 9), (10, 16), (17, 23), (24, 30), (31, 37), (38, 44)],
        "start int, end int",
    )
    return x, y


def test_readme_golden(readme_xy):
    x, y = readme_xy
    out = rows(interval_average(x, y, ("start", "end"), ["pm25"]), "start")
    exp_pm25 = [10.571429, 10.857143, 9.714286, 16.285714, 20.857143, None]
    assert [r["start"] for r in out] == [3, 10, 17, 24, 31, 38]
    assert [r["end"] for r in out] == [9, 16, 23, 30, 37, 44]
    for r, e in zip(out, exp_pm25):
        if e is None:
            assert r["pm25"] is None
        else:
            assert r["pm25"] == pytest.approx(e, abs=5e-7)
    # row 1 identity: (5/7)*10 + (2/7)*12 (README.md:129-135)
    assert out[0]["pm25"] == pytest.approx(5 / 7 * 10 + 2 / 7 * 12, rel=1e-12)
    assert [r["yduration"] for r in out] == [7] * 6
    assert [r["xduration"] for r in out] == [7, 7, 7, 7, 7, 5]
    assert [r["nobs_pm25"] for r in out] == [7, 7, 7, 7, 7, 5]
    assert [r["xminstart"] for r in out] == [3, 10, 17, 24, 31, 38]
    assert [r["xmaxend"] for r in out] == [9, 16, 23, 30, 37, 42]
    assert [r["maxgap_pm25"] for r in out] == [0, 0, 0, 0, 0, 2]


def test_readme_required_percentage_70(readme_xy):
    x, y = readme_xy
    out = rows(
        interval_average(x, y, ("start", "end"), ["pm25"], required_percentage=70),
        "start",
    )
    assert out[5]["pm25"] == pytest.approx(18.0)


def test_rp_boundary_strict_less_than(spark):
    # 9 of 10 units observed: NA at rp=100; 3.0 at rp=90 (boundary passes), 89, 0
    x = spark.createDataFrame([(1, 9, 3.0)], "start int, end int, value double")
    y = spark.createDataFrame([(1, 10)], "start int, end int")
    for rp, expect in [(100, None), (90, 3.0), (89, 3.0), (0, 3.0)]:
        r = rows(interval_average(x, y, ("start", "end"), ["value"], required_percentage=rp))[0]
        if expect is None:
            assert r["value"] is None, f"rp={rp}"
        else:
            assert r["value"] == pytest.approx(expect), f"rp={rp}"
        assert r["nobs_value"] == 9
        assert r["maxgap_value"] == 1


def test_unmatched_y_no_nan(spark):
    x = spark.createDataFrame([(1, 10, 3.0)], "start int, end int, value double")
    y = spark.createDataFrame([(20, 30)], "start int, end int")
    r = rows(interval_average(x, y, ("start", "end"), ["value"]))[0]
    assert r["value"] is None and not (isinstance(r["value"], float) and math.isnan(r["value"]))
    assert r["xduration"] == 0 and r["nobs_value"] == 0
    assert r["xminstart"] is None and r["xmaxend"] is None
    assert r["maxgap_value"] == 11 and r["yduration"] == 11


def test_all_na_values_give_null_not_nan(spark):
    x = spark.createDataFrame([(1, 10, None)], "start int, end int, value double")
    y = spark.createDataFrame([(1, 10)], "start int, end int")
    r = rows(interval_average(x, y, ("start", "end"), ["value"]))[0]
    assert r["value"] is None
    assert r["xduration"] == 10 and r["nobs_value"] == 0
    assert r["maxgap_value"] == 10


def test_isolateoverlaps_golden(spark):
    x = spark.createDataFrame(
        [(1, 5, "1", "1"), (5, 5, "1", "1"), (5, 10, "1", "1")],
        "start0 int, end0 int, id1 string, id2 string",
    )
    out = rows(
        isolate_overlaps(x, ("start0", "end0"), ["id1", "id2"]),
        "start", "end", "start0", "end0",
    )
    got = [(r["start"], r["end"], r["start0"], r["end0"]) for r in out]
    assert got == [(1, 4, 1, 5), (5, 5, 1, 5), (5, 5, 5, 5), (5, 5, 5, 10), (6, 10, 5, 10)]


def test_intersect_basic(spark):
    x = spark.createDataFrame(
        [(1, 10, "a"), (20, 30, "b")], "xs int, xe int, xtag string"
    )
    y = spark.createDataFrame(
        [(5, 25, "p"), (28, 40, "q")], "ys int, ye int, ytag string"
    )
    out = rows(
        interval_intersect(x, y, {"xs": "ys", "xe": "ye"}),
        "start", "end",
    )
    got = [(r["start"], r["end"], r["xtag"], r["ytag"]) for r in out]
    assert got == [(5, 10, "a", "p"), (20, 25, "b", "p"), (28, 30, "b", "q")]


def test_is_overlapping_touching_counts(spark):
    # closed intervals: (1,2),(2,3) overlap (test-Cisoverlapping.R:8)
    a = spark.createDataFrame([(1, 2), (2, 3)], "s int, e int")
    b = spark.createDataFrame([(1, 2), (3, 4)], "s int, e int")
    assert is_overlapping(a, ("s", "e")) is True
    assert is_overlapping(b, ("s", "e")) is False
