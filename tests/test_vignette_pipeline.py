"""End-to-end mirror of the reference's intro vignette
(vignettes/intervalaverage-intro.Rmd:62-280): annual exposure values per
location × an address history × an enrollment table, chained through
intervalaverage → intervalintersect → intervalaverage (+ CJ annual grid),
all on DateType intervals. Each averaging step is differential-checked
against the independent slow oracle (interval_average_slow)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from intervalaverage_spark import cj, interval_average, interval_intersect
from intervalaverage_spark.operators.average import interval_average_slow


def _d(y, m, day):
    return dt.date(y, m, day)


@pytest.fixture(scope="module")
def vignette_tables(spark):
    # no2: one value per (location, calendar year); some loc-years missing
    # entirely (structural gaps) and some present-but-NA
    no2_rows = []
    for loc in range(1, 13):
        for year in range(1995, 2006):
            if (loc + year) % 7 == 0:
                continue  # modeled gap
            val = None if (loc * year) % 11 == 0 else round(
                10.0 + loc * 0.7 + (year - 1995) * 0.31 + ((loc * year) % 5) * 0.111, 3
            )
            no2_rows.append((loc, _d(year, 1, 1), _d(year, 12, 31), val))
    no2 = spark.createDataFrame(
        no2_rows, "location_id long, start_date date, end_date date, no2 double"
    )

    # address_history: per person a CONTIGUOUS non-overlapping residence
    # chain with mid-year moves; several people share locations
    ah_rows = []
    for pid in range(1, 9):
        loc_seq = [((pid * 3 + k) % 12) + 1 for k in range(3)]
        cuts = [
            _d(1995 + pid % 3, 3 + pid % 5, 1 + pid),
            _d(1999, 6 + pid % 4, 10 + pid),
            _d(2002, 1 + pid % 6, 5 + pid),
            _d(2005, 12, 31),
        ]
        for k in range(3):
            s = cuts[k] if k == 0 else cuts[k] + dt.timedelta(days=1)
            ah_rows.append((pid, loc_seq[k], s, cuts[k + 1]))
    address_history = spark.createDataFrame(
        ah_rows, "person_id long, location_id long, start_date date, end_date date"
    )

    enrollment = spark.createDataFrame(
        [(pid, _d(2001 + pid % 3, 1 + pid % 9, 1 + 2 * pid)) for pid in range(1, 9)],
        "person_id long, enroll_date date",
    )
    return no2, address_history, enrollment


def _assert_frames_equal(a, b, float_cols=("no2",)):
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.select(*a.columns).collect()))
    assert len(ra) == len(rb) > 0
    for ta, tb in zip(ra, rb):
        for va, vb in zip(ta, tb):
            if isinstance(va, float) or isinstance(vb, float):
                assert va is not None and vb is not None and abs(va - vb) < 1e-9
            else:
                assert va == vb


def test_step1_average_over_unique_addresses(spark, vignette_tables):
    no2, address_history, _ = vignette_tables
    unique_addresses = address_history.select(
        "location_id", "start_date", "end_date"
    ).distinct()
    kw = dict(
        interval_vars=("start_date", "end_date"), value_vars=["no2"],
        group_vars=["location_id"], required_percentage=80,
    )
    fast = interval_average(no2, unique_addresses, **kw)
    slow = interval_average_slow(no2, unique_addresses, **kw)
    _assert_frames_equal(fast, slow)
    # DateType restored on every interval-ish output column
    types = dict(fast.dtypes)
    for c in ("start_date", "end_date", "xminstart", "xmaxend"):
        assert types[c] == "date", (c, types[c])


def test_step2_intersect_links_values_to_people(spark, vignette_tables):
    no2, address_history, _ = vignette_tables
    by_person = interval_intersect(
        no2, address_history, ("start_date", "end_date"),
        group_vars=["location_id"],
    )
    # vignette quirk (intro.Rmd:219-222): output interval names are
    # (start, end) regardless of inputs — ours matches by default
    assert {"start", "end", "person_id", "no2"} <= set(by_person.columns)
    # a mover has one clipped row per (residence ∩ measurement-year)
    ah5 = address_history.filter("person_id = 5").collect()
    got = by_person.filter("person_id = 5").collect()
    for r in got:
        assert any(
            a["location_id"] == r["location_id"]
            and a["start_date"] <= r["start"] <= r["end"] <= a["end_date"]
            for a in ah5
        )
    # per person the clipped intervals are non-overlapping (residences are)
    from intervalaverage_spark.operators.overlap import is_overlapping

    assert not is_overlapping(
        by_person.select("person_id", "start", "end"),
        ("start", "end"), ["person_id"],
    )


def test_step3_pre_enrollment_year_average(spark, vignette_tables):
    no2, address_history, enrollment = vignette_tables
    by_person = interval_intersect(
        no2, address_history, ("start_date", "end_date"),
        group_vars=["location_id"],
    ).select("person_id", "start", "end", "no2")
    pre = enrollment.select(
        "person_id",
        F.date_sub("enroll_date", 365).alias("start"),
        F.date_sub("enroll_date", 1).alias("end"),
    )
    kw = dict(interval_vars=("start", "end"), value_vars=["no2"],
              group_vars=["person_id"], required_percentage=80)
    fast = interval_average(by_person, pre, **kw)
    slow = interval_average_slow(by_person, pre, **kw)
    _assert_frames_equal(fast, slow)
    # every person got a row, and the 80% mask fires BOTH ways on this
    # data (covered windows yield values; gap/NA-heavy windows yield NA)
    assert fast.count() == enrollment.count()
    assert fast.filter(F.col("no2").isNotNull()).count() >= 1
    assert fast.filter(F.col("no2").isNull()).count() >= 1


def test_advanced_vignette_overlap_resolution(spark):
    """Advanced-vignette chain (vignettes/intervalaverage-advanced.Rmd:
    195-245): PARTIALLY overlapping exposure intervals → isolateoverlaps →
    mean per isolated fragment (duplicate resolution) → intervalaverage on
    the now non-overlapping table. Two value vars throughout."""
    from intervalaverage_spark.operators.isolate import isolate_overlaps
    from intervalaverage_spark.operators.overlap import is_overlapping

    rows_in = []
    for loc in (1, 2, 3):
        for k in range(4):  # weekly series + a 3-day-shifted overlapping twin
            s = 10958 + 7 * k
            rows_in.append((loc, s, s + 6, 15.0 + loc + k * 0.5, 25.0 + k))
            rows_in.append((loc, s + 3, s + 9, 14.0 + loc - k * 0.25, 26.5 - k))
    x = spark.createDataFrame(
        rows_in, "location_id long, start long, end long, pm25 double, no2 double"
    )
    assert is_overlapping(x, ("start", "end"), ["location_id"])

    iso = isolate_overlaps(
        x, ("start", "end"), ["location_id"], interval_vars_out=("start2", "end2"),
        validate=False,
    )
    resolved = (
        iso.groupBy("location_id", "start2", "end2")
        .agg(F.avg("pm25").alias("pm25"), F.avg("no2").alias("no2"))
        .withColumnsRenamed({"start2": "start", "end2": "end"})
    )
    assert not is_overlapping(resolved, ("start", "end"), ["location_id"])

    y = spark.createDataFrame(
        [(loc, 10958 + 10 * j, 10958 + 10 * j + 9) for loc in (1, 2, 3) for j in range(4)],
        "location_id long, start long, end long",
    )
    kw = dict(interval_vars=("start", "end"), value_vars=["pm25", "no2"],
              group_vars=["location_id"], required_percentage=50)
    fast = interval_average(resolved, y, **kw)
    slow = interval_average_slow(resolved, y, **kw)
    _assert_frames_equal(fast, slow, float_cols=("pm25", "no2"))
    assert fast.filter(F.col("pm25").isNotNull()).count() > 0


def test_step4_cj_annual_averages(spark, vignette_tables):
    no2, address_history, _ = vignette_tables
    by_person = interval_intersect(
        no2, address_history, ("start_date", "end_date"),
        group_vars=["location_id"],
    ).select("person_id", "start", "end", "no2")
    years = spark.createDataFrame(
        [(y, _d(y, 1, 1), _d(y, 12, 31)) for y in range(2000, 2005)],
        "year long, start date, end date",
    )
    grid = cj(years.select("start", "end"),
              address_history.select("person_id").distinct())
    kw = dict(interval_vars=("start", "end"), value_vars=["no2"],
              group_vars=["person_id"], required_percentage=80)
    fast = interval_average(by_person, grid, **kw)
    slow = interval_average_slow(by_person, grid, **kw)
    _assert_frames_equal(fast, slow)
    assert fast.count() == 5 * address_history.select("person_id").distinct().count()
    # hand-check one non-move year: the average equals that location's value
    p1_2003 = fast.filter(
        (F.col("person_id") == 1) & (F.col("start") == F.lit("2003-01-01").cast("date"))
    ).first()
    loc = address_history.filter(
        (F.col("person_id") == 1)
        & (F.col("start_date") <= _d(2003, 1, 1))
        & (F.col("end_date") >= _d(2003, 12, 31))
    ).first()["location_id"]
    v = no2.filter(
        (F.col("location_id") == loc) & (F.col("start_date") == _d(2003, 1, 1))
    ).first()
    if v and v["no2"] is not None:
        assert abs(p1_2003["no2"] - v["no2"]) < 1e-9
