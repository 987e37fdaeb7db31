"""concaveHull vs the reference unit oracles
(tests/unit/algorithm/hull/ConcaveHullTest.cpp)."""

import pytest

from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.hull import (
    concave_hull_by_length,
    concave_hull_by_length_ratio,
)
from geos_spark.kernels.wkt import parse_wkt, write_wkt

WKT_CIRCLE = (
    "MULTIPOINT ((90 20), (80 10), (45 5), (10 20), (20 10), (21 30), "
    "(40 20), (11 60), (20 70), (20 90), (40 80), (70 80), (80 60), "
    "(90 70), (80 90), (56 95), (95 45), (80 40), (70 20), (15 45), "
    "(5 40), (40 96), (60 15))"
)

LENGTH_CASES = [
    ("MULTIPOINT EMPTY", 70, "POLYGON EMPTY"),
    ("MULTIPOINT ((10 10), (10 10))", 70, "POINT (10 10)"),
    ("LINESTRING (10 10, 20 20, 30 30)", 70, "LINESTRING (10 10, 30 30)"),
    ("MULTIPOINT ((10 10), (90 10), (30 70))", 70,
     "POLYGON ((10 10, 30 70, 90 10, 10 10))"),
    ("MULTIPOINT ((10 10), (90 10), (30 70), (70 70), (50 60))", 70,
     "POLYGON ((30 70, 70 70, 90 10, 50 60, 10 10, 30 70))"),
    ("MULTIPOINT ((10 10), (90 10), (70 70), (50 60), (50 90), (40 70), "
     "(30 30))", 0,
     "POLYGON ((10 10, 40 70, 50 90, 70 70, 90 10, 50 60, 30 30, 10 10))"),
    ("MULTIPOINT ((10 10), (90 10), (70 70), (50 60), (50 90), (40 70), "
     "(30 30))", 100,
     "POLYGON ((10 10, 40 70, 50 90, 70 70, 90 10, 10 10))"),
]


@pytest.mark.parametrize("wkt,thr,exp", LENGTH_CASES)
def test_hull_by_length(wkt, thr, exp):
    got = concave_hull_by_length(parse_wkt(wkt), thr)
    assert geoms_equal_normalized(got, parse_wkt(exp), 0.0), write_wkt(got)


RATIO_CASES = [
    ("MULTIPOINT ((70 80), (80 90), (90 70), (50 80), (30 70), (20 40), "
     "(30 20), (50 10), (90 20), (40 50), (40 30), (41 67))", 0.2,
     "POLYGON ((20 40, 30 70, 50 80, 80 90, 90 70, 70 80, 41 67, 40 50, "
     "40 30, 90 20, 50 10, 30 20, 20 40))"),
    ("MULTIPOINT ((10 90), (10 10), (90 10), (90 90), (40 40), (60 30), "
     "(30 70), (40 60), (60 50), (60 72), (47 66), (90 60))", 0,
     "POLYGON ((30 70, 10 90, 60 72, 90 90, 90 60, 90 10, 60 30, 10 10, "
     "40 40, 60 50, 47 66, 40 60, 30 70))"),
    ("MULTIPOINT ((10 90), (10 10), (90 10), (90 90), (40 40), (60 30), "
     "(30 70), (40 60), (60 50), (60 72), (47 66), (90 60))", 0.5,
     "POLYGON ((30 70, 10 90, 60 72, 90 90, 90 60, 90 10, 60 30, 10 10, "
     "40 40, 30 70))"),
    ("MULTIPOINT ((10 90), (10 10), (90 10), (90 90), (40 40), (60 30), "
     "(30 70), (40 60), (60 50), (60 72), (47 66), (90 60))", 1,
     "POLYGON ((10 10, 10 90, 90 90, 90 60, 90 10, 10 10))"),
]


@pytest.mark.parametrize("wkt,ratio,exp", RATIO_CASES)
def test_hull_by_length_ratio(wkt, ratio, exp):
    got = concave_hull_by_length_ratio(parse_wkt(wkt), ratio)
    assert geoms_equal_normalized(got, parse_wkt(exp), 0.0), write_wkt(got)


def test_hull_with_holes():
    got = concave_hull_by_length(parse_wkt(WKT_CIRCLE), 40, holes=True)
    exp = parse_wkt(
        "POLYGON ((20 90, 40 96, 56 95, 80 90, 90 70, 95 45, 90 20, 80 10, "
        "45 5, 20 10, 10 20, 5 40, 11 60, 20 90), "
        "(20 70, 15 45, 40 20, 70 20, 80 40, 80 60, 70 80, 40 80, 20 70))"
    )
    assert geoms_equal_normalized(got, exp, 0.0), write_wkt(got)
