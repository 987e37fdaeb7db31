"""MIC / LEC vs the reference unit oracles
(tests/unit/algorithm/construct/{MaximumInscribedCircle,
LargestEmptyCircle}Test.cpp)."""

import math

import pytest

from geos_spark.kernels.circles import (
    largest_empty_circle,
    maximum_inscribed_circle,
)
from geos_spark.kernels.wkt import parse_wkt

MIC_CASES = [
    ("POLYGON ((100 200, 200 200, 200 100, 100 100, 100 200))",
     0.001, 150, 150, 50),
    ("POLYGON ((150 250, 50 150, 150 50, 250 150, 150 250))",
     0.001, 150, 150, 70.71),
    ("MULTIPOLYGON (((150 200, 100 150, 150 100, 250 150, 150 200)), "
     "((400 250, 300 150, 400 50, 560 150, 400 250)))",
     0.001, 411.38877, 149.9996185, 78.7634662),
]


@pytest.mark.parametrize("wkt,tol,x,y,r", MIC_CASES)
def test_mic(wkt, tol, x, y, r):
    c, rp = maximum_inscribed_circle(parse_wkt(wkt), tol)
    rad = math.hypot(c[0] - rp[0], c[1] - rp[1])
    assert abs(c[0] - x) <= 2 * tol and abs(c[1] - y) <= 2 * tol, c
    assert rad == pytest.approx(r, abs=0.01)


LEC_CASES = [
    ("MULTIPOINT ((100 100), (100 200), (200 200), (200 100))",
     0.01, 150, 150, 70.71),
    ("MULTIPOINT ((100 100), (300 100), (150 50))",
     0.01, 216.66, 99.99, 83.33),
    ("MULTIPOINT ((100 100), (300 100), (200 250))",
     0.01, 200.00, 141.66, 108.33),
    ("MULTILINESTRING ((50 100, 150 50), (250 50, 350 100), "
     "(350 150, 250 200), (50 150, 150 200))",
     0.01, 200, 125, 90.13),
    ("MULTILINESTRING ((100 100, 300 300), (100 200, 300 0))",
     0.01, 299.99, 150.00, 106.05),
    ("GEOMETRYCOLLECTION (LINESTRING (100 100, 300 100), POINT (250 200))",
     0.01, 196.49, 164.31, 64.31),
]


@pytest.mark.parametrize("wkt,tol,x,y,r", LEC_CASES)
def test_lec(wkt, tol, x, y, r):
    c, rp = largest_empty_circle(parse_wkt(wkt), None, tol)
    rad = math.hypot(c[0] - rp[0], c[1] - rp[1])
    assert abs(c[0] - x) <= 0.02 and abs(c[1] - y) <= 0.02, c
    assert rad == pytest.approx(r, abs=0.01)


def test_mic_flat_polygon():
    c, rp = maximum_inscribed_circle(
        parse_wkt("POLYGON ((100 100, 200 100, 200 100, 100 100))"), 0.01
    )
    assert c == rp


def test_mic_rejects_non_polygonal():
    with pytest.raises(ValueError):
        maximum_inscribed_circle(parse_wkt("LINESTRING (0 0, 1 1)"), 0.1)
