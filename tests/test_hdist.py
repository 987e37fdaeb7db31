"""Discrete Hausdorff / Fréchet distances vs the reference unit
oracles (tests/unit/algorithm/distance/*Test.cpp)."""

import pytest

from geos_spark.kernels.hdist import frechet_distance, hausdorff_distance
from geos_spark.kernels.wkt import parse_wkt as W

HAUS = [
    ("LINESTRING (0 0, 2 1)", "LINESTRING (0 0, 2 0)", None, 1.0),
    ("LINESTRING (0 0, 2 0)", "LINESTRING (0 1, 1 2, 2 1)", None, 2.0),
    ("LINESTRING (0 0, 2 0)", "MULTIPOINT ((0 1), (1 0), (2 1))", None, 1.0),
    ("LINESTRING (130 0, 0 0, 0 150)", "LINESTRING (10 10, 10 150, 130 10)",
     None, 14.142135623730951),
    ("LINESTRING (130 0, 0 0, 0 150)", "LINESTRING (10 10, 10 150, 130 10)",
     0.5, 70.0),
]

FRECHET = [
    ("LINESTRING (0 0, 2 1)", "LINESTRING (0 0, 2 0)", None, 1.0),
    ("LINESTRING (0 0, 2 0)", "LINESTRING (0 1, 1 2, 2 1)", None,
     2.23606797749979),
    ("LINESTRING (0 0, 2 0)", "MULTIPOINT ((0 1), (1 0), (2 1))", None, 1.0),
    ("LINESTRING (0 0, 100 0)", "LINESTRING (0 0, 50 50, 100 0)", None,
     70.7106781186548),
    ("LINESTRING (0 0, 100 0)", "LINESTRING (0 0, 50 50, 100 0)", 0.5, 50.0),
    ("LINESTRING (1 1, 2 2)", "LINESTRING (1 4, 2 3)", None, 3.0),
]


@pytest.mark.parametrize("wa,wb,dens,exp", HAUS)
def test_hausdorff(wa, wb, dens, exp):
    assert hausdorff_distance(W(wa), W(wb), dens) == pytest.approx(
        exp, rel=1e-12
    )


@pytest.mark.parametrize("wa,wb,dens,exp", FRECHET)
def test_frechet(wa, wb, dens, exp):
    assert frechet_distance(W(wa), W(wb), dens) == pytest.approx(
        exp, rel=1e-12
    )


# ----------------------------------------------------------------------
# nearestPoints (witness pair consistent with geom_distance)
# ----------------------------------------------------------------------

import math

from geos_spark.kernels.scalars import geom_distance, nearest_points

NP_CASES = [
    ("POINT(0 0)", "LINESTRING(5 5, 5 -5)", ((0, 0), (5, 0))),
    ("POLYGON((0 0,10 0,10 10,0 10,0 0))", "POINT(15 5)", ((10, 5), (15, 5))),
    ("LINESTRING(0 0, 10 0)", "LINESTRING(3 4, 7 4)", ((3, 0), (3, 4))),
    ("POLYGON((0 0,10 0,10 10,0 10,0 0))", "POINT(5 5)", ((5, 5), (5, 5))),
]


@pytest.mark.parametrize("wa,wb,exp", NP_CASES)
def test_nearest_points(wa, wb, exp):
    a, b = W(wa), W(wb)
    pr = nearest_points(a, b)
    assert pr == exp
    d = geom_distance(a, b)
    assert math.hypot(
        pr[0][0] - pr[1][0], pr[0][1] - pr[1][1]
    ) == pytest.approx(d, abs=1e-12)
