"""Construction ops vs the reference's unit-test oracles
(tests/unit/algorithm/MinimumDiameterTest.cpp,
MinimumBoundingCircleTest.cpp) and the single-sided buffer corpus
(misc/singlesidedbuffer.xml, oriented-Hausdorff matcher)."""

import math

import numpy as np
import pytest

from geos_spark.kernels.buffer import buffer_line_single_sided
from geos_spark.kernels.constructs import (
    min_bounding_circle,
    minimum_rotated_rectangle,
    minimum_width_line,
)
from geos_spark.kernels.dd import _point_to_segment
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

RECT_CASES = [
    # MinimumDiameterTest.cpp:65-91
    (
        "POLYGON ((0 0, 0 20, 20 20, 20 0, 0 0))",
        "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))",
    ),
    (
        "POLYGON ((0 5, 5 10, 10 5, 5 0, 0 5))",
        "POLYGON ((5 0, 10 5, 5 10, 0 5, 5 0))",
    ),
]

WIDTH_CASES = [
    # MinimumDiameterTest.cpp:178-239
    ("LINESTRING (0 240, 220 240)", "LINESTRING (0 240, 0 240)"),
    (
        "POLYGON ((0 240, 220 240, 220 0, 0 0, 0 240))",
        "LINESTRING (0 0, 220 0)",
    ),
    (
        "POLYGON ((0 240, 160 140, 220 0, 0 0, 0 240))",
        "LINESTRING (185.86206896551724 79.65517241379311, 0 0)",
    ),
    (
        "LINESTRING ( 39 119, 162 197, 135 70, 95 35, 33 66, 111 82, 97 131,"
        " 48 160, -4 182, 57 195, 94 202, 90 174, 75 134, 47 114, 0 100,"
        " 59 81, 123 60, 136 43, 163 75, 145 114, 93 136, 92 159, 105 175 )",
        "LINESTRING (64.46262341325811 196.41184767277855, 95 35)",
    ),
]


@pytest.mark.parametrize("wkt,expected", RECT_CASES)
def test_minimum_rotated_rectangle(wkt, expected):
    got = minimum_rotated_rectangle(parse_wkt(wkt))
    assert geoms_equal_normalized(got, parse_wkt(expected))


@pytest.mark.parametrize("wkt,expected", WIDTH_CASES)
def test_minimum_width(wkt, expected):
    got = minimum_width_line(parse_wkt(wkt))
    assert geoms_equal_normalized(got, parse_wkt(expected))


def test_min_bounding_circle():
    c, r, _ = min_bounding_circle(
        parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    )
    assert c == (5.0, 5.0)
    assert r == pytest.approx(math.sqrt(50))
    c, r, _ = min_bounding_circle(parse_wkt("MULTIPOINT((0 0),(10 0))"))
    assert c == (5.0, 0.0) and r == 5.0
    c, r, _ = min_bounding_circle(parse_wkt("POINT(3 4)"))
    assert c == (3.0, 4.0) and r == 0.0


# ----------------------------------------------------------------------
# single-sided buffer corpus
# ----------------------------------------------------------------------


def _segs(g):
    out = []
    for p in g.geoms():
        if p.type_id == 2 and len(p.data) > 1:
            c = p.data
            out.append(np.hstack([c[:-1], c[1:]]))
    return np.concatenate(out) if out else np.zeros((0, 4))


def _densified(segs, frac=0.25):
    pts = []
    n = int(1 / frac)
    for x1, y1, x2, y2 in segs:
        for i in range(n + 1):
            t = i * frac
            pts.append((x1 + t * (x2 - x1), y1 + t * (y2 - y1)))
    return pts


def _mmd(pts, segs):
    if not len(pts):
        return 0.0
    if not len(segs):
        return math.inf
    return max(
        min(_point_to_segment(p, (s[0], s[1]), (s[2], s[3])) for s in segs)
        for p in pts
    )


def ssb_match(actual, expected, dist):
    """SingleSidedBufferResultMatcher: same type, oriented Hausdorff
    both ways < dist/100 (densify 0.25)."""
    if actual.is_empty and expected.is_empty:
        return True
    if actual.is_empty or expected.is_empty:
        return False
    if actual.type_id != expected.type_id:
        return False
    tol = max(abs(dist) / 100.0, 1e-8)
    sa, se = _segs(actual), _segs(expected)
    return (
        max(_mmd(_densified(sa), se), _mmd(_densified(se), sa)) <= tol
    )


def _ssb_cases():
    path = "/root/reference/tests/xmltester/tests/misc/singlesidedbuffer.xml"
    for c in load_cases(path):
        if c.op == "buffersinglesided":
            yield pytest.param(c, id=c.case_id)


@pytest.mark.parametrize("case", list(_ssb_cases()))
def test_single_sided_buffer(case):
    g = parse_wkt(case.wkt_a)
    dist = float(case.args[1])
    qs = int(case.args[2]) if len(case.args) > 2 else 8
    left = (case.args[3].lower() != "right") if len(case.args) > 3 else True
    got = buffer_line_single_sided(g, dist, left, quad_segs=qs)
    assert ssb_match(got, parse_wkt(case.expected), dist), case.case_id
