"""Boundary node rules in relate.

Oracles: the reference's RelateNG BNR suite
(tests/unit/operation/relateng/RelateNGBoundaryNodeRuleTest.cpp) and
the linear-boundary valence suite
(tests/unit/operation/relateng/LinearBoundaryTest.cpp).
"""

import numpy as np
import pytest

from geos_spark.kernels.relate import (
    BNR_ENDPOINT,
    BNR_MOD2,
    BNR_MONOVALENT,
    BNR_MULTIVALENT,
    _BNR,
    _line_boundary_points,
    _line_parts,
    relate,
)
from geos_spark.kernels.wkt import parse_wkt

# (wkt_a, wkt_b, rule, expected IM) — RelateNGBoundaryNodeRuleTest.cpp
CASES = [
    # testMultiLineStringSelfIntTouchAtEndpoint
    ("MULTILINESTRING ((20 20, 100 100, 100 20, 20 100), (60 60, 60 140))",
     "LINESTRING (60 60, 20 60)", BNR_ENDPOINT, "FF1F00102"),
    # testLineStringSelfIntTouchAtEndpoint
    ("LINESTRING (20 20, 100 100, 100 20, 20 100)",
     "LINESTRING (60 60, 20 60)", BNR_MOD2, "F01FF0102"),
    ("LINESTRING (20 20, 100 100, 100 20, 20 100)",
     "LINESTRING (60 60, 20 60)", BNR_ENDPOINT, "F01FF0102"),
    # testMultiLineStringTouchAtEndpoint
    ("MULTILINESTRING ((0 0, 10 10), (10 10, 20 20))",
     "LINESTRING (10 10, 20 0)", BNR_MOD2, "F01FF0102"),
    ("MULTILINESTRING ((0 0, 10 10), (10 10, 20 20))",
     "LINESTRING (10 10, 20 0)", BNR_ENDPOINT, "FF1F00102"),
    ("MULTILINESTRING ((0 0, 10 10), (10 10, 20 20))",
     "LINESTRING (10 10, 20 0)", BNR_MONOVALENT, "F01FF0102"),
    ("MULTILINESTRING ((0 0, 10 10), (10 10, 20 20))",
     "LINESTRING (10 10, 20 0)", BNR_MULTIVALENT, "FF10FF1F2"),
    # testLineRingTouchAtEndpoints
    ("LINESTRING (20 100, 20 220, 120 100, 20 100)",
     "LINESTRING (20 20, 20 100)", BNR_MOD2, "F01FFF102"),
    ("LINESTRING (20 100, 20 220, 120 100, 20 100)",
     "LINESTRING (20 20, 20 100)", BNR_ENDPOINT, "FF1F0F102"),
    ("LINESTRING (20 100, 20 220, 120 100, 20 100)",
     "LINESTRING (20 20, 20 100)", BNR_MONOVALENT, "F01FFF102"),
    ("LINESTRING (20 100, 20 220, 120 100, 20 100)",
     "LINESTRING (20 20, 20 100)", BNR_MULTIVALENT, "FF10FF1F2"),
    # testLineRingTouchAtEndpointAndInterior
    ("LINESTRING (20 100, 20 220, 120 100, 20 100)",
     "LINESTRING (20 20, 40 100)", BNR_MOD2, "F01FFF102"),
    ("LINESTRING (20 100, 20 220, 120 100, 20 100)",
     "LINESTRING (20 20, 40 100)", BNR_ENDPOINT, "F01FF0102"),
    # testPolygonEmptyRing
    ("POLYGON EMPTY",
     "LINESTRING (20 100, 20 220, 120 100, 20 100)", BNR_MOD2, "FFFFFF1F2"),
    ("POLYGON EMPTY",
     "LINESTRING (20 100, 20 220, 120 100, 20 100)", BNR_ENDPOINT,
     "FFFFFF102"),
    # testPolygonEmptyMultiLineStringClosed
    ("POLYGON EMPTY",
     "MULTILINESTRING ((0 0, 0 1), (0 1, 1 1, 1 0, 0 0))", BNR_MOD2,
     "FFFFFF1F2"),
    ("POLYGON EMPTY",
     "MULTILINESTRING ((0 0, 0 1), (0 1, 1 1, 1 0, 0 0))", BNR_ENDPOINT,
     "FFFFFF102"),
    # PostGIS relate_bnr.sql: area/area unaffected by the rule
    ("POLYGON((0 0,140 0,140 140,0 140,0 0))",
     "POLYGON((140 0,0 0,0 140,140 140,140 0))", BNR_MOD2, "2FFF1FFF2"),
    ("POLYGON((0 0,140 0,140 140,0 140,0 0))",
     "POLYGON((140 0,0 0,0 140,140 140,140 0))", BNR_ENDPOINT, "2FFF1FFF2"),
    ("POLYGON((0 0,140 0,140 140,0 140,0 0))",
     "POLYGON((140 0,0 0,0 140,140 140,140 0))", BNR_MONOVALENT,
     "2FFF1FFF2"),
    ("POLYGON((0 0,140 0,140 140,0 140,0 0))",
     "POLYGON((140 0,0 0,0 140,140 140,140 0))", BNR_MULTIVALENT,
     "2FFF1FFF2"),
]


@pytest.mark.parametrize("wa,wb,rule,expected", CASES)
def test_relate_bnr(wa, wb, rule, expected):
    assert relate(parse_wkt(wa), parse_wkt(wb), rule) == expected


def test_rule_resets_after_call():
    from geos_spark.kernels import relate as R

    relate(
        parse_wkt("LINESTRING (0 0, 1 1)"),
        parse_wkt("LINESTRING (0 0, 1 0)"),
        BNR_ENDPOINT,
    )
    assert R._BNR == BNR_MOD2


# LinearBoundaryTest.cpp — boundary point sets by valence
LB_CASES = [
    ("LINESTRING (0 0, 9 9)", BNR_MOD2, {(0, 0), (9, 9)}),
    ("MULTILINESTRING ((0 0, 9 9), (9 9, 5 1))", BNR_MOD2,
     {(0, 0), (5, 1)}),
    ("MULTILINESTRING ((0 0, 9 9), (9 9, 5 1), (9 9, 1 5))", BNR_MOD2,
     {(0, 0), (5, 1), (1, 5), (9, 9)}),
    ("MULTILINESTRING ((0 0, 9 9), (9 9, 5 1), (9 9, 1 5))",
     BNR_MONOVALENT, {(0, 0), (5, 1), (1, 5)}),
    ("MULTILINESTRING ((0 0, 9 9), (9 9, 5 1), (9 9, 1 5))",
     BNR_MULTIVALENT, {(9, 9)}),
    ("MULTILINESTRING ((0 0, 9 9), (9 9, 5 1), (9 9, 1 5))",
     BNR_ENDPOINT, {(0, 0), (5, 1), (1, 5), (9, 9)}),
]


@pytest.mark.parametrize("wkt,rule,expected", LB_CASES)
def test_linear_boundary(wkt, rule, expected):
    from geos_spark.kernels import relate as R

    g = parse_wkt(wkt)
    prev = R._BNR
    R._BNR = rule
    try:
        pts = _line_boundary_points(_line_parts(g))
    finally:
        R._BNR = prev
    assert {(float(x), float(y)) for x, y in pts} == {
        (float(a), float(b)) for a, b in expected
    }
