"""minClearance / minClearanceLine, isWithinDistance, equalsExact and
equalsNorm vs the xmltester corpus."""

import pytest

from geos_spark.kernels import scalars as S
from geos_spark.kernels.clearance import min_clearance
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/general"


def _cases(fname, ops):
    for c in load_cases(f"{BASE}/{fname}"):
        if c.op in ops:
            yield pytest.param(c, id=c.case_id + ":" + c.op)


@pytest.mark.parametrize(
    "case",
    list(_cases("TestMinimumClearance.xml", {"minclearance", "minclearanceline"})),
)
def test_min_clearance(case):
    c, line = min_clearance(parse_wkt(case.wkt_a))
    if case.op == "minclearance":
        assert c == float(case.expected), case.case_id
    else:
        exp = parse_wkt(case.expected)
        assert geoms_equal_normalized(line, exp), case.case_id


@pytest.mark.parametrize(
    "case", list(_cases("TestWithinDistance.xml", {"iswithindistance"}))
)
def test_within_distance(case):
    a = parse_wkt(case.wkt_a)
    b = parse_wkt(case.wkt_b)
    d = float(case.args[-1])
    got = S.geom_distance(a, b)
    import math

    within = (not math.isnan(got)) and got <= d
    assert within == (case.expected.lower() == "true"), (case.case_id, got)


@pytest.mark.parametrize(
    "case", list(_cases("TestEqualsExact.xml", {"equalsnorm", "equalsexact"}))
)
def test_equals_norm(case):
    a = parse_wkt(case.wkt_a)
    b = parse_wkt(case.wkt_b)
    if case.op == "equalsnorm":
        got = geoms_equal_normalized(a, b)
    else:
        got = S.equals_exact(a, b, 0.0)
    assert got == (case.expected.lower() == "true"), case.case_id
