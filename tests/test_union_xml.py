"""unaryUnion vs the xmltester corpus — all dimensions (puntal,
lineal noding union, polygonal cascaded union, mixed collections).

The one known miss is the TestUnaryUnionFloating sliver case that the
reference only solves through the OverlayNGRobust snapping ladder
(``OverlayNGRobust.cpp:100-295``) — deferred, SURVEY §7.3."""

import pytest

from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.union import unary_union
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/general"

KNOWN_ROBUSTNESS = {"TestUnaryUnionFloating.xml:0:0"}


def _cases():
    for f in ("TestUnaryUnion.xml", "TestUnaryUnionFloating.xml"):
        for c in load_cases(f"{BASE}/{f}"):
            if c.op == "union" and not c.wkt_b:
                marks = (
                    [pytest.mark.xfail(reason="needs snapping noder")]
                    if c.case_id in KNOWN_ROBUSTNESS
                    else []
                )
                yield pytest.param(c, id=c.case_id, marks=marks)


@pytest.mark.parametrize("case", list(_cases()))
def test_unary_union(case):
    a = parse_wkt(case.wkt_a)
    got = unary_union(a)
    exp = parse_wkt(case.expected)
    assert geoms_equal_normalized(got, exp), case.case_id
