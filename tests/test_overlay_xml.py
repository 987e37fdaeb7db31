"""Overlay engine vs the reference's xmltester corpus.

Covers every non-precision overlay suite in
``tests/xmltester/tests/general``: A/A, L/L, L/A, P/P, P/L, P/A,
Empty, and the OverlayNG suites (incl. GC operands).  Comparison is
normalized-exact, the XMLTester rule (``XMLTester.cpp:848-858``) —
output vertices must match the reference bit-for-bit (DD intersection
arithmetic, kernels/dd.py).

Precision-model variants (``*Prec.xml``) need snap-rounding
(OverlayNGRobust ladder) — deferred, SURVEY §7.3.
"""

import pytest

from geos_spark.kernels import overlay as OV
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/general"

SUITES = [
    "TestOverlayAA.xml",
    "TestOverlayLL.xml",
    "TestOverlayLA.xml",
    "TestOverlayPP.xml",
    "TestOverlayPL.xml",
    "TestOverlayPA.xml",
    "TestOverlayEmpty.xml",
    "TestNGOverlayA.xml",
    "TestNGOverlayL.xml",
    "TestNGOverlayP.xml",
    "TestNGOverlayEmpty.xml",
    "TestNGOverlayGC.xml",
]

OPS = {
    "intersection": OV.INTERSECTION,
    "union": OV.UNION,
    "difference": OV.DIFFERENCE,
    "symdifference": OV.SYMDIFFERENCE,
    "intersectionng": OV.INTERSECTION,
    "unionng": OV.UNION,
    "differenceng": OV.DIFFERENCE,
    "symdifferenceng": OV.SYMDIFFERENCE,
}


def _cases():
    for suite in SUITES:
        for c in load_cases(f"{BASE}/{suite}"):
            if c.op in OPS:
                yield pytest.param(c, id=c.case_id)


@pytest.mark.parametrize("case", list(_cases()))
def test_overlay_oracle(case):
    a = parse_wkt(case.wkt_a)
    b = parse_wkt(case.wkt_b) if case.wkt_b else None
    args = [x.lower() for x in case.args]
    A, B = (a, b)
    if args[:2] == ["b", "a"]:
        A, B = b, a
    got = OV.overlay(A, B, OPS[case.op])
    exp = parse_wkt(case.expected)
    assert geoms_equal_normalized(got, exp), case.case_id
