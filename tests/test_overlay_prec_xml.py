"""Fixed-precision (snap-rounding) overlay vs the xmltester corpus.

Covers the ``*Prec`` suites (run-level ``<precisionModel scale=.../>``
applied to plain overlay ops) and the ``*SR`` ops (scale in arg3),
driving the snap-rounding noder (``kernels/snapround.py``) through the
same overlay pipeline.  One known miss: a noded chain that doubles
back through a non-node vertex (the reference represents it as one
palindromic edge; the merged-edge model splits it).
"""

import pytest

from geos_spark.kernels import overlay as OV
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/general"

SUITES = [
    "TestOverlayAAPrec.xml",
    "TestOverlayLAPrec.xml",
    "TestOverlayLLPrec.xml",
    "TestOverlayPLPrec.xml",
    "TestNGOverlayAPrec.xml",
    "TestNGOverlayLPrec.xml",
    "TestNGOverlayPPrec.xml",
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
    "intersectionsr": OV.INTERSECTION,
    "unionsr": OV.UNION,
    "differencesr": OV.DIFFERENCE,
    "symdifferencesr": OV.SYMDIFFERENCE,
}

KNOWN_MISSES = {"TestOverlayLLPrec.xml:0:1"}  # palindromic single edge


def _cases():
    for suite in SUITES:
        for c in load_cases(f"{BASE}/{suite}"):
            if c.op not in OPS or not c.wkt_b:
                continue
            marks = (
                [pytest.mark.xfail(reason="palindromic-edge representation")]
                if c.case_id in KNOWN_MISSES
                else []
            )
            yield pytest.param(c, id=c.case_id + ":" + c.op, marks=marks)


@pytest.mark.parametrize("case", list(_cases()))
def test_overlay_prec_oracle(case):
    a = parse_wkt(case.wkt_a)
    b = parse_wkt(case.wkt_b)
    args = [x.lower() for x in case.args]
    A, B = (a, b)
    if args[:2] == ["b", "a"]:
        A, B = b, a
    scale = case.pm_scale
    if case.op.endswith("sr"):
        scale = float(case.args[2]) if len(case.args) > 2 else 1.0
    got = OV.overlay(A, B, OPS[case.op], scale)
    exp = parse_wkt(case.expected)
    assert geoms_equal_normalized(got, exp), case.case_id
