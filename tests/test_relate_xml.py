"""DE-9IM relate engine vs the reference's own XML oracle corpus.

Runs every relate / named-predicate case from the general suite's
TestRelate{PP,PL,PA,LL,LA,AA}.xml files through our kernel and
compares IM strings / booleans exactly (XMLTester.cpp:848-896
comparison rules: booleans exact, relate = exact pattern/matrix)."""

import glob

import pytest

from geos_spark.kernels import relate as R
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/general"

FILES = [
    "TestRelatePP.xml",
    "TestRelatePL.xml",
    "TestRelatePA.xml",
    "TestRelateLL.xml",
    "TestRelateLA.xml",
    "TestRelateAA.xml",
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


def _iter_cases():
    for f in FILES:
        for c in load_cases(f"{BASE}/{f}"):
            if c.op == "relate" or c.op in PRED_FNS:
                yield pytest.param(c, id=c.case_id + ":" + c.op)


@pytest.mark.parametrize("case", list(_iter_cases()))
def test_relate_case(case):
    a = parse_wkt(case.wkt_a)
    b = parse_wkt(case.wkt_b) if case.wkt_b else None
    if case.op == "relate":
        pattern = case.args[-1] if case.args else None
        im = R.relate(a, b)
        if case.expected.lower() in ("true", "false"):
            got = R.matches(im, pattern)
            assert got == (case.expected.lower() == "true"), (
                case.case_id, im, pattern
            )
        else:
            assert im == case.expected, (case.case_id, im, case.expected)
    else:
        fn = PRED_FNS[case.op]
        # argument order: arg1/arg2 name A/B; ops may be called (B, A)
        args = [x.upper() for x in case.args if x.upper() in ("A", "B")]
        g1, g2 = (a, b) if args[:2] != ["B", "A"] else (b, a)
        got = fn(g1, g2)
        assert got == (case.expected.lower() == "true"), (
            case.case_id, R.relate(g1, g2)
        )
