"""The reference's validate/ corpus: 5326 relate + named-predicate
cases over 9 geometry-type pair files. Run as one sweeping test (full
parametrization would dominate collection time); any failure reports
its case ids."""

import glob

from geos_spark.kernels import relate as R
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

PRED = {
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


def test_validate_corpus():
    ok = 0
    failures = []
    for f in sorted(
        glob.glob("/root/reference/tests/xmltester/tests/validate/*.xml")
    ):
        for c in load_cases(f):
            a = parse_wkt(c.wkt_a)
            b = parse_wkt(c.wkt_b) if c.wkt_b else None
            if c.op == "relate":
                got = R.matches(R.relate(a, b), c.args[-1])
            elif c.op in PRED:
                order = [x.upper() for x in c.args if x.upper() in ("A", "B")]
                g1, g2 = (a, b) if order[:2] != ["B", "A"] else (b, a)
                got = PRED[c.op](g1, g2)
            else:
                continue
            if got == (c.expected.lower() == "true"):
                ok += 1
            else:
                failures.append(f"{c.case_id}:{c.op}")
    assert not failures, (len(failures), failures[:20])
    assert ok >= 5300
