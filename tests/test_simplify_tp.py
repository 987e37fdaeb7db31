"""TopologyPreservingSimplifier vs the xmltester corpus
(TestSimplify.xml simplifyTP cases, exact normalized compare)."""

import pytest

from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.simplify_tp import simplify_tp
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

PATH = "/root/reference/tests/xmltester/tests/general/TestSimplify.xml"


def _cases():
    for c in load_cases(PATH):
        if c.op == "simplifytp":
            yield pytest.param(c, id=c.case_id)


@pytest.mark.parametrize("case", list(_cases()))
def test_simplify_tp(case):
    got = simplify_tp(parse_wkt(case.wkt_a), float(case.args[1]))
    exp = parse_wkt(case.expected)
    assert geoms_equal_normalized(got, exp), case.case_id
