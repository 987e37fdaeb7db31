"""unaryUnion (puntal + lineal noding union) vs the xmltester corpus.
Polygonal union cases are skipped — they need the overlay engine
(documented deferral, SURVEY §7.3)."""

import pytest

from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.union import unary_union
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/general"


def _cases():
    for c in load_cases(f"{BASE}/TestUnaryUnion.xml"):
        if c.op == "union":
            yield pytest.param(c, id=c.case_id)


@pytest.mark.parametrize("case", list(_cases()))
def test_unary_union(case):
    a = parse_wkt(case.wkt_a)
    try:
        got = unary_union(a)
    except NotImplementedError:
        pytest.skip("polygonal / mixed union requires overlay (deferred)")
    exp = parse_wkt(case.expected)
    assert geoms_equal_normalized(got, exp, tol=1e-9), case.case_id
