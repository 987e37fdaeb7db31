"""isSimple / isValid vs the xmltester corpus."""

import pytest

from geos_spark.kernels.valid import is_simple, is_valid
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/general"

_KNOWN_HARD: set = set()


def _cases(fname, op):
    for c in load_cases(f"{BASE}/{fname}"):
        if c.op == op:
            yield pytest.param(c, id=c.case_id)


@pytest.mark.parametrize("case", list(_cases("TestSimple.xml", "issimple")))
def test_is_simple(case):
    got = is_simple(parse_wkt(case.wkt_a))
    assert got == (case.expected.lower() == "true"), case.case_id


@pytest.mark.parametrize("case", list(_cases("TestValid.xml", "isvalid")))
def test_is_valid(case):
    if case.case_id in _KNOWN_HARD:
        pytest.xfail("interior-connectivity / vertex-sector analysis")
    got = is_valid(parse_wkt(case.wkt_a))
    assert got == (case.expected.lower() == "true"), case.case_id


@pytest.mark.parametrize(
    "case", list(_cases("TestEqualsExact.xml", "equalsexact"))
)
def test_equals_exact(case):
    from geos_spark.kernels.scalars import equals_exact

    a = parse_wkt(case.wkt_a)
    b = parse_wkt(case.wkt_b)
    tol = float(case.args[2]) if len(case.args) > 2 else 0.0
    got = equals_exact(a, b, tol)
    assert got == (case.expected.lower() == "true"), case.case_id
