"""GEOS issue-regression corpus (tests/xmltester/tests/issue) through
the fixture dispatch — the same rows the xt_issue catalog query
scores.  Union ops use the reference's tolerant checkUnionResult
matcher (XMLTester.cpp:688-704); areatest the absolute identity
bound.  3 documented skips (fixtures.SKIP): area-equal results whose
expected output carries extra degenerate boundary linework or a
different piece structure at equal point sets."""

import pytest

from geos_spark import fixtures as FX


@pytest.mark.parametrize(
    "case",
    [pytest.param(c, id=c.case_id + ":" + c.op) for c in FX.issue_cases()],
)
def test_issue_corpus(case):
    got = FX.run_case(
        case.wkt_a, case.wkt_b, case.op, case.args, case.pm_scale
    )
    assert got == FX.expected_string(case), case.case_id
