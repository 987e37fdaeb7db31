"""Densify (xmltester corpus), linear referencing, line merge."""

import numpy as np
import pytest

from geos_spark.kernels import linear as L
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/general"


def _cases():
    for c in load_cases(f"{BASE}/TestDensify.xml"):
        if c.op == "densify":
            yield pytest.param(c, id=c.case_id)


@pytest.mark.parametrize("case", list(_cases()))
def test_densify_case(case):
    a = parse_wkt(case.wkt_a)
    tol = float(case.args[-1])
    if case.expected == "exception":
        with pytest.raises(ValueError):
            L.densify(a, tol)
        return
    got = L.densify(a, tol)
    exp = parse_wkt(case.expected)
    assert geoms_equal_normalized(got, exp, tol=1e-9), case.case_id


LINE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])


def test_interpolate_project_roundtrip():
    assert L.interpolate(LINE, 0) == (0, 0)
    assert L.interpolate(LINE, 5) == (5, 0)
    assert L.interpolate(LINE, 15) == (10, 5)
    assert L.interpolate(LINE, 99) == (10, 10)
    assert L.project(LINE, 5, 1) == 5
    assert L.project(LINE, 11, 5) == 15
    for idx in (0.0, 3.3, 10.0, 17.2, 20.0):
        x, y = L.interpolate(LINE, idx)
        assert L.project(LINE, x, y) == pytest.approx(idx, abs=1e-12)


def test_line_substring():
    sub = L.line_substring(LINE, 5, 15)
    assert np.allclose(sub, [[5, 0], [10, 0], [10, 5]])
    sub = L.line_substring(LINE, 0, 20)
    assert np.allclose(sub, LINE)


def test_line_merge():
    g = parse_wkt(
        "MULTILINESTRING ((0 0, 5 5), (5 5, 10 10), (10 10, 20 10),"
        " (20 10, 20 0), (30 30, 40 40))"
    )
    out = L.line_merge(g)
    exp = parse_wkt(
        "MULTILINESTRING ((0 0, 5 5, 10 10, 20 10, 20 0), (30 30, 40 40))"
    )
    assert geoms_equal_normalized(out, exp)


def test_line_merge_junction_not_merged():
    g = parse_wkt(
        "MULTILINESTRING ((0 0, 5 5), (5 5, 10 0), (5 5, 5 10))"
    )
    out = L.line_merge(g)
    # degree-3 node: nothing merges through it
    assert len(out.data) == 3
