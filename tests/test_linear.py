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


def test_line_merge_directed_consistent_flow():
    """GEOSLineMergeDirectedTest.cpp test<1>: one line flows into the
    other, so the directed merge joins them without any reversal."""
    g = parse_wkt("MULTILINESTRING((0 0, 0 100),(0 -5, 0 0))")
    out = L.line_merge(g, directed=True)
    exp = parse_wkt("LINESTRING(0 -5,0 0,0 100)")
    from geos_spark.kernels.scalars import equals_exact

    assert equals_exact(out, exp, 0.0)


def test_line_merge_directed_opposing_not_merged():
    """GEOSLineMergeDirectedTest.cpp test<2>: both lines START at the
    shared node — the undirected merge would reverse one, the directed
    merge must keep both unmerged and unreversed."""
    g = parse_wkt("MULTILINESTRING((0 0, 0 100),(0 0, 0 -5))")
    out = L.line_merge(g, directed=True)
    from geos_spark.kernels.scalars import equals_exact

    assert out.type_id == g.type_id and len(out.data) == 2
    got = sorted(tuple(map(tuple, ls.data)) for ls in out.data)
    exp = sorted(tuple(map(tuple, ls.data)) for ls in g.data)
    assert got == exp
    # sanity: undirected DOES merge this input (reversing one line)
    assert len(L.line_merge(g).data) == 2 or L.line_merge(g).type_id == 2


def test_line_merge_directed_cycle():
    g = parse_wkt(
        "MULTILINESTRING((0 0, 1 0),(1 0, 1 1),(1 1, 0 1),(0 1, 0 0))"
    )
    out = L.line_merge(g, directed=True)
    assert out.type_id == 2  # single closed LINESTRING
    assert len(out.data) == 5
    assert tuple(out.data[0]) == tuple(out.data[-1])


def test_equals_identical_reference_cases():
    """XY-expressible expectations from GEOSEqualsIdenticalTest.cpp
    (tests 1,5,6,9,11,12,13,14,15; 7/8/16 as coordinate-value cases)."""
    from geos_spark.kernels.geom import Geom
    from geos_spark.kernels.scalars import equals_identical as eq

    w = parse_wkt
    assert not eq(w("POINT EMPTY"), w("LINESTRING EMPTY"))
    assert not eq(
        w("LINESTRING (1 1, 2 2)"), w("MULTILINESTRING ((1 1, 2 2))")
    )
    assert not eq(
        w("GEOMETRYCOLLECTION (LINESTRING (1 1, 2 2))"),
        w("MULTILINESTRING ((1 1, 2 2))"),
    )
    assert eq(w("LINESTRING (1 1, 2 2)"), w("LINESTRING (1 1, 2 2)"))
    assert eq(
        w("POLYGON ((0 0, 1 0, 1 1, 0 0))"),
        w("POLYGON ((0 0, 1 0, 1 1, 0 0))"),
    )
    # same ring, rotated start -> NOT identical
    assert not eq(
        w("POLYGON ((0 0, 1 0, 1 1, 0 0))"),
        w("POLYGON ((1 0, 1 1, 0 0, 1 0))"),
    )
    # hole count differs
    assert not eq(
        w("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 2 1, 2 2, 1 1))"),
        w(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 2 1, 2 2, 1 1),"
            " (3 3, 4 3, 4 4, 3 3))"
        ),
    )
    assert eq(
        w("MULTILINESTRING ((1 1, 2 2), (2 2, 3 3))"),
        w("MULTILINESTRING ((1 1, 2 2), (2 2, 3 3))"),
    )
    # component order matters
    assert not eq(
        w("MULTILINESTRING ((1 1, 2 2), (2 2, 3 3))"),
        w("MULTILINESTRING ((2 2, 3 3), (1 1, 2 2))"),
    )
    # NaN == NaN; inf == inf; -0.0 == 0.0
    nan, inf = float("nan"), float("inf")
    assert eq(Geom.point(nan, inf), Geom.point(nan, inf))
    assert eq(Geom.point(nan, 0.0), Geom.point(nan, 0.0))
    assert eq(Geom.point(1.0, 0.0), Geom.point(1.0, -0.0))
    assert not eq(Geom.point(nan, 1.0), Geom.point(nan, 2.0))
    # equals_exact(0) by contrast treats NaN as unequal
    from geos_spark.kernels.scalars import equals_exact

    assert not equals_exact(Geom.point(nan, 0.0), Geom.point(nan, 0.0), 0.0)
