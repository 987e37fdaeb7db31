"""snap(A, B, tol) vs the reference's unit oracles
(tests/unit/capi/GEOSSnapTest.cpp, tests/unit/operation/overlay/snap/
GeometrySnapperTest.cpp)."""

import pytest

from geos_spark.kernels.snap import snap
from geos_spark.kernels.wkt import parse_wkt, write_wkt

CASES = [
    # GEOSSnapTest.cpp tests 1-10
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT(0.5 0)", 1,
     "POLYGON ((0.5 0, 10 0, 10 10, 0 10, 0.5 0))"),
    ("LINESTRING (-30 -20, 50 60, 50 0)", "LINESTRING (-29 -20, 40 60, 51 0)",
     2, "LINESTRING (-29 -20, 50 60, 51 0)"),
    ("LINESTRING (-20 -20, 50 50, 100 100)", "LINESTRING (-10 -9, 40 20, 80 79)",
     2, "LINESTRING (-20 -20, -10 -9, 50 50, 80 79, 100 100)"),
    ("LINESTRING(0 0, 10 0)", "LINESTRING(0 0, 9 0)", 2,
     "LINESTRING (0 0, 9 0)"),
    ("LINESTRING(0 0, 10 0)", "LINESTRING(0 0, 9 0, 10 0, 11 0)", 2,
     "LINESTRING (0 0, 9 0, 10 0, 11 0)"),
    ("LINESTRING(0 3,4 1,0 1)", "MULTIPOINT((5 0),(4 1))", 2,
     "LINESTRING (0 3, 4 1, 5 0, 0 1)"),
    ("LINESTRING(0 3,4 1,0 1)", "MULTIPOINT((4 1),(5 0))", 2,
     "LINESTRING (0 3, 4 1, 5 0, 0 1)"),
    ("LINESTRING(0 0,10 0,10 10,0 10,0 0)", "MULTIPOINT((0 0),(-1 0))", 3,
     "LINESTRING (-1 0, 0 0, 10 0, 10 10, 0 10, -1 0)"),
    ("LINESTRING(0 2,5 2,9 2,5 0)", "POINT(5 0)", 3,
     "LINESTRING (0 2, 5 2, 9 2, 5 0)"),
    ("LINESTRING(-71.1317 42.2511,-71.1317 42.2509)",
     "MULTIPOINT((-71.1261 42.2703),(-71.1257 42.2703),(-71.1261 42.2702))",
     0.5,
     "LINESTRING (-71.1257 42.2703, -71.1261 42.2703, -71.1261 42.2702,"
     " -71.1317 42.2509)"),
    # GeometrySnapperTest.cpp
    ("POLYGON ((0 0, 0 100, 100 100, 100 0, 0 0))",
     "MULTIPOINT ((0 0), (0 100.0000001), (100 100), (100 0))", 0.000001,
     "POLYGON ((0 0, 0 100.0000001, 100 100, 100 0, 0 0))"),
    ("POLYGON ((0 0, 0 100, 100 100, 100 0, 0 0))",
     "MULTIPOINT ((0.0000001 50))", 0.000001,
     "POLYGON ((0 0, 0.0000001 50, 0 100, 100 100, 100 0, 0 0))"),
]


@pytest.mark.parametrize("src,tgt,tol,exp", CASES)
def test_snap_oracle(src, tgt, tol, exp):
    got = snap(parse_wkt(src), parse_wkt(tgt), tol)
    assert write_wkt(got) == write_wkt(parse_wkt(exp)), write_wkt(got)
