"""sharedPaths vs the reference unit oracle
(tests/unit/capi/GEOSSharedPathsTest.cpp) + direction semantics."""

import pytest

from geos_spark.kernels.sharedpaths import shared_paths
from geos_spark.kernels.wkt import parse_wkt, write_wkt


def test_capi_case_2():
    a = parse_wkt("LINESTRING (-30 -20, 50 60, 50 70, 50 0)")
    b = parse_wkt("LINESTRING (-29 -20, 50 60, 50 70, 51 0)")
    assert write_wkt(shared_paths(a, b)) == (
        "GEOMETRYCOLLECTION (MULTILINESTRING ((50 60, 50 70)), "
        "MULTILINESTRING EMPTY)"
    )


def test_opposite_direction():
    a = parse_wkt("LINESTRING (0 0, 10 0)")
    b = parse_wkt("LINESTRING (15 0, 5 0)")
    assert write_wkt(shared_paths(a, b)) == (
        "GEOMETRYCOLLECTION (MULTILINESTRING EMPTY, "
        "MULTILINESTRING ((5 0, 10 0)))"
    )


def test_same_direction():
    a = parse_wkt("LINESTRING (0 0, 10 0)")
    b = parse_wkt("LINESTRING (5 0, 15 0)")
    assert write_wkt(shared_paths(a, b)) == (
        "GEOMETRYCOLLECTION (MULTILINESTRING ((5 0, 10 0)), "
        "MULTILINESTRING EMPTY)"
    )


def test_non_lineal_raises():
    a = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b = parse_wkt("LINESTRING (0 0, 1 1)")
    with pytest.raises(ValueError):
        shared_paths(a, b)
