"""isValidReason vs the reference's CAPI oracle
(tests/unit/capi/GEOSisValidReasonTest.cpp) and error-code semantics
(TopologyValidationError.cpp:32-46)."""

import pytest

from geos_spark.kernels.valid import valid_detail, valid_reason
from geos_spark.kernels.wkt import parse_wkt

CASES = [
    ("LINESTRING (1 2, 4 5, 9 -2)", "Valid Geometry"),
    # CAPI test 2: bowtie -> computed intersection point
    ("POLYGON ((0 0, 1 0, 0 1, 1 1, 0 0))", "Self-intersection[0.5 0.5]"),
]


@pytest.mark.parametrize("wkt,exp", CASES)
def test_reason_oracle(wkt, exp):
    assert valid_reason(parse_wkt(wkt)) == exp


@pytest.mark.parametrize(
    "wkt,msg",
    [
        (
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
            "(15 15, 16 15, 16 16, 15 16, 15 15))",
            "Hole lies outside shell",
        ),
        (
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
            "(2 2, 5 2, 5 5, 2 5, 2 2),(3 3, 4 3, 4 4, 3 4, 3 3))",
            "Holes are nested",
        ),
        (
            "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)),"
            "((2 2, 5 2, 5 5, 2 5, 2 2)))",
            "Nested shells",
        ),
        ("LINESTRING (0 0, 0 0)", "Too few points in geometry component"),
    ],
)
def test_reason_codes(wkt, msg):
    info = valid_detail(parse_wkt(wkt))
    assert info is not None and info[0] == msg, info


def test_valid_detail_none_for_valid():
    assert valid_detail(parse_wkt("POINT (1 1)")) is None
    assert (
        valid_detail(
            parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        )
        is None
    )
