"""offsetCurve vs the reference unit oracles
(tests/unit/capi/GEOSOffsetCurveTest.cpp; compared normalized with the
tests' own tolerance)."""

import pytest

from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.offsetcurve import offset_curve
from geos_spark.kernels.wkt import parse_wkt, write_wkt

CASES = [
    ("LINESTRING(0 0, 10 0)", "LINESTRING (0 2, 10 2)", 2, "round", 2),
    ("LINESTRING(0 0, 10 0)", "LINESTRING (10 -2, 0 -2)", -2, "round", 2),
    ("LINESTRING(0 0, 10 0, 10 10)",
     "LINESTRING (0 -2, 10 -2, 10.3901806 -1.9615705, "
     "10.76536686 -1.8477590, 11.11114046 -1.66293922, "
     "11.41421356 -1.41421356, 11.66293922 -1.11114046, "
     "11.84775906 -0.76536686, 11.96157056 -0.3901806, 12 0, 12 10)",
     -2, "round", 2),
    ("LINESTRING(0 0, 10 0, 10 10)", "LINESTRING (0 2, 8 2, 8 10)",
     2, "round", 2),
    ("LINESTRING(0 0, 10 0)", "LINESTRING (0 0, 10 0)", 0, "round", 2),
]


@pytest.mark.parametrize("wkt,exp,dist,join,ml", CASES)
def test_offset_curve(wkt, exp, dist, join, ml):
    got = offset_curve(
        parse_wkt(wkt), dist, quad_segs=8, join=join, mitre_limit=ml
    )
    assert geoms_equal_normalized(got, parse_wkt(exp), 1e-6), write_wkt(got)


def test_offset_curve_mitre_postgis_413():
    got = offset_curve(
        parse_wkt(
            "LINESTRING(33282908 6005055,33282900 6005050,"
            "33282892 6005042,33282876 6005007,33282863 6004982,"
            "33282866 6004971,33282876 6004975,33282967 6005018,"
            "33282999 6005031)"
        ),
        44, quad_segs=8, join="mitre", mitre_limit=1,
    )
    exp = parse_wkt(
        "LINESTRING (33282951.601378817 6005059.236579252, "
        "33282982.439409934 6005071.764529393)"
    )
    assert geoms_equal_normalized(got, exp, 1e-6), write_wkt(got)


def test_offset_curve_polygon():
    got = offset_curve(
        parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"), 2,
        quad_segs=1,
    )
    # buffer boundary of the square — a single closed line
    assert got.type_id == 2 and len(got.data) > 4
