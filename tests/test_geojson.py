import pytest

from geos_spark.kernels.geojson import geojson_to_geom, geom_to_geojson
from geos_spark.kernels.wkt import parse_wkt, write_wkt


@pytest.mark.parametrize(
    "wkt",
    [
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
        "MULTIPOINT ((1 1), (2 2))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
        "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))",
    ],
)
def test_geojson_roundtrip(wkt):
    g = parse_wkt(wkt)
    s = geom_to_geojson(g)
    back = geojson_to_geom(s)
    assert write_wkt(back) == wkt


def test_feature_unwrap():
    f = '{"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[3,4]}}'
    g = geojson_to_geom(f)
    assert write_wkt(g) == "POINT (3 4)"
