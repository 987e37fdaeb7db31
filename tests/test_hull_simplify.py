"""PolygonHullSimplifier vs the reference's own unit suite
(tests/unit/simplify/PolygonHullSimplifierTest.cpp — all 10 test
objects, normalized-exact like ensure_equals_geometry)."""

import pyspark.sql.functions as F
import pytest

from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.hull_simplify import polygon_hull_simplify
from geos_spark.kernels.wkt import parse_wkt

W1 = (
    "POLYGON ((30 90, 10 40, 40 10, 70 10, 90 30, 80 80, 70 40, 30 40,"
    " 50 50, 60 70, 30 90))"
)
W2 = (
    "POLYGON ((10 90, 40 60, 20 40, 40 20, 70 50, 40 30, 30 40, 60 70,"
    " 50 90, 90 90, 90 10, 10 10, 10 90))"
)

VERTEX_CASES = [
    # (wkt, is_outer, fraction, expected) — test<1>..test<8>
    (W1, True, 0,
     "POLYGON ((30 90, 80 80, 90 30, 70 10, 40 10, 10 40, 30 90))"),
    (W1, True, 0.8,
     "POLYGON ((30 90, 60 70, 80 80, 90 30, 70 10, 40 10, 10 40, 30 90))"),
    (W1, True, 1, W1),
    (W2, True, 0.5,
     "POLYGON ((10 90, 50 90, 90 90, 90 10, 10 10, 10 90))"),
    (W2, True, 0.6,
     "POLYGON ((10 90, 40 60, 60 70, 50 90, 90 90, 90 10, 10 10, 10 90))"),
    (W2, True, 0.7,
     "POLYGON ((10 90, 40 60, 30 40, 60 70, 50 90, 90 90, 90 10, 10 10,"
     " 10 90))"),
    ("POLYGON ((10 10, 10 90, 90 90, 90 50, 90 10, 50 10, 10 10))",
     True, 0.4,
     "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10))"),
    ("POLYGON ((11 14, 2 31, 18 29, 25 17, 38 16, 29 5, 19 11, 11 0,"
     " 0 10, 11 14))",
     False, 0.5,
     "POLYGON ((19 11, 29 5, 18 29, 2 31, 19 11))"),
    ("POLYGON ((50 100, 30 70, 0 50, 30 30, 50 0, 70 30, 100 50, 70 70,"
     " 50 100), (50 75, 40 50, 10 50, 36 35, 50 5, 65 35, 90 50, 60 60,"
     " 50 75))",
     True, 0.1,
     "POLYGON ((50 100, 100 50, 50 0, 0 50, 50 100),"
     " (36 35, 50 5, 60 60, 36 35))"),
    ("POLYGON ((70 300, 237 395, 145 296, 251 295, 320 40, 190 20,"
     " 60 60, 100 180, 70 300), (90 270, 100 220, 128 255, 180 270,"
     " 90 270), (110 160, 90 80, 180 90, 150 100, 110 160),"
     " (250 210, 160 200, 224 185, 250 160, 250 210))",
     False, 0.1,
     "POLYGON ((70 300, 100 180, 60 60, 320 40, 251 295, 145 296,"
     " 70 300), (90 270, 180 270, 100 220, 90 270),"
     " (110 160, 180 90, 90 80, 110 160),"
     " (250 210, 250 160, 160 200, 250 210))"),
    ("MULTIPOLYGON (((70 300, 237 395, 145 296, 251 295, 320 40,"
     " 190 20, 60 60, 100 180, 70 300), (90 270, 100 220, 128 255,"
     " 180 270, 90 270), (110 160, 90 80, 180 90, 150 100, 110 160),"
     " (250 210, 160 200, 224 185, 250 160, 250 210)),"
     " ((290 370, 310 200, 385 123, 437 188, 440 190, 440 290, 400 370,"
     " 350 360, 340 310, 290 370), (357 267, 415 242, 389.5 234,"
     " 376 216, 357 267), (370 340, 360 280, 380 310, 400 300,"
     " 370 340)))",
     False, 0.1,
     "MULTIPOLYGON (((70 300, 100 180, 60 60, 320 40, 251 295, 145 296,"
     " 70 300), (90 270, 180 270, 100 220, 90 270),"
     " (110 160, 180 90, 90 80, 110 160),"
     " (250 210, 250 160, 160 200, 250 210)),"
     " ((310 200, 437 188, 400 370, 350 360, 340 310, 310 200),"
     " (357 267, 415 242, 376 216, 357 267),"
     " (370 340, 400 300, 360 280, 370 340)))"),
    ("MULTIPOLYGON (((50 50, 50 250, 100 253, 100 250, 100 300,"
     " 300 300, 200 200, 300 150, 300 50, 50 50), (180 200, 70 200,"
     " 70 70, 200 100, 280 70, 200 150, 180 200)), ((90 180, 160 180,"
     " 160 100, 125 139, 100 100, 90 180)), ((380 280, 310 280,"
     " 250 200, 310 230, 350 150, 380 280)))",
     True, 0.1,
     "MULTIPOLYGON (((50 50, 50 250, 100 300, 300 300, 200 200,"
     " 300 150, 300 50, 50 50), (180 200, 70 200, 70 70, 200 100,"
     " 180 200)), ((90 180, 160 180, 160 100, 100 100, 90 180)),"
     " ((380 280, 350 150, 250 200, 310 280, 380 280)))"),
]

AREA_CASES = [
    # (wkt, area_delta_ratio, expected) — test<9>, test<10>; outer
    (W1, 0,
     "POLYGON ((10 40, 30 90, 60 70, 50 50, 30 40, 70 40, 80 80, 90 30,"
     " 70 10, 40 10, 10 40))"),
    (W1, 0.01,
     "POLYGON ((10 40, 30 90, 60 70, 50 50, 30 40, 70 40, 80 80, 90 30,"
     " 70 10, 40 10, 10 40))"),
    (W1, 0.1,
     "POLYGON ((10 40, 30 90, 60 70, 50 50, 70 40, 80 80, 90 30, 70 10,"
     " 40 10, 10 40))"),
    (W1, 0.2,
     "POLYGON ((30 90, 60 70, 70 40, 80 80, 90 30, 70 10, 40 10, 10 40,"
     " 30 90))"),
    (W1, 1,
     "POLYGON ((30 90, 80 80, 90 30, 70 10, 40 10, 10 40, 30 90))"),
    ("POLYGON ((30 120, 60 240, 200 220, 60.02 240.08, 80 320, 320 280,"
     " 230 160, 250 60, 30 120))",
     0.01,
     "POLYGON ((30 120, 80 320, 320 280, 230 160, 250 60, 30 120))"),
]


@pytest.mark.parametrize("wkt,is_outer,frac,expected", VERTEX_CASES)
def test_hull_vertex_fraction(wkt, is_outer, frac, expected):
    got = polygon_hull_simplify(
        parse_wkt(wkt), is_outer, vertex_num_fraction=frac
    )
    assert geoms_equal_normalized(got, parse_wkt(expected))


@pytest.mark.parametrize("wkt,ratio,expected", AREA_CASES)
def test_hull_area_delta(wkt, ratio, expected):
    got = polygon_hull_simplify(
        parse_wkt(wkt), True, area_delta_ratio=ratio
    )
    assert geoms_equal_normalized(got, parse_wkt(expected))


def test_hull_rejects_non_polygonal():
    with pytest.raises(ValueError):
        polygon_hull_simplify(
            parse_wkt("LINESTRING (0 0, 1 1)"), True,
            vertex_num_fraction=0.5,
        )


def test_hull_outer_contains_input_inner_contained(spark):
    """Containment invariants end-to-end through the column fn, plus
    validity (the reference test's ensure(isValid))."""
    from geos_spark.functions import st

    df = spark.createDataFrame(
        [(1, W1), (2, W2)], "id long, wkt string"
    )
    g = df.withColumn("wkb", st.st_geomfromtext(F.col("wkt")))
    r = g.select(
        "id",
        st.st_area(F.col("wkb")).alias("a0"),
        st.st_area(
            st.st_polygonhullsimplify(True, 0.5)(F.col("wkb"))
        ).alias("ao"),
        st.st_area(
            st.st_polygonhullsimplify(False, 0.5)(F.col("wkb"))
        ).alias("ai"),
        st.st_isvalid(
            st.st_polygonhullsimplify(True, 0.5)(F.col("wkb"))
        ).alias("vo"),
    ).collect()
    for row in r:
        assert row.ao >= row.a0 >= row.ai
        assert row.vo is True
