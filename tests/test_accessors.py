"""Structural accessor surface (kernels/access.py + st_* columns) vs
the GEOS C-API getter contracts (capi/geos_c.h.in; expectations from
the documented semantics and capi unit tests, e.g.
tests/unit/capi/GEOSGeom_extractUniquePointsTest.cpp,
GEOSOrientPolygonsTest.cpp)."""

import pyspark.sql.functions as F
import pytest

from geos_spark.functions import st
from geos_spark.kernels import access as A
from geos_spark.kernels import geom as G
from geos_spark.kernels.wkt import parse_wkt, write_wkt


def wkt(s):
    return parse_wkt(s)


def out(g):
    return write_wkt(g)


# ----------------------------------------------------------------- #
# kernel-level contracts
# ----------------------------------------------------------------- #


def test_point_n_zero_based():
    g = wkt("LINESTRING (0 0, 1 1, 2 2)")
    assert out(A.point_n(g, 0)) == "POINT (0 0)"
    assert out(A.point_n(g, 2)) == "POINT (2 2)"
    with pytest.raises(ValueError):
        A.point_n(g, 3)
    with pytest.raises(ValueError):
        A.point_n(g, -1)
    with pytest.raises(ValueError):
        A.point_n(wkt("POINT (1 1)"), 0)


def test_start_end_point():
    g = wkt("LINESTRING (5 5, 1 1, 9 9)")
    assert out(A.start_point(g)) == "POINT (5 5)"
    assert out(A.end_point(g)) == "POINT (9 9)"
    c = wkt("CIRCULARSTRING (0 0, 1 1, 2 0)")
    assert out(A.start_point(c)) == "POINT (0 0)"
    assert out(A.end_point(c)) == "POINT (2 0)"


def test_rings():
    g = wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (1 1, 2 1, 2 2, 1 2, 1 1), (5 5, 6 5, 6 6, 5 6, 5 5))"
    )
    assert A.num_interior_rings(g) == 2
    shell = A.exterior_ring(g)
    assert shell.type_id == G.LINESTRING
    assert out(shell) == "LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)"
    assert out(A.interior_ring_n(g, 1)) == (
        "LINESTRING (5 5, 6 5, 6 6, 5 6, 5 5)"
    )
    with pytest.raises(ValueError):
        A.interior_ring_n(g, 2)
    with pytest.raises(ValueError):
        A.num_interior_rings(wkt("POINT (0 0)"))
    # Surface contract includes CurvePolygon
    cp = wkt(
        "CURVEPOLYGON (CIRCULARSTRING (0 0, 1 1, 2 0, 1 -1, 0 0),"
        " (0.5 0, 1 0.2, 1.5 0, 0.5 0))"
    )
    assert A.num_interior_rings(cp) == 1
    assert A.exterior_ring(cp).type_id == G.CIRCULARSTRING


def test_geometry_n():
    g = wkt("MULTIPOINT ((1 1), (2 2))")
    assert out(A.geometry_n(g, 1)) == "POINT (2 2)"
    atomic = wkt("POINT (7 7)")
    assert out(A.geometry_n(atomic, 0)) == "POINT (7 7)"
    with pytest.raises(ValueError):
        A.geometry_n(atomic, 1)


def test_unique_points_first_occurrence_order():
    g = wkt("LINESTRING (0 0, 1 1, 0 0, 2 2, 1 1)")
    assert out(A.extract_unique_points(g)) == (
        "MULTIPOINT ((0 0), (1 1), (2 2))"
    )
    poly = wkt("POLYGON ((0 0, 1 0, 1 1, 0 0))")
    assert out(A.extract_unique_points(poly)) == (
        "MULTIPOINT ((0 0), (1 0), (1 1))"
    )
    assert A.extract_unique_points(wkt("POINT EMPTY")).is_empty


def test_num_coordinates():
    assert A.num_coordinates(wkt("POLYGON ((0 0, 1 0, 1 1, 0 0))")) == 4
    assert (
        A.num_coordinates(
            wkt("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))")
        )
        == 3
    )


def test_orient_polygons_both_conventions():
    # shell CW, hole CCW input
    g = wkt(
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0),"
        " (1 1, 2 1, 2 2, 1 2, 1 1))"
    )
    from geos_spark.kernels.scalars import ring_signed_area

    ogc = A.orient_polygons(g, exterior_cw=False)
    assert ring_signed_area(ogc.data[0]) > 0  # shell CCW
    assert ring_signed_area(ogc.data[1]) < 0  # hole CW
    cw = A.orient_polygons(g, exterior_cw=True)
    assert ring_signed_area(cw.data[0]) < 0
    assert ring_signed_area(cw.data[1]) > 0
    # idempotent + collection recursion
    mp = wkt(
        "GEOMETRYCOLLECTION (POINT (1 1),"
        " MULTIPOLYGON (((0 0, 0 1, 1 1, 0 0))))"
    )
    r = A.orient_polygons(mp, exterior_cw=False)
    shell = r.data[1].data[0].data[0]
    assert ring_signed_area(shell) > 0
    with pytest.raises(ValueError):
        A.orient_polygons(
            wkt("CURVEPOLYGON (CIRCULARSTRING (0 0, 1 1, 2 0, 1 -1, 0 0))")
        )


# ----------------------------------------------------------------- #
# column surface end-to-end
# ----------------------------------------------------------------- #


def test_accessor_columns(spark):
    rows = [
        (1, "LINESTRING (0 0, 3 4, 6 0)"),
        (2, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
        (3, "MULTIPOINT ((1 1), (2 2), (1 1))"),
        (4, None),
        (5, "POINT (9 9)"),
    ]
    df = spark.createDataFrame(rows, "id long, wkt string")
    g = df.withColumn("wkb", st.st_geomfromtext(F.col("wkt")))
    res = {
        r.id: r
        for r in g.select(
            "id",
            st.st_astext(st.st_startpoint(F.col("wkb"))).alias("sp"),
            st.st_astext(st.st_endpoint(F.col("wkb"))).alias("ep"),
            st.st_astext(st.st_pointn(1)(F.col("wkb"))).alias("p1"),
            st.st_numinteriorrings(F.col("wkb")).alias("nir"),
            st.st_astext(st.st_exteriorring(F.col("wkb"))).alias("er"),
            st.st_astext(st.st_interiorringn(0)(F.col("wkb"))).alias("ir0"),
            st.st_astext(st.st_geometryn(1)(F.col("wkb"))).alias("g1"),
            st.st_numcoordinates(F.col("wkb")).alias("nc"),
            st.st_astext(st.st_uniquepoints(F.col("wkb"))).alias("up"),
            st.st_dimension(F.col("wkb")).alias("dim"),
            st.st_hasz(F.col("wkb")).alias("hz"),
            st.st_astext(
                st.st_orientpolygons(False)(F.col("wkb"))
            ).alias("op"),
            st.st_astext(st.st_pointonsurface(F.col("wkb"))).alias("pos"),
        ).collect()
    }
    assert res[1].sp == "POINT (0 0)" and res[1].ep == "POINT (6 0)"
    assert res[1].p1 == "POINT (3 4)"
    assert res[1].nir is None and res[1].er is None
    assert res[1].nc == 3 and res[1].dim == 1
    assert res[2].nir == 1
    assert res[2].er == "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"
    assert res[2].ir0 == "LINESTRING (1 1, 2 1, 2 2, 1 2, 1 1)"
    assert res[2].nc == 10 and res[2].dim == 2
    assert res[3].g1 == "POINT (2 2)"
    assert res[3].up == "MULTIPOINT ((1 1), (2 2))"
    assert res[4].sp is None and res[4].nc is None and res[4].hz is None
    assert res[5].g1 is None  # atomic index 1 -> out of range
    assert res[5].dim == 0 and res[5].hz is False
    assert res[2].pos is not None
    # orientation column: shell emitted CCW under the OGC convention
    from geos_spark.kernels.scalars import ring_signed_area
    from geos_spark.kernels.wkt import parse_wkt as pw

    assert ring_signed_area(pw(res[2].op).data[0]) > 0


def test_linear_referencing_columns(spark):
    rows = [(1, "LINESTRING (0 0, 10 0)")]
    df = spark.createDataFrame(rows, "id long, wkt string")
    g = df.withColumn("line", st.st_geomfromtext(F.col("wkt"))).withColumn(
        "pt", st.st_geomfromtext(F.lit("POINT (3 5)"))
    )
    r = g.select(
        st.st_project()(F.col("line"), F.col("pt")).alias("d"),
        st.st_project(normalized=True)(F.col("line"), F.col("pt")).alias(
            "dn"
        ),
        st.st_astext(st.st_interpolate(2.5)(F.col("line"))).alias("ip"),
        st.st_astext(
            st.st_interpolate(0.25, normalized=True)(F.col("line"))
        ).alias("ipn"),
        st.st_astext(st.st_linesubstring(0.2, 0.5)(F.col("line"))).alias(
            "sub"
        ),
    ).collect()[0]
    assert r.d == 3.0 and r.dn == 0.3
    assert r.ip == "POINT (2.5 0)" and r.ipn == "POINT (2.5 0)"
    assert r.sub == "LINESTRING (2 0, 5 0)"


def test_relate_pattern_columns(spark):
    df = spark.createDataFrame(
        [
            (1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT (1 1)"),
            (2, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT (5 5)"),
        ],
        "id long, a string, b string",
    )
    g = df.select(
        "id",
        st.st_geomfromtext(F.col("a")).alias("ga"),
        st.st_geomfromtext(F.col("b")).alias("gb"),
    )
    res = {
        r.id: r
        for r in g.select(
            "id",
            st.st_relatepattern("T*****FF*")(
                F.col("ga"), F.col("gb")
            ).alias("contains"),
            st.st_relatematch("T*F**F***")(
                st.st_relate(F.col("ga"), F.col("ga"))
            ).alias("self_within"),
        ).collect()
    }
    assert res[1].contains is True and res[2].contains is False
    assert res[1].self_within is True


def test_min_clearance_line_column(spark):
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))")],
        "id long, wkt string",
    )
    r = df.select(
        st.st_astext(
            st.st_minclearanceline(st.st_geomfromtext(F.col("wkt")))
        ).alias("l"),
        st.st_minclearance(st.st_geomfromtext(F.col("wkt"))).alias("d"),
    ).collect()[0]
    # nearest approach shell<->hole is distance 3
    assert r.d == 3.0
    pts = parse_wkt(r.l)
    assert pts.type_id == G.LINESTRING and len(pts.data) == 2
    import numpy as np

    assert float(np.hypot(*(pts.data[1] - pts.data[0]))) == 3.0


# ----------------------------------------------------------------- #
# DisjointSubsetUnion (capi :1085) — result equals unaryUnion
# ----------------------------------------------------------------- #


DSU_CASES = [
    # two disjoint overlapping-pairs -> two clusters
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((1 1, 3 1, 3 3, 1 3, 1 1)),"
    " ((10 10, 12 10, 12 12, 10 12, 10 10)), ((11 11, 13 11, 13 13, 11 13, 11 11)))",
    # chain: a-b intersect, b-c intersect -> one cluster of three
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((1 1, 3 1, 3 3, 1 3, 1 1)),"
    " ((2.5 2.5, 4 2.5, 4 4, 2.5 4, 2.5 2.5)))",
    # all disjoint -> pure structural merge
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
    # mixed dims
    "GEOMETRYCOLLECTION (POINT (20 20), LINESTRING (30 30, 31 31),"
    " POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1)))",
    # single geometry
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    # touching (boundary intersects) -> same cluster
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((1 0, 2 0, 2 1, 1 1, 1 0)))",
]


@pytest.mark.parametrize("case", DSU_CASES)
def test_disjoint_subset_union_equals_unary_union(case):
    from geos_spark.kernels.geom import geoms_equal_normalized
    from geos_spark.kernels.union import disjoint_subset_union, unary_union

    g = wkt(case)
    assert geoms_equal_normalized(
        disjoint_subset_union(g), unary_union(g)
    )


def test_disjoint_subset_union_column(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(DSU_CASES)], "id long, wkt string"
    )
    r = df.select(
        "id",
        st.st_area(
            st.st_disjointsubsetunion(st.st_geomfromtext(F.col("wkt")))
        ).alias("a"),
        st.st_area(
            st.st_unaryunion(st.st_geomfromtext(F.col("wkt")))
        ).alias("b"),
    ).collect()
    for row in r:
        assert row.a == pytest.approx(row.b, abs=1e-12)


def test_segment_intersection_and_hex(spark):
    from geos_spark.functions import st

    rows = [
        # crossing at (5, 5)
        (1, 0.0, 0.0, 10.0, 10.0, 0.0, 10.0, 10.0, 0.0),
        # disjoint
        (2, 0.0, 0.0, 1.0, 0.0, 5.0, 5.0, 6.0, 5.0),
        # endpoint touch
        (3, 0.0, 0.0, 2.0, 0.0, 2.0, 0.0, 4.0, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, ax0 double, ay0 double, ax1 double, ay1 double,"
        " bx0 double, by0 double, bx1 double, by1 double"
    )
    out = {
        r.id: r
        for r in df.select(
            "id",
            st.st_segmentintersection(
                "ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1"
            ).alias("i"),
        ).select("id", "i.cx", "i.cy").collect()
    }
    assert (out[1].cx, out[1].cy) == (5.0, 5.0)
    assert out[2].cx is None and out[2].cy is None
    assert (out[3].cx, out[3].cy) == (2.0, 0.0)

    # hex WKB round trip, pure JVM
    g = spark.createDataFrame(
        [(1, "POINT (3 4)")], "id long, wkt string"
    ).select(
        st.st_astext(
            st.st_geomfromhex(
                st.st_ashexwkb(st.st_geomfromtext(F.col("wkt")))
            )
        ).alias("w")
    ).collect()
    assert g[0].w == "POINT (3 4)"


def test_x_y_contains_properly(spark):
    from geos_spark.functions import st

    df = spark.createDataFrame(
        [
            (1, "POINT (3.5 -7.25)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
             "POINT (1 1)"),
            # b on the boundary: contains true, containsProperly false
            (2, "LINESTRING (0 0, 1 1)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
             "POINT (2 1)"),
        ],
        "id long, p string, a string, b string",
    )
    g = df.select(
        "id",
        st.st_geomfromtext(F.col("p")).alias("p"),
        st.st_geomfromtext(F.col("a")).alias("a"),
        st.st_geomfromtext(F.col("b")).alias("b"),
    )
    out = {
        r.id: r
        for r in g.select(
            "id",
            st.st_x(F.col("p")).alias("x"),
            st.st_y(F.col("p")).alias("y"),
            st.st_containsproperly(F.col("a"), F.col("b")).alias("cp"),
        ).collect()
    }
    assert (out[1].x, out[1].y) == (3.5, -7.25)
    assert out[2].x is None and out[2].y is None  # not a point
    assert out[1].cp is True
    assert out[2].cp is False  # boundary point
