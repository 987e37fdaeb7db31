"""GeometryFixer (STRUCTURE makeValid) vs the reference's own unit
suite — every 2D case of tests/unit/geom/util/GeometryFixerTest.cpp
(47 cases; the Z variants are out of scope for the 2D engine),
compared normalized-exact like ensure_equals_geometry."""

import pytest

from geos_spark.kernels.fixer import fix_structure
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import parse_wkt

FIX_CASES = [
    ("POINT (0 0)", "POINT (0 0)"),
    ("POINT (0 Nan)", "POINT EMPTY"),
    ("POINT EMPTY", "POINT EMPTY"),
    ("MULTIPOINT ((0 Nan))", "MULTIPOINT EMPTY"),
    ("MULTIPOINT ((0 0), (1 1))", "MULTIPOINT ((0 0), (1 1))"),
    ("MULTIPOINT ((0 0), EMPTY)", "MULTIPOINT ((0 0))"),
    ("MULTIPOINT (EMPTY, EMPTY)", "MULTIPOINT EMPTY"),
    ("LINESTRING EMPTY", "LINESTRING EMPTY"),
    ("LINESTRING (0 0, 1 NaN, 0 0)", "LINESTRING EMPTY"),
    ("LINESTRING (0 0, 0 0, 0 0)", "LINESTRING EMPTY"),
    ("LINESTRING (0 0, 0 0, 0 0, 0 0, 0 0, 1 1)", "LINESTRING (0 0, 1 1)"),
    ("LINESTRING (0 0, 9 9, 9 5, 0 5)", "LINESTRING (0 0, 9 9, 9 5, 0 5)"),
    ("LINEARRING EMPTY", "LINEARRING EMPTY"),
    ("LINEARRING (0 0, 1 NaN, 0 0)", "LINEARRING EMPTY"),
    ("LINEARRING (0 0, 1 NaN, 1 0, 0 0)", "LINEARRING EMPTY"),
    ("LINEARRING (10 10, 10 90, 90 90, 90 10, 10 10)",
     "LINEARRING (10 10, 10 90, 90 90, 90 10, 10 10)"),
    ("LINEARRING (10 10, 10 90, 90 90, 10 90, 10 10)",
     "LINESTRING (10 10, 10 90, 90 90, 10 90, 10 10)"),
    ("LINEARRING (10 10, 10 90, 90 10, 90 90, 10 10)",
     "LINESTRING (10 10, 10 90, 90 10, 90 90, 10 10)"),
    ("MULTILINESTRING ((10 90, 90 10, 90 90), (90 50, 10 50))",
     "MULTILINESTRING ((10 90, 90 10, 90 90), (90 50, 10 50))"),
    ("MULTILINESTRING ((10 10, 90 90), (10 10, 10 10, 10 10))",
     "LINESTRING (10 10, 90 90)"),
    ("MULTILINESTRING ((10 10, 90 90), EMPTY)",
     "LINESTRING (10 10, 90 90)"),
    ("MULTILINESTRING (EMPTY, EMPTY)", "MULTILINESTRING EMPTY"),
    ("POLYGON EMPTY", "POLYGON EMPTY"),
    ("POLYGON ((10 90, 90 10, 90 90, 10 10, 10 90))",
     "MULTIPOLYGON (((10 90, 50 50, 10 10, 10 90)),"
     " ((50 50, 90 90, 90 10, 50 50)))"),
    ("POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90),"
     " (80 70, 30 70, 30 20, 30 70, 80 70),"
     " (70 80, 70 30, 20 30, 70 30, 70 80))",
     "POLYGON ((90 90, 90 10, 10 10, 10 90, 90 90))"),
    ("POLYGON ((10 90, 50 90, 50 30, 70 30, 70 50, 30 50, 30 70,"
     " 90 70, 90 10, 10 10, 10 90))",
     "POLYGON ((10 90, 50 90, 50 70, 90 70, 90 10, 10 10, 10 90),"
     " (50 50, 50 30, 70 30, 70 50, 50 50))"),
    ("POLYGON ((0 0, 0 5, 6 5, 6 0, 0 0), (3 1, 4 1, 4 2, 3 2, 3 1),"
     " (3 2, 1 4, 5 4, 4 2, 4 3, 3 2, 2 3, 3 2))",
     "MULTIPOLYGON (((0 0, 0 5, 6 5, 6 0, 0 0),"
     " (1 4, 2 3, 3 2, 3 1, 4 1, 4 2, 5 4, 1 4)),"
     " ((3 2, 4 3, 4 2, 3 2)))"),
    ("POLYGON ((10 90, 90 NaN, 90 10, 10 10, 10 90))",
     "POLYGON ((10 10, 10 90, 90 10, 10 10))"),
    ("POLYGON ((10 90, 90 10, 90 10, 90 10, 90 10, 90 10, 10 10, 10 90))",
     "POLYGON ((10 10, 10 90, 90 10, 10 10))"),
    ("POLYGON ((10 10, 10 90, 90 90, 10 90, 10 10),"
     " (20 80, 60 80, 60 40, 20 40, 20 80))",
     "POLYGON EMPTY"),
    ("POLYGON ((10 10, 10 NaN, 90 NaN, 10 NaN, 10 10))",
     "POLYGON EMPTY"),
    ("POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90),"
     " (80 80, 20 80, 20 20, 20 80, 80 80))",
     "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10))"),
    ("MULTIPOLYGON EMPTY", "MULTIPOLYGON EMPTY"),
    ("MULTIPOLYGON (EMPTY, EMPTY)", "MULTIPOLYGON EMPTY"),
    ("MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), EMPTY,"
     " ((50 40, 80 40, 80 10, 50 10, 50 40)))",
     "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)),"
     " ((50 40, 80 40, 80 10, 50 10, 50 40)))"),
    ("MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)),"
     " ((50 40, 50 40, 50 40, 50 40, 50 40)))",
     "POLYGON ((10 10, 10 40, 40 40, 40 10, 10 10))"),
    ("GEOMETRYCOLLECTION EMPTY", "GEOMETRYCOLLECTION EMPTY"),
    ("GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)",
     "GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)"),
    ("POLYGON ((50 90, 80 90, 80 10, 50 10, 50 90),"
     " (70 80, 90 80, 90 20, 70 20, 70 80),"
     " (40 80, 40 50, 0 50, 0 80, 40 80),"
     " (30 40, 10 40, 10 60, 30 60, 30 40),"
     " (60 70, 80 70, 80 30, 60 30, 60 70))",
     "MULTIPOLYGON (((10 40, 10 50, 0 50, 0 80, 40 80, 40 50, 30 50,"
     " 30 40, 10 40)), ((70 80, 70 70, 60 70, 60 30, 70 30, 70 20,"
     " 80 20, 80 10, 50 10, 50 90, 80 90, 80 80, 70 80)))"),
]

KEEP_COLLAPSE_CASES = [
    ("LINESTRING (0 0, 0 0, 0 0)", "POINT (0 0)"),
    ("LINEARRING (0 0, 1 NaN, 0 0)", "POINT (0 0)"),
    ("LINEARRING (0 0, 1 NaN, 1 0, 0 0)", "LINESTRING (0 0, 1 0, 0 0)"),
    ("MULTILINESTRING ((10 10, 90 90), (10 10, 10 10, 10 10))",
     "GEOMETRYCOLLECTION (POINT (10 10), LINESTRING (10 10, 90 90))"),
    ("POLYGON ((10 10, 10 NaN, 90 NaN, 10 NaN, 10 10))",
     "POINT (10 10)"),
    ("POLYGON ((10 10, 10 90, 90 90, 10 90, 10 10),"
     " (20 80, 60 80, 60 40, 20 40, 20 80))",
     "LINESTRING (10 10, 10 90, 90 90, 10 90, 10 10)"),
    ("POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90),"
     " (80 80, 20 80, 20 20, 20 80, 80 80))",
     "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10))"),
    ("MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)),"
     " ((50 40, 50 40, 50 40, 50 40, 50 40)))",
     "GEOMETRYCOLLECTION (POINT (50 40),"
     " POLYGON ((10 10, 10 40, 40 40, 40 10, 10 10)))"),
]


@pytest.mark.parametrize("wkt,expected", FIX_CASES)
def test_fix_structure(wkt, expected):
    got = fix_structure(parse_wkt(wkt), keep_collapsed=False)
    assert geoms_equal_normalized(got, parse_wkt(expected)), (
        wkt, expected
    )


@pytest.mark.parametrize("wkt,expected", KEEP_COLLAPSE_CASES)
def test_fix_structure_keep_collapsed(wkt, expected):
    got = fix_structure(parse_wkt(wkt), keep_collapsed=True)
    assert geoms_equal_normalized(got, parse_wkt(expected)), (
        wkt, expected
    )


def test_ring_vs_line_type_distinction():
    """A valid ring stays a ring; an invalid one degrades to a plain
    LineString (fixLinearRingElement's isValid branch)."""
    ok = fix_structure(
        parse_wkt("LINEARRING (10 10, 10 90, 90 90, 90 10, 10 10)")
    )
    assert ok.is_ring
    bad = fix_structure(
        parse_wkt("LINEARRING (10 10, 10 90, 90 10, 90 90, 10 10)")
    )
    assert not bad.is_ring


# ----------------------------------------------------------------- #
# RemoveRepeatedPoints (capi GEOSRemoveRepeatedPointsTest.cpp)
# ----------------------------------------------------------------- #


def test_remove_repeated_points_tolerance():
    from geos_spark.kernels.fixer import remove_repeated_points
    from geos_spark.kernels.wkt import write_wkt

    g = parse_wkt(
        "POLYGON ((0 0, 0 1, 0 10, 10 10, 10 0, 9 0, 1 0, 0 0))"
    )
    out = remove_repeated_points(g, 3.0)
    assert write_wkt(out) == "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"
    # zero tolerance: only exact consecutive dups removed
    g2 = parse_wkt("LINESTRING (0 0, 0 0, 1 1, 1 1, 2 2)")
    assert write_wkt(remove_repeated_points(g2, 0.0)) == (
        "LINESTRING (0 0, 1 1, 2 2)"
    )


def test_remove_repeated_points_errors():
    from geos_spark.kernels.fixer import remove_repeated_points

    # over-collapse is an error (geos#759)
    with pytest.raises(ValueError):
        remove_repeated_points(
            parse_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"), 2.0
        )
    # curved input is an error
    with pytest.raises(ValueError):
        remove_repeated_points(
            parse_wkt("CIRCULARSTRING (0 0, 1 1, 2 0, 2 0, 2 0)"), 0.0
        )


def test_structure_columns(spark):
    """st_makevalidstructure + st_removerepeatedpoints end-to-end,
    incl. the per-row NULL contract for the reference's error cases."""
    import pyspark.sql.functions as F

    from geos_spark.functions import st

    rows = [
        (1, "POLYGON ((10 90, 90 10, 90 90, 10 10, 10 90))"),  # bowtie
        (2, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),  # collapses @2.0
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, wkt string")
    g = df.withColumn("wkb", st.st_geomfromtext(F.col("wkt")))
    res = {
        r.id: r
        for r in g.select(
            "id",
            st.st_geometrytype(
                st.st_makevalidstructure()(F.col("wkb"))
            ).alias("t"),
            st.st_area(
                st.st_makevalidstructure()(F.col("wkb"))
            ).alias("a"),
            st.st_astext(
                st.st_removerepeatedpoints(2.0)(F.col("wkb"))
            ).alias("rrp"),
        ).collect()
    }
    assert res[1].t == "MultiPolygon"
    assert res[1].a == pytest.approx(3200.0)  # two 40x80/2 triangles
    assert res[1].rrp is not None
    assert res[2].rrp is None  # over-collapse -> NULL row
    assert res[3].t is None and res[3].rrp is None


# ----------------------------------------------------------------- #
# Polygonize_full / Polygonize_valid (capi GEOSPolygonizeTest.cpp)
# ----------------------------------------------------------------- #


def test_polygonize_full_reference_case():
    from geos_spark.kernels.polygonize import polygonize_full
    from geos_spark.kernels.wkt import write_wkt

    g = parse_wkt(
        "MULTILINESTRING ((0 0, 1 0, 1 1, 0 1, 0 0),"
        " (0 0, 0.5 0.5), (1 1, 2 2, 1 2, 2 1, 1 1))"
    )
    polys, cuts, dangles, invalid = polygonize_full(g)
    assert [write_wkt(p) for p in polys] == [
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    ]
    assert cuts == []
    assert [write_wkt(d) for d in dangles] == [
        "LINESTRING (0 0, 0.5 0.5)"
    ]
    assert [write_wkt(i) for i in invalid] == [
        "LINESTRING (1 1, 2 2, 1 2, 2 1, 1 1)"
    ]


def test_polygonize_cut_edges_and_valid():
    from geos_spark.kernels.polygonize import (
        polygonize_full,
        polygonize_valid,
    )
    from geos_spark.kernels import geom as G

    # duplicated ring -> both copies are cut edges (capi test<1>)
    dup = parse_wkt(
        "MULTILINESTRING ((1 3, 3 3, 3 1, 1 1, 1 3),"
        " (1 3, 3 3, 3 1, 1 1, 1 3))"
    )
    _, cuts, _, _ = polygonize_full(dup)
    assert len(cuts) == 2
    # nested squares: valid extraction -> one polygon with hole
    nested = parse_wkt(
        "MULTILINESTRING ((100 100, 100 300, 300 300, 300 100, 100 100),"
        " (150 150, 150 250, 250 250, 250 150, 150 150))"
    )
    v = polygonize_valid(nested)
    assert v.type_id == G.POLYGON and len(v.data) == 2
    # dangle only -> empty GC (capi test<7>)
    assert polygonize_valid(parse_wkt("LINESTRING (0 0, 1 1)")).is_empty
    # two disjoint squares -> MULTIPOLYGON of 2 (capi test<8>)
    two = parse_wkt(
        "MULTILINESTRING ((0 0, 1 0, 1 1, 0 1, 0 0),"
        " (1 1, 2 1, 2 2, 1 2, 1 1))"
    )
    v2 = polygonize_valid(two)
    assert v2.type_id == G.MULTIPOLYGON and len(v2.data) == 2


def test_polygonize_full_column(spark):
    import pyspark.sql.functions as F

    from geos_spark.functions import st

    df = spark.createDataFrame(
        [
            (1,
             "MULTILINESTRING ((0 0, 1 0, 1 1, 0 1, 0 0),"
             " (0 0, 0.5 0.5), (1 1, 2 2, 1 2, 2 1, 1 1))"),
            (2, None),
        ],
        "id long, wkt string",
    )
    g = df.withColumn("wkb", st.st_geomfromtext(F.col("wkt")))
    out = g.select(
        "id",
        st.st_polygonizefull(F.col("wkb")).alias("pz"),
        "wkb",
    ).select(
        "id",
        st.st_numgeometries(F.col("pz.polygons")).alias("np"),
        st.st_numgeometries(F.col("pz.dangles")).alias("nd"),
        st.st_numgeometries(F.col("pz.invalid_rings")).alias("ni"),
        st.st_astext(st.st_polygonizevalid(F.col("wkb"))).alias("pv"),
    ).collect()
    res = {r.id: r for r in out}
    assert res[1].np == 1 and res[1].nd == 1 and res[1].ni == 1
    assert res[1].pv == "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    assert res[2].np is None and res[2].pv is None
