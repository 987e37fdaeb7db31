"""Overlay Z/M population vs the reference's own OverlayNGZTest.cpp
(all 19 objects, including the M variants inside each). The reference
normalizes both sides and compares WKT; here both sides canonicalize
via XY-normalized equality plus an exact multiset comparison of
(x, y, z, m) vertex tuples per component type (NaN == NaN)."""

import math

import pytest

from geos_spark.kernels import geom as G
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import parse_wkt, write_wkt
from geos_spark.kernels.zpop import overlay_zm

INTERSECTION, UNION, DIFFERENCE = 1, 2, 3


def _tuples(g: G.Geom) -> list:
    from geos_spark.kernels.zpop import _leaf_seqs

    out = []
    for coords, zs, ms in _leaf_seqs(g):
        n = len(coords)
        # closed rings: drop the closing duplicate so ring rotation
        # does not change the multiset
        if n > 1 and coords[0, 0] == coords[-1, 0] and coords[0, 1] == coords[-1, 1]:
            n -= 1
        for i in range(n):
            z = float(zs[i]) if zs is not None else None
            m = float(ms[i]) if ms is not None else None
            out.append(
                (
                    float(coords[i, 0]),
                    float(coords[i, 1]),
                    "nan" if z is not None and math.isnan(z) else z,
                    "nan" if m is not None and math.isnan(m) else m,
                )
            )
    return sorted(out, key=repr)


def check(op: int, wkt_a: str, wkt_b: str, wkt_expected: str):
    a, b = parse_wkt(wkt_a), parse_wkt(wkt_b)
    exp = parse_wkt(wkt_expected)
    res = overlay_zm(a, b, op)
    assert geoms_equal_normalized(res, exp), (
        f"XY mismatch: {write_wkt(res)} vs {wkt_expected}"
    )
    assert res.has_z == exp.has_z and res.has_m == exp.has_m, (
        f"dim mismatch: {write_wkt(res)} vs {wkt_expected}"
    )
    assert _tuples(res) == _tuples(exp), (
        f"ordinate mismatch: {write_wkt(res)} vs {wkt_expected}"
    )


# OverlayNGZTest.cpp objects 1-19 (file order)
CASES = [
    # 1: point difference, elevation model fills the surviving point
    (DIFFERENCE, "MULTIPOINT ((1 1), (5 5))", "POINT Z (5 5 99)",
     "POINT Z (1 1 99)"),
    # 2: Point Z / M preserved through intersection
    (INTERSECTION, "POINT Z (5 5 99)",
     "POLYGON Z ((1 9 5, 9 9 9, 9 1 5, 1 1 1, 1 9 5))",
     "POINT Z (5 5 99)"),
    (INTERSECTION, "POINT M (5 5 99)",
     "POLYGON M ((1 9 5, 9 9 9, 9 1 5, 1 1 1, 1 9 5))",
     "POINT M (5 5 99)"),
    # 3: line-line intersection point interpolated (average of inputs)
    (INTERSECTION, "LINESTRING (0 0 0, 10 10 10)",
     "LINESTRING (10 0 0, 0 10 10)", "POINT (5 5 5)"),
    (INTERSECTION, "LINESTRING M (0 0 0, 10 10 10)",
     "LINESTRING M (10 0 0, 0 10 10)", "POINT M (5 5 5)"),
    # 4: explicit vertex value beats interpolation
    (INTERSECTION, "LINESTRING (0 0 0, 10 10 10)",
     "LINESTRING (10 0 0, 5 5 999, 0 10 10)", "POINT (5 5 999)"),
    (INTERSECTION, "LINESTRING M (0 0 0, 10 10 10)",
     "LINESTRING M (10 0 0, 5 5 999, 0 10 10)", "POINT M (5 5 999)"),
    # 5: overlapping line union
    (UNION, "LINESTRING (0 0 0, 10 10 10)",
     "LINESTRING (5 5 990, 15 15 999)",
     "MULTILINESTRING Z ((0 0 0, 5 5 990), (5 5 990, 10 10 10), "
     "(10 10 10, 15 15 999))"),
    (UNION, "LINESTRING M (0 0 0, 10 10 10)",
     "LINESTRING M (5 5 990, 15 15 999)",
     "MULTILINESTRING M ((0 0 0, 5 5 990), (5 5 990, 10 10 10), "
     "(10 10 10, 15 15 999))"),
    # 6: difference against an XY line interpolates from the Z line
    (DIFFERENCE, "LINESTRING (0 0 0, 10 10 10)", "LINESTRING (5 5, 6 6)",
     "MULTILINESTRING ((0 0 0, 5 5 5), (6 6 6, 10 10 10))"),
    (DIFFERENCE, "LINESTRING M (0 0 0, 10 10 10)", "LINESTRING (5 5, 6 6)",
     "MULTILINESTRING M ((0 0 0, 5 5 5), (6 6 6, 10 10 10))"),
    # 7: line-polygon intersection
    (INTERSECTION, "LINESTRING Z (0 0 0, 5 5 5)",
     "POLYGON Z ((1 9 5, 9 9 9, 9 1 5, 1 1 1, 1 9 5))",
     "LINESTRING Z (1 1 1, 5 5 5)"),
    (INTERSECTION, "LINESTRING M (0 0 0, 5 5 5)",
     "POLYGON M ((1 9 5, 9 9 9, 9 1 5, 1 1 1, 1 9 5))",
     "LINESTRING M (1 1 1, 5 5 5)"),
    # 8: line-polygon difference (crossing points interpolated on the line)
    (DIFFERENCE, "LINESTRING Z (0 5 0, 10 5 10)",
     "POLYGON Z ((1 9 5, 9 9 9, 9 1 5, 1 1 1, 1 9 5))",
     "MULTILINESTRING Z ((0 5 0, 1 5 2), (9 5 8, 10 5 10))"),
    (DIFFERENCE, "LINESTRING M (0 5 0, 10 5 10)",
     "POLYGON M ((1 9 5, 9 9 9, 9 1 5, 1 1 1, 1 9 5))",
     "MULTILINESTRING M ((0 5 0, 1 5 2), (9 5 8, 10 5 10))"),
    # 9: XY point inside 3D polygon -> elevation model
    (INTERSECTION, "POINT (5 5)",
     "POLYGON Z ((1 9 50, 9 9 90, 9 1 50, 1 1 10, 1 9 50))",
     "POINT Z (5 5 50)"),
    # 10: XY polygon union with Z point -> every vertex model-filled
    (UNION, "POINT Z (5 5 77)", "POLYGON ((1 9, 9 9, 9 1, 1 1, 1 9))",
     "POLYGON Z ((1 1 77, 1 9 77, 9 9 77, 9 1 77, 1 1 77))"),
    # 11: Z line minus XY polygon (crossings interpolated on the line)
    (DIFFERENCE, "LINESTRING Z (0 5 0, 10 5 10)",
     "POLYGON ((1 9, 9 9, 9 1, 1 1, 1 9))",
     "MULTILINESTRING Z ((0 5 0, 1 5 1), (9 5 9, 10 5 10))"),
    (DIFFERENCE, "LINESTRING M (0 5 0, 10 5 10)",
     "POLYGON ((1 9, 9 9, 9 1, 1 1, 1 9))",
     "MULTILINESTRING M ((0 5 0, 1 5 1), (9 5 9, 10 5 10))"),
    # 12: XY line minus Z polygon — crossings interpolate along the
    # polygon edges, outside points fall to the elevation model
    (DIFFERENCE, "LINESTRING (0 5, 10 5)",
     "POLYGON Z ((1 9 50, 9 9 90, 9 1 50, 1 1 10, 1 9 50))",
     "MULTILINESTRING Z ((0 5 50, 1 5 30), (9 5 70, 10 5 50))"),
    # 13: XY polygon ∩ Z polygon
    (INTERSECTION, "POLYGON ((4 12, 2 6, 7 6, 11 4, 15 15, 4 12))",
     "POLYGON Z ((1 9 50, 9 9 90, 9 1 50, 1 1 10, 1 9 50))",
     "POLYGON Z ((2 6 50, 3 9 60, 9 9 90, 9 5 70, 7 6 90, 2 6 50))"),
    # 14: XY polygon ∪ Z polygon
    (UNION, "POLYGON ((0 3, 3 3, 3 0, 0 0, 0 3))",
     "POLYGON Z ((1 9 50, 9 9 90, 9 1 50, 1 1 10, 1 9 50))",
     "POLYGON Z ((0 0 10, 0 3 50, 1 3 20, 1 9 50, 9 9 90, 9 1 50, "
     "3 1 20, 3 0 50, 0 0 10))"),
    # 15: XY op XY stays XY
    (INTERSECTION, "POLYGON ((4 12, 2 6, 7 6, 11 4, 15 15, 4 12))",
     "POLYGON ((1 9, 9 9, 9 1, 1 1, 1 9))",
     "POLYGON ((2 6, 3 9, 9 9, 9 5, 7 6, 2 6))"),
    # 16: geos ticket #435 — mixed-dimension result, model + vertex
    (INTERSECTION, "LINESTRING (0 0, 0 10, 10 10, 10 0)",
     "LINESTRING (10 10 4, 10 0 5, 0 0 5)",
     "GEOMETRYCOLLECTION Z (POINT Z (0 0 5), LINESTRING Z (10 0 5, 10 10 4))"),
    # 17: XYM - XYM point intersection
    (INTERSECTION, "LINESTRING M (0 0 0, 10 10 10)",
     "LINESTRING M (10 0 0, 0 10 10)", "POINT M (5 5 5)"),
    # 18: XYZ - XYM -> XYZM
    (INTERSECTION, "LINESTRING Z (0 0 10, 10 10 20)",
     "LINESTRING M (10 0 0, 0 10 10)", "POINT ZM (5 5 15 5)"),
    # 19: Point M preserved against an XY polygon
    (INTERSECTION, "POINT M (5 5 99)", "POLYGON ((0 0, 5 0, 5 5, 0 0))",
     "POINT M (5 5 99)"),
]


@pytest.mark.parametrize("op,a,b,exp", CASES)
def test_overlayngz(op, a, b, exp):
    check(op, a, b, exp)


def test_spark_overlay_z(spark):
    """st_intersection carries Z through the pUDF tier."""
    from geos_spark.functions.st import st_astext, st_geomfromtext, st_intersection

    df = spark.createDataFrame(
        [("LINESTRING (0 0 0, 10 10 10)", "LINESTRING (10 0 0, 0 10 10)")],
        "a string, b string",
    )
    r = df.select(
        st_astext(
            st_intersection(st_geomfromtext("a"), st_geomfromtext("b"))
        ).alias("t")
    ).first()
    assert r["t"] == "POINT Z (5 5 5)"
