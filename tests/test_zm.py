"""Z/M ordinate support: declared-dimension semantics, IO round-trip
preservation, and the capi accessor surface.

Oracle cases are the reference's own unit expectations:
- tests/unit/capi/GEOSHasZMTest.cpp (all 10 objects)
- tests/unit/capi/GEOSGeom_getCoordinateDimensionTest.cpp (all 4)
- tests/unit/capi/GEOSGeomGetXYZMTest.cpp (NaN-fallback + error rows)
- WKTWriter outputDimension-4 defaults (src/io/WKTWriter.cpp:66) and
  WKBWriter dims=4 default (include/geos/io/WKBWriter.h:85-95).
"""

import math

import numpy as np
import pytest

from geos_spark.kernels import geom as G
from geos_spark.kernels.scalars import equals_identical
from geos_spark.kernels.wkb import parse_wkb, write_wkb
from geos_spark.kernels.wkt import parse_wkt, write_wkt


# ---------------------------------------------------------------- hasZ/hasM
# GEOSHasZMTest.cpp objects 1-10
HASZM_CASES = [
    ("POLYGON ((1 -2, 9 -2, 9 5, 1 5, 1 -2))", False, False),
    ("POINT M (1 2 3)", False, True),
    ("POINT EMPTY", False, False),
    ("POINT Z EMPTY", True, False),
    ("POINT M EMPTY", False, True),
    ("POINT ZM EMPTY", True, True),
    ("LINESTRING EMPTY", False, False),
    ("LINESTRING Z EMPTY", True, False),
    ("LINESTRING M EMPTY", False, True),
    ("CIRCULARSTRING M (0 0 0, 1 1 1, 2 0 2)", False, True),
]


@pytest.mark.parametrize("wkt,hz,hm", HASZM_CASES)
def test_haszm(wkt, hz, hm):
    g = parse_wkt(wkt)
    assert g.has_z is hz
    assert g.has_m is hm


# GEOSGeom_getCoordinateDimensionTest.cpp objects 1-4 (object 3 is the
# untagged 4-ordinate inference case)
COORDDIM_CASES = [
    ("POLYGON ((0 0, 1 0, 1 1, 0 0))", 2),
    ("POINT (4 2 7)", 3),
    ("LINESTRING (4 2 7 1, 8 2 9 5)", 4),
    ("CIRCULARSTRING Z (0 0 0, 1 1 1, 2 0 2)", 3),
]


@pytest.mark.parametrize("wkt,dim", COORDDIM_CASES)
def test_coord_dimension(wkt, dim):
    assert parse_wkt(wkt).coord_dimension() == dim


def test_collection_flags_or_children():
    # GeometryCollection::setFlags ORs children
    g = parse_wkt("GEOMETRYCOLLECTION (POINT (0 0), POINT Z (1 1 1))")
    assert g.has_z and not g.has_m
    g = parse_wkt("GEOMETRYCOLLECTION (POINT (0 0), POINT M (1 1 1))")
    assert g.has_m and not g.has_z


# ---------------------------------------------------------------- getZ/getM
def test_get_z_m_values():
    # GEOSGeomGetXYZMTest objects 1-4: NaN when the channel is absent
    g = parse_wkt("POINT (1 2)")
    assert math.isnan(float(g.zs[0])) if g.zs is not None else True
    g = parse_wkt("POINT Z (1 2 3)")
    assert float(g.zs[0]) == 3 and g.ms is None
    g = parse_wkt("POINT M (1 2 4)")
    assert g.zs is None and float(g.ms[0]) == 4
    g = parse_wkt("POINT ZM (1 2 3 4)")
    assert float(g.zs[0]) == 3 and float(g.ms[0]) == 4


# ---------------------------------------------------------------- round-trip
RT_CASES = [
    "POINT Z (1 2 3)",
    "POINT M (1 2 4)",
    "POINT ZM (1 2 3 4)",
    "POINT Z EMPTY",
    "POINT ZM EMPTY",
    "LINESTRING Z (0 0 1, 1 1 2)",
    "LINESTRING ZM (0 0 1 10, 1 1 2 20)",
    "LINESTRING M (0 0 7, 2 2 8)",
    "POLYGON Z ((0 0 1, 1 0 2, 1 1 3, 0 0 1))",
    "POLYGON ZM ((0 0 1 5, 1 0 2 6, 1 1 3 7, 0 0 1 5))",
    "POLYGON M ((0 0 1, 1 0 2, 1 1 3, 0 0 1))",
    "MULTIPOINT Z ((0 0 0), (1 1 1))",
    "MULTILINESTRING Z ((0 0 0, 1 1 1), (2 2 2, 3 3 3))",
    "MULTIPOLYGON Z (((0 0 1, 1 0 1, 1 1 1, 0 0 1)))",
    "MULTIPOLYGON ZM (((0 0 1 9, 1 0 1 8, 1 1 1 7, 0 0 1 9)))",
    "GEOMETRYCOLLECTION Z (POINT Z (0 0 5), LINESTRING Z (0 0 1, 1 1 2))",
    "CIRCULARSTRING Z (0 0 1, 1 1 2, 2 0 3)",
    "CIRCULARSTRING ZM (0 0 1 2, 1 1 2 3, 2 0 3 4)",
    "COMPOUNDCURVE Z (CIRCULARSTRING Z (0 0 1, 1 1 2, 2 0 3), (2 0 3, 4 0 4))",
    "CURVEPOLYGON Z (CIRCULARSTRING Z (0 0 1, 2 0 1, 2 2 1, 0 2 1, 0 0 1))",
]


@pytest.mark.parametrize("wkt", RT_CASES)
def test_wkt_roundtrip_identity(wkt):
    g = parse_wkt(wkt)
    assert write_wkt(g) == wkt


@pytest.mark.parametrize("wkt", RT_CASES)
def test_wkb_roundtrip_identity(wkt):
    g = parse_wkt(wkt)
    b = write_wkb(g)
    g2 = parse_wkb(b)
    assert equals_identical(g, g2)
    assert write_wkb(g2) == b
    assert write_wkt(g2) == wkt


def test_wkb_iso_type_offsets():
    # ISO +1000/+2000/+3000 type codes (include/geos/io/WKBConstants.h)
    import struct

    for wkt, code in [
        ("POINT Z (1 2 3)", 1001),
        ("POINT M (1 2 3)", 2001),
        ("POINT ZM (1 2 3 4)", 3001),
        ("LINESTRING Z (0 0 0, 1 1 1)", 1002),
        ("POLYGON ZM ((0 0 1 5, 1 0 2 6, 1 1 3 7, 0 0 1 5))", 3003),
    ]:
        b = write_wkb(parse_wkt(wkt))
        assert b[0] == 1
        (t,) = struct.unpack_from("<I", b, 1)
        assert t == code, (wkt, t)


def test_untagged_third_ordinate_is_z():
    # WKTReader::getCoordinates dimension inference
    g = parse_wkt("POINT (1 2 3)")
    assert g.has_z and not g.has_m
    assert write_wkt(g) == "POINT Z (1 2 3)"


def test_mixed_collection_nan_fill():
    # the writer passes the top-level ordinate set down; a child leaf
    # without the channel writes NaN (CoordinateSequence::getOrdinate)
    g = parse_wkt("GEOMETRYCOLLECTION (POINT (0 0), POINT Z (1 1 1))")
    assert (
        write_wkt(g)
        == "GEOMETRYCOLLECTION Z (POINT Z (0 0 NaN), POINT Z (1 1 1))"
    )


def test_equals_identical_dimension_sensitive():
    a = parse_wkt("POINT (1 2)")
    az = parse_wkt("POINT Z (1 2 3)")
    az0 = parse_wkt("POINT Z (1 2 0)")
    am = parse_wkt("POINT M (1 2 3)")
    assert not equals_identical(a, az)
    assert not equals_identical(az, am)
    assert not equals_identical(az, az0)
    assert equals_identical(az, parse_wkt("POINT Z (1 2 3)"))
    # NaN == NaN value semantics hold for the Z channel too
    n1 = parse_wkt("POINT Z (1 2 NaN)")
    n2 = parse_wkt("POINT Z (1 2 NaN)")
    assert equals_identical(n1, n2)


def test_xy_wkb_bytes_unchanged():
    # dimension-preserving writer is byte-identical to the XY writer
    # for XY geometries (no oracle-hash drift)
    g = parse_wkt("POLYGON ((0 0, 1 0, 1 1, 0 0))")
    b = write_wkb(g)
    assert len(b) == 1 + 4 + 4 + 4 + 4 * 16
    assert b[1:5] == bytes([3, 0, 0, 0])


def test_ewkb_z_flag_parses():
    import struct

    b = bytes([1]) + struct.pack("<I", 0x80000001) + struct.pack("<3d", 5, 6, 7)
    g = parse_wkb(b)
    assert g.has_z and float(g.zs[0]) == 7


def test_geojson_z_roundtrip():
    # GeoJSONWriter::convertCoordinate (GeoJSONWriter.cpp:327-333):
    # the third element is written only where Z is present and not NaN
    from geos_spark.kernels.geojson import geojson_to_geom, geom_to_geojson

    for w in [
        "POINT Z (1 2 3)",
        "LINESTRING Z (0 0 1, 1 1 2)",
        "POLYGON Z ((0 0 1, 1 0 2, 1 1 3, 0 0 1))",
        "MULTIPOINT Z ((0 0 0), (1 1 1))",
        "MULTIPOLYGON Z (((0 0 1, 1 0 1, 1 1 1, 0 0 1)))",
        "GEOMETRYCOLLECTION Z (POINT Z (0 0 5))",
    ]:
        g2 = geojson_to_geom(geom_to_geojson(parse_wkt(w)))
        assert write_wkt(g2) == w
    # XY stays two-element
    assert (
        geom_to_geojson(parse_wkt("POINT (1 2)"))
        == '{"type":"Point","coordinates":[1.0,2.0]}'
    )


def test_accessors_preserve_zm():
    from geos_spark.kernels.access import (
        exterior_ring,
        interior_ring_n,
        point_n,
    )

    ls = parse_wkt("LINESTRING ZM (0 0 1 10, 1 1 2 20, 2 2 3 30)")
    assert write_wkt(point_n(ls, 1)) == "POINT ZM (1 1 2 20)"
    poly = parse_wkt(
        "POLYGON Z ((0 0 1, 9 0 2, 9 9 3, 0 0 1), "
        "(2 2 4, 3 2 5, 3 3 6, 2 2 4))"
    )
    assert (
        write_wkt(exterior_ring(poly))
        == "LINESTRING Z (0 0 1, 9 0 2, 9 9 3, 0 0 1)"
    )
    assert (
        write_wkt(interior_ring_n(poly, 0))
        == "LINESTRING Z (2 2 4, 3 2 5, 3 3 6, 2 2 4)"
    )


def test_reverse_preserves_zm():
    from geos_spark.kernels.scalars import reverse_geom

    g = reverse_geom(parse_wkt("LINESTRING ZM (0 0 1 10, 1 1 2 20)"))
    assert write_wkt(g) == "LINESTRING ZM (1 1 2 20, 0 0 1 10)"
    g = reverse_geom(
        parse_wkt("POLYGON Z ((0 0 1, 1 0 2, 1 1 3, 0 0 1))")
    )
    assert write_wkt(g) == "POLYGON Z ((0 0 1, 1 1 3, 1 0 2, 0 0 1))"


# ---------------------------------------------------------------- spark side
def test_spark_zm_columns(spark):
    from pyspark.sql import functions as F

    from geos_spark.functions.st import (
        st_astext,
        st_coorddim,
        st_force2d,
        st_force3dz,
        st_geomfromtext,
        st_hasm,
        st_hasz,
        st_m,
        st_makepointzm,
        st_mmax,
        st_z,
        st_zmax,
        st_zmin,
    )

    df = spark.createDataFrame(
        [
            (1, "POINT ZM (1 2 3 4)"),
            (2, "POINT Z (1 2 5)"),
            (3, "POINT M (1 2 6)"),
            (4, "POINT (1 2)"),
            (5, "LINESTRING Z (0 0 1, 1 1 9)"),
            (6, "POINT EMPTY"),
        ],
        "id int, wkt string",
    ).withColumn("g", st_geomfromtext("wkt"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            st_hasz("g").alias("hz"),
            st_hasm("g").alias("hm"),
            st_z("g").alias("z"),
            st_m("g").alias("m"),
            st_coorddim("g").alias("cd"),
            st_zmin("g").alias("zmin"),
            st_zmax("g").alias("zmax"),
            st_mmax("g").alias("mmax"),
            st_astext(st_force2d("g")).alias("flat"),
            st_astext(st_force3dz("g", 7.0)).alias("lifted"),
        ).collect()
    }
    assert out[1]["hz"] and out[1]["hm"] and out[1]["cd"] == 4
    assert out[1]["z"] == 3 and out[1]["m"] == 4
    assert out[2]["z"] == 5 and math.isnan(out[2]["m"])
    assert math.isnan(out[3]["z"]) and out[3]["m"] == 6
    assert out[4]["cd"] == 2 and math.isnan(out[4]["z"])
    assert out[5]["z"] is None  # non-point -> null (reference throws)
    assert out[5]["zmin"] == 1 and out[5]["zmax"] == 9
    assert out[4]["zmin"] is None and out[3]["mmax"] == 6
    assert out[6]["z"] is None  # empty point -> null (reference throws)
    assert out[1]["flat"] == "POINT (1 2)"
    assert out[4]["lifted"] == "POINT Z (1 2 7)"
    assert out[2]["lifted"] == "POINT Z (1 2 5)"  # existing Z preserved

    made = (
        spark.range(1)
        .select(
            st_astext(
                st_makepointzm(
                    F.lit(1.0), F.lit(2.0), F.lit(3.0), F.lit(4.0)
                )
            ).alias("t")
        )
        .first()["t"]
    )
    assert made == "POINT ZM (1 2 3 4)"


def test_spark_zm_parquet_roundtrip(spark, tmp_path):
    # WKB columns with Z survive a parquet write/read (binary fidelity)
    from geos_spark.functions.st import st_astext, st_geomfromtext

    df = spark.createDataFrame(
        [("POINT ZM (1 2 3 4)",), ("LINESTRING Z (0 0 1, 1 1 2)",)],
        "wkt string",
    ).select(st_geomfromtext("wkt").alias("g"), "wkt")
    p = str(tmp_path / "zm.parquet")
    df.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p).select(
        "wkt", st_astext("g").alias("t")
    )
    for r in back.collect():
        assert r["t"] == r["wkt"]
