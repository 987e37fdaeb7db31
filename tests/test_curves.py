"""Curved geometry types (SQL/MM): CircularString, CompoundCurve,
CurvePolygon, MultiCurve, MultiSurface.

Oracle expectations ported from the reference's own unit suites:
- tests/unit/geom/CircularStringTest.cpp (length 2*pi, envelope)
- tests/unit/geom/CurvePolygonTest.cpp (area/length/envelope/counts)
- tests/unit/io/WKTWriterTest.cpp:607-745 (canonical curve WKT)
- tests/unit/io/WKBWriterTest.cpp:396-485 (canonical NDR ISO hex,
  including EWKB-SRID reader tolerance)

Operations the reference declares unsupported on curves (relate,
overlay, centroid, normalize — RelateNG.cpp:325-326,
CurvePolygon.cpp:46-54) surface as per-row NULLs through the Spark
API, never failed tasks.
"""

import math

import numpy as np
import pytest

from geos_spark.kernels import geom as G
from geos_spark.kernels import scalars as S
from geos_spark.kernels.wkb import parse_wkb, write_wkb
from geos_spark.kernels.wkt import parse_wkt, write_wkt

# ----------------------------------------------------------------- WKT

# canonical writer output (WKTWriterTest.cpp:607-745 + the XY rows of
# the empty-member matrices at :424-474)
WKT_CANONICAL = [
    "CIRCULARSTRING (0 0, 1 1, 2 0)",
    "CIRCULARSTRING EMPTY",
    "COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 2 2))",
    "COMPOUNDCURVE EMPTY",
    "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0, 2 0, 2 1, 2 3, "
    "4 3), (4 3, 4 5, 1 4, 0 0)), CIRCULARSTRING (1.7 1, 1.4 0.4, "
    "1.6 0.4, 1.6 0.5, 1.7 1))",
    "CURVEPOLYGON EMPTY",
    "MULTICURVE (COMPOUNDCURVE (CIRCULARSTRING (0 0, 2 0, 2 1, 2 3, "
    "4 3), (4 3, 4 5, 1 4, 0 0)), (8 9, 10 11), CIRCULARSTRING "
    "(1.7 1, 1.4 0.4, 1.6 0.4, 1.6 0.5, 1.7 1))",
    "MULTICURVE EMPTY",
    "MULTICURVE (EMPTY)",
    "MULTICURVE (CIRCULARSTRING EMPTY)",
    "MULTICURVE (EMPTY, CIRCULARSTRING EMPTY)",
    "MULTISURFACE (((0 0, 1 0, 1 1, 0 1, 0 0)), CURVEPOLYGON "
    "(CIRCULARSTRING (10 10, 11 11, 12 10, 11 9, 10 10)))",
    "MULTISURFACE EMPTY",
    "MULTISURFACE (EMPTY)",
    "MULTISURFACE (EMPTY, EMPTY)",
    "MULTISURFACE (CURVEPOLYGON EMPTY)",
]


@pytest.mark.parametrize("wkt", WKT_CANONICAL)
def test_wkt_roundtrip_canonical(wkt):
    assert write_wkt(parse_wkt(wkt)) == wkt


def test_wkt_reader_tolerance():
    # whitespace-free and mixed-case forms parse to the same geometry
    a = parse_wkt(
        "CURVEPOLYGON( COMPOUNDCURVE( CIRCULARSTRING(0 0,2 0, 2 1, "
        "2 3, 4 3), (4 3, 4 5, 1 4, 0 0)), CIRCULARSTRING(1.7 1, "
        "1.4 0.4, 1.6 0.4, 1.6 0.5, 1.7 1) )"
    )
    b = parse_wkt(
        "curvepolygon (compoundcurve (circularstring (0 0, 2 0, 2 1, "
        "2 3, 4 3), (4 3, 4 5, 1 4, 0 0)), circularstring (1.7 1, "
        "1.4 0.4, 1.6 0.4, 1.6 0.5, 1.7 1))"
    )
    assert S.equals_identical(a, b)
    # Z/M ordinates are preserved through the writer (outputDimension 4,
    # the reference WKTWriter default since 3.12)
    z = parse_wkt("CIRCULARSTRING Z (0 0 5, 1 1 5, 2 0 5)")
    assert write_wkt(z) == "CIRCULARSTRING Z (0 0 5, 1 1 5, 2 0 5)"
    assert z.has_z and not z.has_m


def test_wkt_member_type_errors():
    with pytest.raises(Exception):
        parse_wkt("MULTICURVE (POINT (0 0))")
    with pytest.raises(Exception):
        parse_wkt("MULTISURFACE (CIRCULARSTRING (0 0, 1 1, 2 0))")
    with pytest.raises(Exception):
        parse_wkt("COMPOUNDCURVE (COMPOUNDCURVE ((0 0, 1 1)))")


# ----------------------------------------------------------------- WKB


def _reference_wkb_cases():
    """(wkt, canonical NDR ISO hex) pairs lifted verbatim from the
    reference's writer suite (WKBWriterTest.cpp checkHexOutput)."""
    import re

    src = open(
        "/root/reference/tests/unit/io/WKBWriterTest.cpp"
    ).read()
    pat = re.compile(
        r'checkHexOutput\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*'
        r'"([0-9A-Fa-f]+)"\s*\)'
    )
    tags = (
        "CIRCULARSTRING", "COMPOUNDCURVE", "CURVEPOLYGON",
        "MULTICURVE", "MULTISURFACE",
    )
    out = [
        (wkt, hx)
        for wkt, hx in pat.findall(src)
        if any(t in wkt for t in tags)
    ]
    assert len(out) >= 10, "reference curve WKB corpus not found"
    return out


@pytest.mark.parametrize(
    "wkt,hexwkb",
    _reference_wkb_cases(),
    ids=[w[:28] for w, _ in _reference_wkb_cases()],
)
def test_wkb_canonical_hex(wkt, hexwkb):
    got = write_wkb(parse_wkt(wkt)).hex().upper()
    assert got == hexwkb.upper()
    # reader round-trip of the reference bytes
    g = parse_wkb(bytes.fromhex(hexwkb))
    assert write_wkt(g) == write_wkt(parse_wkt(wkt))


# ------------------------------------------------------------ measures

CS5 = "CIRCULARSTRING (0 0, 1 1, 2 0, 3 -1, 4 0)"
CP = (
    "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0, 2 0, 2 1, 2 3, "
    "4 3), (4 3, 4 5, 1 4, 0 0)), CIRCULARSTRING (1.7 1, 1.4 0.4, "
    "1.6 0.4, 1.6 0.5, 1.7 1))"
)


def test_circularstring_measures():
    # CircularStringTest.cpp:70-101
    g = parse_wkt(CS5)
    assert S.geometry_type_name(g) == "CircularString"
    assert S.geom_area(g) == 0.0
    assert abs(S.geom_length(g) - 2 * math.pi) < 1e-14
    assert S.geom_num_geometries(g) == 1
    assert S.geom_num_points(g) == 5
    assert g.envelope() == (0.0, -1.0, 4.0, 1.0)
    assert g.dimension() == 1
    assert not g.is_empty and not S.curve_is_closed(g)
    # closed circle: two half-turns; the reference's envelope for a
    # p0==p2 circle never expands past the control points (its center
    # is mid(p0, p1), so every orientation test in
    # CircularArcs::expandEnvelope degenerates to collinear) — mirror
    circle = parse_wkt("CIRCULARSTRING (0 0, 2 0, 0 0)")
    assert abs(S.geom_length(circle) - 2 * math.pi) < 1e-14
    assert S.curve_is_closed(circle)
    assert circle.envelope() == (0.0, 0.0, 2.0, 0.0)


def test_circularstring_empty():
    # CircularStringTest.cpp:44-61
    g = parse_wkt("CIRCULARSTRING EMPTY")
    assert g.is_empty
    assert S.geom_num_points(g) == 0
    assert S.geom_area(g) == 0.0 and S.geom_length(g) == 0.0


def test_curvepolygon_measures():
    # CurvePolygonTest.cpp:84-130 (area value cross-checked by the
    # reference against PostGIS ST_CurveToLine at 1e-13)
    g = parse_wkt(CP)
    assert S.geometry_type_name(g) == "CurvePolygon"
    assert abs(S.geom_area(g) - 9.0526564962674) < 1e-8
    assert abs(S.geom_length(g) - 19.236489581872586) < 1e-8
    assert S.geom_num_geometries(g) == 1
    assert S.geom_num_points(g) == 14
    env = g.envelope()
    assert env[0] == 0.0 and env[2] == 4.0 and env[3] == 5.0
    assert abs(env[1] - -0.618033988749895) < 1e-14
    assert g.dimension() == 2


def test_curvepolygon_empty():
    g = parse_wkt("CURVEPOLYGON EMPTY")
    assert g.is_empty
    assert S.geom_area(g) == 0.0 and S.geom_length(g) == 0.0
    assert S.geom_num_points(g) == 0


def test_multi_measures():
    mc = parse_wkt(
        "MULTICURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 2 2))"
    )
    assert S.geometry_type_name(mc) == "MultiCurve"
    assert S.geom_num_geometries(mc) == 2
    assert abs(S.geom_length(mc) - (math.pi + 2.0)) < 1e-14
    assert not S.curve_is_closed(mc)
    ms = parse_wkt(
        "MULTISURFACE (((0 0, 1 0, 1 1, 0 1, 0 0)), CURVEPOLYGON "
        "(CIRCULARSTRING (10 10, 11 11, 12 10, 11 9, 10 10)))"
    )
    assert S.geometry_type_name(ms) == "MultiSurface"
    # unit square + circle of radius 1
    assert abs(S.geom_area(ms) - (1.0 + math.pi)) < 1e-12
    assert ms.envelope() == (0.0, 0.0, 12.0, 11.0)


def test_semicircle_closed_form():
    # exact semicircle: length pi*r, enclosed area pi*r^2/2 (up to the
    # reference's own sin(theta) formulation), arc-aware envelope
    r = 3.0
    ring = parse_wkt(
        "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING "
        "(0 0, 3 3, 6 0), (6 0, 0 0)))"
    )
    want_area = r * r / 2.0 * (math.pi - math.sin(math.pi))
    assert abs(S.geom_area(ring) - want_area) < 1e-12
    assert abs(S.geom_length(ring) - (math.pi * r + 2 * r)) < 1e-12
    assert ring.envelope() == (0.0, 0.0, 6.0, 3.0)


def test_collinear_arc_degrades_to_chord():
    g = parse_wkt("CIRCULARSTRING (0 0, 1 1, 2 2)")
    assert S.geom_length(g) == math.hypot(2, 2)
    assert g.envelope() == (0.0, 0.0, 2.0, 2.0)


def test_reverse_and_identity():
    cc = parse_wkt(
        "COMPOUNDCURVE ((0 0, 1 1), CIRCULARSTRING (1 1, 2 0, 3 1))"
    )
    rev = S.reverse_geom(cc)
    assert (
        write_wkt(rev)
        == "COMPOUNDCURVE (CIRCULARSTRING (3 1, 2 0, 1 1), (1 1, 0 0))"
    )
    assert S.equals_identical(cc, S.reverse_geom(rev))
    assert not S.equals_identical(cc, rev)
    g = parse_wkt(CP)
    assert S.equals_identical(g, parse_wkb(write_wkb(g)))


def test_unclosed_curvepolygon_ring_raises():
    # Area::ofClosedCurve throws on an unclosed ring (Area.cpp:102-104)
    bad = parse_wkt("CURVEPOLYGON (CIRCULARSTRING (0 0, 1 1, 2 0))")
    with pytest.raises(ValueError):
        S.geom_area(bad)


def test_unsupported_ops_reject_curves():
    from geos_spark.kernels.overlay import INTERSECTION, overlay
    from geos_spark.kernels.relate import relate

    a = parse_wkt("CIRCULARSTRING (0 0, 1 1, 2 0)")
    with pytest.raises(ValueError):
        relate(a, a)
    with pytest.raises(ValueError):
        overlay(a, a, INTERSECTION)
    with pytest.raises(ValueError):
        G.canonical(a)


def test_envelope_quadrant_walk():
    # minor arc crossing one axis extreme: from 45deg to 135deg CCW
    # around center (0,0) radius sqrt(2) -> top point (0, sqrt(2))
    s2 = math.sqrt(2.0)
    g = parse_wkt(f"CIRCULARSTRING (1 1, 0 {s2!r}, -1 1)")
    env = g.envelope()
    assert env == (-1.0, 1.0, 1.0, s2)
    # major arc the other way sweeps left, bottom and right extremes
    g2 = parse_wkt(f"CIRCULARSTRING (1 1, 0 {-s2!r}, -1 1)")
    env2 = g2.envelope()
    assert env2 == (-s2, -s2, s2, 1.0)


# --------------------------------------------------------- spark level


def test_spark_curve_surface(spark):
    from pyspark.sql import functions as F

    from geos_spark.functions import st

    rows = [
        ("CIRCULARSTRING (0 0, 1 1, 2 0)",),
        (CP,),
        ("MULTICURVE ((0 0, 5 5), CIRCULARSTRING (4 0, 4 4, 8 4))",),
        ("CURVEPOLYGON EMPTY",),
        (None,),
    ]
    df = spark.createDataFrame(rows, ["wkt"])
    wkb = st.st_geomfromtext("wkt")
    out = df.select(
        st.st_astext(wkb).alias("txt"),
        st.st_geometrytype(wkb).alias("typ"),
        st.st_length(wkb).alias("len"),
        st.st_area(wkb).alias("area"),
        st.st_numpoints(wkb).alias("np"),
        st.st_isempty(wkb).alias("emp"),
        st.st_hascurve(wkb).alias("crv"),
        # unsupported on curves -> NULL, not a failed task
        st.st_centroid_x(wkb).alias("cx"),
        st.st_overlay("intersection")(wkb, wkb).alias("ovl"),
        st.st_envelope_struct(wkb).alias("env"),
    ).collect()
    r0, r1, r2, r3, r4 = out
    assert r0.txt == rows[0][0] and r0.typ == "CircularString"
    assert abs(r0.len - math.pi) < 1e-12 and r0.area == 0.0
    assert r0.np == 3 and r0.emp is False and r0.crv is True
    assert r0.cx is None and r0.ovl is None
    assert abs(r1.area - 9.0526564962674) < 1e-8
    assert r1.typ == "CurvePolygon"
    assert abs(r1.env.ymin - -0.618033988749895) < 1e-12
    assert r2.typ == "MultiCurve" and r2.np == 5
    assert r3.emp is True and r3.area == 0.0
    assert r4.txt is None and r4.typ is None and r4.len is None

    # non-curved rows keep full support in the same batch
    mixed = spark.createDataFrame(
        [("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",), (CP,)], ["wkt"]
    )
    w = st.st_geomfromtext("wkt")
    got = mixed.select(
        st.st_centroid_x(w).alias("cx"), st.st_area(w).alias("a")
    ).collect()
    assert got[0].cx == 1.0 and got[0].a == 4.0
    assert got[1].cx is None and got[1].a is not None
