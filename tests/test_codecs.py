"""WKT/WKB codec tests, including roundtrips over the reference's own
xmltester corpus geometries (every <a>/<b> WKT in the general suite
must parse and survive WKT->WKB->WKT)."""

import glob
import re

import numpy as np
import pytest

from geos_spark.kernels import geom as G
from geos_spark.kernels.wkb import (
    decode_points,
    decode_polygons,
    encode_points,
    parse_wkb,
    write_wkb,
)
from geos_spark.kernels.wkt import parse_wkt, write_wkt

ROUNDTRIP = [
    "POINT (1 2)",
    "POINT EMPTY",
    "LINESTRING (0 0, 1 1, 2 0)",
    "LINESTRING EMPTY",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
    "POLYGON EMPTY",
    "MULTIPOINT ((1 1), (2 2))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", ROUNDTRIP)
def test_roundtrip(wkt):
    g = parse_wkt(wkt)
    g2 = parse_wkb(write_wkb(g))
    assert write_wkt(g2) == wkt


def test_wkb_big_endian_and_flags():
    import struct

    # XDR (big-endian) point with ISO Z type (1001), Z dropped
    buf = b"\x00" + struct.pack(">I", 1001) + struct.pack(">ddd", 1, 2, 3)
    g = parse_wkb(buf)
    assert g.type_id == G.POINT and g.data[0, 0] == 1 and g.data[0, 1] == 2

    # EWKB: Z flag + SRID flag
    buf = (
        b"\x01"
        + struct.pack("<I", 0x80000000 | 0x20000000 | 1)
        + struct.pack("<i", 4326)
        + struct.pack("<ddd", 7, 8, 9)
    )
    g = parse_wkb(buf)
    assert g.srid == 4326 and g.data[0, 0] == 7


def test_point_batch_roundtrip():
    rs = np.random.RandomState(0)
    x = rs.uniform(-180, 180, 1000)
    y = rs.uniform(-90, 90, 1000)
    pts = decode_points(encode_points(x, y))
    assert np.array_equal(pts, np.stack([x, y], axis=1))


def test_decode_polygons_pack():
    wkbs = [
        write_wkb(parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")),
        write_wkb(
            parse_wkt(
                "MULTIPOLYGON (((10 10, 12 10, 12 12, 10 10)),"
                " ((20 20, 22 20, 22 22, 20 20)))"
            )
        ),
    ]
    pack, offs = decode_polygons(wkbs)
    assert pack.n_polys == 3
    assert list(offs) == [0, 1, 3]
    assert pack.bbox[0].tolist() == [0, 0, 4, 4]


def _xml_wkts():
    wkts = []
    for f in sorted(
        glob.glob("/root/reference/tests/xmltester/tests/general/TestRelate*.xml")
    ):
        txt = open(f, encoding="utf-8", errors="replace").read()
        for m in re.finditer(r"<([ab])>\s*([^<]+?)\s*</\1>", txt, re.S):
            wkts.append(m.group(2).strip())
    return wkts


def test_xmltester_corpus_roundtrip():
    wkts = _xml_wkts()
    assert len(wkts) > 100
    for w in wkts:
        g = parse_wkt(w)
        g2 = parse_wkb(write_wkb(g))
        assert np.allclose(
            g.all_coords(), g2.all_coords(), rtol=0, atol=0
        ), w
