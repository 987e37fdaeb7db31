"""Voronoi diagram vs the reference CAPI oracle
(tests/unit/capi/GEOSVoronoiDiagramTest.cpp). Cell vertices are
bisector intersections computed by a different (half-plane) method,
so compare as a set with tolerance."""

import pytest

from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.voronoi import voronoi_diagram, voronoi_edges
from geos_spark.kernels.wkt import parse_wkt, write_wkt


def cells_match(got, exp, tol=1e-6):
    gs = [p for p in got.geoms() if p.type_id == 3]
    es = [p for p in exp.geoms() if p.type_id == 3]
    if len(gs) != len(es):
        return False
    used = set()
    for g in gs:
        hit = None
        for i, e in enumerate(es):
            if i in used:
                continue
            if geoms_equal_normalized(g, e, tol):
                hit = i
                break
        if hit is None:
            return False
        used.add(hit)
    return True


def test_single_point_empty():
    d = voronoi_diagram(parse_wkt("POINT (10 20)"))
    assert d.is_empty
    e = voronoi_edges(parse_wkt("POINT (10 20)"))
    assert e.is_empty


def test_four_points():
    g = parse_wkt("MULTIPOINT ((280 300), (420 330), (380 230), (320 160))")
    d = voronoi_diagram(g)
    exp = parse_wkt(
        "GEOMETRYCOLLECTION (POLYGON ((110 175.71428571428572, 110 500, "
        "310.35714285714283 500, 353.515625 298.59375, "
        "306.875 231.96428571428572, 110 175.71428571428572)), "
        "POLYGON ((590 204, 590 -10, 589.1666666666666 -10, "
        "306.875 231.96428571428572, 353.515625 298.59375, 590 204)), "
        "POLYGON ((110 -10, 110 175.71428571428572, "
        "306.875 231.96428571428572, 589.1666666666666 -10, 110 -10)), "
        "POLYGON ((310.35714285714283 500, 590 500, 590 204, "
        "353.515625 298.59375, 310.35714285714283 500)))"
    )
    assert cells_match(d, exp), write_wkt(d)


def test_four_points_edges():
    g = parse_wkt("MULTIPOINT ((280 300), (420 330), (380 230), (320 160))")
    e = voronoi_edges(g)
    exp = parse_wkt(
        "MULTILINESTRING ((310.3571428571428 500, 353.515625 298.59375), "
        "(353.515625 298.59375, 306.875 231.9642857142857), "
        "(306.875 231.9642857142857, 110 175.7142857142857), "
        "(589.1666666666666 -10, 306.875 231.9642857142857), "
        "(353.515625 298.59375, 590 204))"
    )
    gs = sorted(
        tuple(sorted(((round(p.data[0][0], 4), round(p.data[0][1], 4)),
                      (round(p.data[-1][0], 4), round(p.data[-1][1], 4)))))
        for p in e.geoms()
    )
    es = sorted(
        tuple(sorted(((round(p.data[0][0], 4), round(p.data[0][1], 4)),
                      (round(p.data[-1][0], 4), round(p.data[-1][1], 4)))))
        for p in exp.geoms()
    )
    assert gs == es, gs


def test_cells_contain_sites():
    """GEOS ordered-diagram invariant: each site lies in one cell."""
    from geos_spark.kernels.pip import EXTERIOR
    from geos_spark.kernels.relate import _locate_in_polys
    import numpy as np

    g = parse_wkt(
        "MULTIPOINT ((170 270), (270 270), (230 310), (180 330), "
        "(250 340), (315 318), (330 260), (240 170), (220 220), (270 220))"
    )
    d = voronoi_diagram(g)
    polys = [p for p in d.geoms() if p.type_id == 3]
    assert len(polys) == 10
    sites = g.all_coords()
    for s in sites:
        loc = _locate_in_polys(np.array([s]), polys)
        assert int(loc[0]) != int(EXTERIOR)
