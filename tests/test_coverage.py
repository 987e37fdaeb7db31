"""coverageUnion vs the reference unit oracles
(tests/unit/operation/overlayng/CoverageUnionNGTest.cpp)."""

import pytest

from geos_spark.kernels.coverage import coverage_union
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import parse_wkt, write_wkt

CASES = [
    ("MULTIPOLYGON (((100 200, 200 200, 200 100, 100 100, 100 200), "
     "(120 180, 180 180, 180 120, 120 120, 120 180)), "
     "((180 120, 120 120, 120 180, 180 180, 180 120)))",
     "POLYGON ((200 200, 200 100, 100 100, 100 200, 200 200))"),
    ("MULTIPOLYGON (((1 4, 3 4, 3 2, 1 2, 1 4)), "
     "((5 4, 5 2, 3 2, 3 4, 5 4)), ((7 4, 7 2, 5 2, 5 4, 7 4)))",
     "POLYGON ((3 4, 5 4, 7 4, 7 2, 5 2, 3 2, 1 2, 1 4, 3 4))"),
    ("MULTIPOLYGON (((5 5, 1 5, 5 1, 5 5)), ((5 9, 1 5, 5 5, 5 9)), "
     "((9 5, 5 5, 5 9, 9 5)), ((9 5, 5 1, 5 5, 9 5)))",
     "POLYGON ((1 5, 5 9, 9 5, 5 1, 1 5))"),
    ("MULTIPOLYGON (((1 9, 9 9, 9 1, 1 1, 1 9), "
     "(2 8, 8 8, 8 2, 2 2, 2 8)), ((3 7, 7 7, 7 3, 3 3, 3 7), "
     "(4 6, 6 6, 6 4, 4 4, 4 6)))",
     "MULTIPOLYGON (((9 1, 1 1, 1 9, 9 9, 9 1), "
     "(8 8, 2 8, 2 2, 8 2, 8 8)), ((7 7, 7 3, 3 3, 3 7, 7 7), "
     "(4 4, 6 4, 6 6, 4 6, 4 4)))"),
]


@pytest.mark.parametrize("wkt,exp", CASES)
def test_coverage_union(wkt, exp):
    got = coverage_union(parse_wkt(wkt))
    assert geoms_equal_normalized(got, parse_wkt(exp), 0.0), write_wkt(got)


def test_tile_fragments_reunite():
    """Fragments of one geometry clipped to a tile grid form a valid
    coverage; their coverage union must reproduce the original."""
    from geos_spark.kernels.clip import clip_geom
    from geos_spark.kernels import geom as G
    from geos_spark.kernels.scalars import geom_area

    star = parse_wkt(
        "POLYGON ((96 0, 24 24, 0 96, -24 24, -96 0, -24 -24, 0 -96, "
        "24 -24, 96 0))"
    )
    frags = []
    for gx in range(-2, 2):
        for gy in range(-2, 2):
            f = clip_geom(star, gx * 64.0, gy * 64.0,
                          (gx + 1) * 64.0, (gy + 1) * 64.0)
            if not f.is_empty:
                frags.extend(
                    p for p in f.geoms()
                    if p.type_id == G.POLYGON and p.data
                )
    u = coverage_union(G.Geom.collection(G.GEOMETRYCOLLECTION, frags))
    assert geom_area(u) == pytest.approx(geom_area(star), rel=1e-12)
