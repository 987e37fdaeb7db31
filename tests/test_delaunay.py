"""Delaunay triangulation properties + reference unit oracles
(tests/unit/triangulate/DelaunayTest.cpp semantics: triangle set is
unique for inputs in general position)."""

import numpy as np
import pytest

from geos_spark.kernels.delaunay import (
    _incircle,
    delaunay,
    delaunay_edges,
    delaunay_triangulation,
)
from geos_spark.kernels.wkt import parse_wkt, write_wkt


def test_square():
    tris, pts = delaunay(np.array([[0, 0], [10, 0], [10, 10], [0, 10]]))
    assert len(tris) == 2


def test_grid_count():
    g = np.array(
        [[i, j] for i in range(10) for j in range(10)], dtype=float
    )
    tris, pts = delaunay(g)
    assert len(tris) == 162  # 2*(n-1)^2 for a grid


def test_delaunay_property_random():
    rng = np.random.RandomState(11)
    p = rng.uniform(0, 100, (120, 2))
    tris, pts = delaunay(p)
    # Euler: T = 2n - 2 - h (h = hull size)
    for (i, j, k) in tris:
        for q in range(len(pts)):
            if q in (i, j, k):
                continue
            assert (
                _incircle(
                    pts[i, 0], pts[i, 1], pts[j, 0], pts[j, 1],
                    pts[k, 0], pts[k, 1], pts[q, 0], pts[q, 1],
                )
                <= 0
            )


def test_triangulation_geom():
    g = parse_wkt("MULTIPOINT ((0 0), (10 0), (10 10), (0 10), (5 5))")
    tri = delaunay_triangulation(g)
    assert tri.type_id == 7  # GEOMETRYCOLLECTION
    assert len(tri.data) == 4
    edges = delaunay_edges(g)
    assert len(edges.data) == 8  # 4 hull + 4 spokes


def test_collinear_degenerate():
    tris, _ = delaunay(np.array([[0, 0], [5, 5], [10, 10]], dtype=float))
    assert tris == []
