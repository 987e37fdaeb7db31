"""Indexed facet distance vs brute force
(IndexedFacetDistance.cpp:32-57 semantics: exact result, indexed
search)."""

import time

import numpy as np
import pytest

from geos_spark.kernels import geom as G
from geos_spark.kernels.facetdist import facet_min_dist, facets_of
from geos_spark.kernels.scalars import geom_distance
from geos_spark.kernels.wkt import parse_wkt


def _brute(sa, sb):
    from geos_spark.kernels.facetdist import _leaf_dist

    return _leaf_dist(sa, sb) if len(sa) < 2000 else None


def _rand_line(rng, n, cx, cy, r):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = r * (0.8 + 0.2 * rng.random(n))
    return np.column_stack(
        [cx + rad * np.cos(ang), cy + rad * np.sin(ang)]
    )


def test_facet_dist_matches_brute_random():
    rng = np.random.default_rng(7)
    for trial in range(20):
        a = G.Geom.linestring(_rand_line(rng, 60, 0, 0, 10))
        b = G.Geom.linestring(
            _rand_line(rng, 60, 25 + trial, trial - 10, 8)
        )
        fa, fb = facets_of(a), facets_of(b)
        got = facet_min_dist(fa, fb)
        want = _brute(fa, fb)
        assert got == pytest.approx(want, abs=1e-12), trial


def test_facet_dist_intersecting_is_zero():
    a = parse_wkt("LINESTRING (0 0, 10 10)")
    b = parse_wkt("LINESTRING (0 10, 10 0)")
    assert facet_min_dist(facets_of(a), facets_of(b)) == 0.0


def test_geom_distance_indexed_path_equals_brute():
    # big enough to trip the indexed threshold, ring shapes
    rng = np.random.default_rng(3)
    a = G.Geom.linestring(_rand_line(rng, 1500, 0, 0, 100))
    b = G.Geom.linestring(_rand_line(rng, 1500, 350, 50, 100))
    d_idx = geom_distance(a, b)  # 1500*3000 > threshold -> indexed
    d_leaf = _brute(facets_of(a)[:1999], facets_of(b))
    # brute over full facet sets
    from geos_spark.kernels.facetdist import _leaf_dist

    d_brute = _leaf_dist(facets_of(a), facets_of(b))
    assert d_idx == pytest.approx(d_brute, abs=1e-12)


def test_indexed_subquadratic_speed():
    rng = np.random.default_rng(5)
    a = facets_of(G.Geom.linestring(_rand_line(rng, 20000, 0, 0, 100)))
    b = facets_of(
        G.Geom.linestring(_rand_line(rng, 20000, 260, 0, 100))
    )
    t0 = time.time()
    d = facet_min_dist(a, b)
    dt = time.time() - t0
    assert d > 0
    # brute would touch 4e8 pairs; the indexed search must finish
    # orders of magnitude faster
    assert dt < 2.0, dt


def test_points_only_facets():
    a = parse_wkt("MULTIPOINT ((0 0), (1 1))")
    b = parse_wkt("MULTIPOINT ((4 5), (9 9))")
    assert facet_min_dist(facets_of(a), facets_of(b)) == pytest.approx(5.0)
