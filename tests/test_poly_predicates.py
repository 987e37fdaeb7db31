"""Vectorized poly-poly predicate fast paths vs the full relate
kernel (reference semantics: IntersectionMatrix.cpp:279-284,
PreparedPolygonContains.cpp shortcuts)."""

import itertools

import numpy as np
import pytest

from geos_spark.kernels import relate as R
from geos_spark.kernels.xmltester import parse_geom_text
from geos_spark.operators.spatial_join import (
    _areal_summary,
    _polys_overlaps_fast,
    _polys_superset_fast,
    _polys_touches_fast,
)


def _corpus_areal_pairs():
    from geos_spark.fixtures import predicate_cases, validate_cases

    seen = set()
    for c in itertools.chain(predicate_cases(), validate_cases()):
        key = (c.wkt_a, c.wkt_b)
        if not c.wkt_b or key in seen:
            continue
        seen.add(key)
        try:
            ga, gb = parse_geom_text(c.wkt_a), parse_geom_text(c.wkt_b)
        except Exception:  # noqa: BLE001
            continue
        if _areal_summary(ga, gb) is not None:
            yield ga, gb


def test_fast_paths_match_full_relate_on_corpus():
    n = 0
    for ga, gb in _corpus_areal_pairs():
        n += 1
        assert bool(_polys_superset_fast(ga, gb, R.contains)) == bool(
            R.contains(ga, gb)
        )
        assert bool(_polys_superset_fast(ga, gb, R.covers)) == bool(
            R.covers(ga, gb)
        )
        assert bool(
            _polys_superset_fast(gb, ga, lambda x, y: R.within(y, x))
        ) == bool(R.within(ga, gb))
        assert bool(_polys_touches_fast(ga, gb)) == bool(R.touches(ga, gb))
        assert bool(_polys_overlaps_fast(ga, gb)) == bool(
            R.overlaps(ga, gb)
        )
    assert n > 100  # the corpus must actually exercise the path


def test_hole_poke_breaks_containment_without_boundary_contact():
    a = parse_geom_text(
        "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0),"
        " (40 40, 60 40, 60 60, 40 60, 40 40))"
    )
    b = parse_geom_text("POLYGON ((20 20, 80 20, 80 80, 20 80, 20 20))")
    assert _polys_superset_fast(a, b, R.contains) is False
    assert _polys_overlaps_fast(a, b) is True
    # and a hole-avoiding B IS contained
    b2 = parse_geom_text("POLYGON ((5 5, 30 5, 30 30, 5 30, 5 5))")
    assert _polys_superset_fast(a, b2, R.contains) is True


def test_poly_contains_data_has_no_touch_only_pairs():
    """The poly_contains DuckDB oracle decides containment from
    strict crossing parity, which is only valid if no candidate pair
    has touch-only boundary contact — assert that invariant on the
    generated star/shrunk-star data."""
    from geos_spark.kernels import geom as G
    from geos_spark.sources.pages import star_vertices

    def star(p):
        return G.Geom(G.POLYGON, [star_vertices(p)])

    def shrunk(p, dx, dy):
        v = star_vertices(p)
        cx = (p % 16) * 256 + 128
        cy = (p // 16) * 256 + 128
        s = np.column_stack(
            [(v[:, 0] - cx) / 2 + cx + dx, (v[:, 1] - cy) / 2 + cy + dy]
        )
        return G.Geom(G.POLYGON, [s])

    checked = 0
    for p in range(0, 256):
        for q_off, (dx, dy) in itertools.product(
            (-17, -16, -15, -1, 0, 1, 15, 16, 17),
            ((3.0, 2.0), (55.0, 15.0)),
        ):
            q = p + q_off
            if not 0 <= q < 256:
                continue
            ga, gb = star(p), shrunk(q, dx, dy)
            s = _areal_summary(ga, gb)
            assert s is not None
            _, _, any_int, any_proper = s
            if any_int:
                checked += 1
                assert any_proper, (p, q, dx, dy)
    assert checked > 0
