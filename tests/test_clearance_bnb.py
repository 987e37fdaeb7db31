"""Indexed (branch-and-bound) minimum clearance vs brute force."""

import numpy as np
import pytest

from geos_spark.kernels import geom as G
from geos_spark.kernels.clearance import (
    _bnb_clearance,
    _vertices_and_segments,
    min_clearance,
)


def _ring(rng, n, cx, cy, r):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = r * (0.85 + 0.15 * rng.random(n))
    pts = np.column_stack(
        [cx + rad * np.cos(ang), cy + rad * np.sin(ang)]
    )
    return np.vstack([pts, pts[:1]])


def test_bnb_matches_brute_random():
    rng = np.random.default_rng(11)
    for trial in range(15):
        g = G.Geom(
            G.MULTIPOLYGON,
            [
                G.Geom(G.POLYGON, [_ring(rng, 40, 0, 0, 50)]),
                G.Geom(
                    G.POLYGON,
                    [_ring(rng, 40, 120 + trial, 10, 50)],
                ),
            ],
        )
        d_brute, line_brute = min_clearance(g)  # small -> brute path
        v, s = _vertices_and_segments(g)
        r = _bnb_clearance(v, s)
        assert r is not None
        assert r[0] == pytest.approx(d_brute, abs=1e-12), trial


def test_bnb_subquadratic_speed():
    import time

    rng = np.random.default_rng(4)
    g = G.Geom(G.POLYGON, [_ring(rng, 30000, 0, 0, 1000)])
    v, s = _vertices_and_segments(g)
    t0 = time.time()
    r = _bnb_clearance(v, s)
    dt = time.time() - t0
    assert r is not None and r[0] > 0
    assert dt < 5.0, dt  # brute would touch 9e8 pairs


def test_min_clearance_indexed_path():
    """Above the pair threshold min_clearance routes to the B&B and
    must agree with a direct brute evaluation."""
    rng = np.random.default_rng(9)
    g = G.Geom(G.POLYGON, [_ring(rng, 2500, 0, 0, 1000)])
    d_idx, line = min_clearance(g)  # 2500*5000 > 4M -> indexed
    v, s = _vertices_and_segments(g)
    # brute reference computed manually (vector loop)
    best = np.inf
    for i in range(len(v)):
        dx = v[:, 0] - v[i, 0]
        dy = v[:, 1] - v[i, 1]
        d = np.hypot(dx, dy)
        d[d == 0] = np.inf
        best = min(best, d.min())
        x1, y1, x2, y2 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
        ddx, ddy = x2 - x1, y2 - y1
        l2 = ddx * ddx + ddy * ddy
        t = np.clip(
            ((v[i, 0] - x1) * ddx + (v[i, 1] - y1) * ddy) / l2, 0, 1
        )
        cx, cy = x1 + t * ddx, y1 + t * ddy
        dd = np.hypot(v[i, 0] - cx, v[i, 1] - cy)
        endp = ((x1 == v[i, 0]) & (y1 == v[i, 1])) | (
            (x2 == v[i, 0]) & (y2 == v[i, 1])
        )
        dd[endp | (dd == 0)] = np.inf
        best = min(best, dd.min())
    assert d_idx == pytest.approx(best, abs=1e-12)
    assert not line.is_empty
