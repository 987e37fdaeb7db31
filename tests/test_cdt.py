"""Constrained Delaunay substrate (kernels/cdt.py).

Validates the CDT invariants directly: empty-circumcircle property on
every interior non-constrained edge, exact area preservation, CCW
orientation — on inputs large enough to need thousands of Lawson
flips (the former one-flip-per-round/200-round cap silently returned
non-Delaunay results there) and on degenerate-collinear rings (the
former mark() allocated fresh point ids after the vertex array froze,
losing boundary constraints).
"""

import math

import numpy as np
import pytest

from geos_spark.kernels.cdt import constrained_delaunay_polygon
from geos_spark.kernels.delaunay import _incircle, _orient


def _tri_area2(pts, t):
    (ax, ay), (bx, by), (cx, cy) = pts[t[0]], pts[t[1]], pts[t[2]]
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _ring_area2(r):
    s = 0.0
    for i in range(len(r) - 1):
        s += r[i][0] * r[i + 1][1] - r[i + 1][0] * r[i][1]
    return s


def _assert_cdt_invariants(pts, tris, shell, holes):
    # all CCW, none degenerate
    for t in tris:
        assert _tri_area2(pts, t) > 0
    # exact area preservation (shell minus holes)
    want = abs(_ring_area2(shell))
    for h in holes:
        want -= abs(_ring_area2(h))
    got = sum(_tri_area2(pts, t) for t in tris)
    assert got == pytest.approx(want, rel=1e-9)
    # empty-circumcircle on interior edges: rebuild the edge map and
    # check every 2-user edge is locally Delaunay or constrained
    marked = set()
    for ring in [shell] + list(holes):
        ids = []
        for p in ring[:-1]:
            k = (float(p[0]), float(p[1]))
            for i, q in enumerate(pts):
                if (q[0], q[1]) == k:
                    ids.append(i)
                    break
        m = len(ids)
        for i in range(m):
            a, b = ids[i], ids[(i + 1) % m]
            if a != b:
                marked.add((min(a, b), max(a, b)))
    em = {}
    for ti, (a, b, c) in enumerate(tris):
        for u, v, w in ((a, b, c), (b, c, a), (c, a, b)):
            em.setdefault((min(u, v), max(u, v)), []).append(w)
    bad = 0
    for (u, v), ws in em.items():
        if len(ws) != 2 or (u, v) in marked:
            continue
        w1, w2 = ws
        a, b, c, d = pts[u], pts[v], pts[w1], pts[w2]
        if _orient(a[0], a[1], b[0], b[1], c[0], c[1]) < 0:
            a, b = b, a
        # flip quad must be convex for the condition to apply
        o1 = _orient(pts[w1][0], pts[w1][1], pts[w2][0], pts[w2][1],
                     pts[u][0], pts[u][1])
        o2 = _orient(pts[w1][0], pts[w1][1], pts[w2][0], pts[w2][1],
                     pts[v][0], pts[v][1])
        if o1 == 0 or o2 == 0 or o1 == o2:
            continue
        if _incircle(a[0], a[1], b[0], b[1], c[0], c[1], d[0], d[1]) > 0:
            bad += 1
    assert bad == 0


def test_cdt_large_star_needs_many_flips():
    """400-vertex radially-perturbed star: ear clipping starts far
    from Delaunay, needing >> 200 flips; every interior edge must
    come out locally Delaunay."""
    n = 400
    rng = np.random.RandomState(7)
    radii = 50.0 + 45.0 * rng.rand(n)
    ang = np.linspace(0, 2 * math.pi, n, endpoint=False)
    shell = np.array(
        [(r * math.cos(a), r * math.sin(a)) for r, a in zip(radii, ang)]
    )
    shell = np.vstack([shell, shell[:1]])
    pts, tris = constrained_delaunay_polygon(shell, [])
    assert len(tris) == n - 2
    _assert_cdt_invariants(pts, tris, shell, [])


def test_cdt_polygon_with_hole():
    shell = np.array(
        [(0, 0), (40, 0), (40, 40), (0, 40), (0, 0)], dtype=float
    )
    ang = np.linspace(0, 2 * math.pi, 24, endpoint=False)
    hole = np.array(
        [(20 + 8 * math.cos(a), 20 + 8 * math.sin(a)) for a in ang]
    )
    hole = np.vstack([hole, hole[:1]])
    pts, tris = constrained_delaunay_polygon(shell, [hole])
    _assert_cdt_invariants(pts, tris, shell, [hole])


def test_cdt_collinear_boundary_vertices():
    """Runs of exactly-collinear boundary vertices: ear clipping drops
    zero-area triangles, so some ring vertices never reach the vertex
    table — constraints must key to surviving ids, never allocate new
    ones, and flips must not cross the (straight) boundary."""
    shell = np.array(
        [
            (0, 0), (10, 0), (20, 0), (30, 0), (40, 0),
            (40, 25), (40, 50), (20, 60), (0, 50), (0, 25), (0, 0),
        ],
        dtype=float,
    )
    pts, tris = constrained_delaunay_polygon(shell, [])
    # area must be exact even if collinear vertices were dropped
    want = abs(_ring_area2(shell))
    got = sum(_tri_area2(pts, t) for t in tris)
    assert got == pytest.approx(want, rel=1e-12)
    for t in tris:
        assert _tri_area2(pts, t) > 0
