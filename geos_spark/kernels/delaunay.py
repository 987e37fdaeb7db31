"""Delaunay triangulation (Bowyer-Watson) with robust predicates.

Plays the role of the reference's incremental quad-edge builder
(``src/triangulate/DelaunayTriangulationBuilder.cpp``,
``IncrementalDelaunayTriangulator.cpp``): same input normalization
(unique points, lexicographic order) and the same outputs
(triangle collection / edge multilinestring, GEOSDelaunayTriangulation
capi geos_c.h.in:1201). The insertion engine is Bowyer-Watson over a
super-triangle with an adaptive incircle predicate (longdouble filter,
exact Fraction fallback) instead of a C++ quad-edge structure — the
triangle SET is identical for inputs in general position.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from geos_spark.kernels import geom as G


def _incircle(ax, ay, bx, by, cx, cy, dx, dy) -> int:
    """> 0 if d is inside the circumcircle of CCW triangle (a,b,c)."""
    adx = np.longdouble(ax) - np.longdouble(dx)
    ady = np.longdouble(ay) - np.longdouble(dy)
    bdx = np.longdouble(bx) - np.longdouble(dx)
    bdy = np.longdouble(by) - np.longdouble(dy)
    cdx = np.longdouble(cx) - np.longdouble(dx)
    cdy = np.longdouble(cy) - np.longdouble(dy)
    det = (
        (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
        + (bdx * bdx + bdy * bdy) * (cdx * ady - adx * cdy)
        + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    )
    mags = (
        (abs(adx) + abs(ady) + abs(bdx) + abs(bdy) + abs(cdx) + abs(cdy))
    )
    eps = np.longdouble(1e-28) * mags * mags * mags * mags
    if det > eps:
        return 1
    if det < -eps:
        return -1
    # exact fallback
    fa = (Fraction(ax) - Fraction(dx), Fraction(ay) - Fraction(dy))
    fb = (Fraction(bx) - Fraction(dx), Fraction(by) - Fraction(dy))
    fc = (Fraction(cx) - Fraction(dx), Fraction(cy) - Fraction(dy))
    d = (
        (fa[0] * fa[0] + fa[1] * fa[1]) * (fb[0] * fc[1] - fc[0] * fb[1])
        + (fb[0] * fb[0] + fb[1] * fb[1]) * (fc[0] * fa[1] - fa[0] * fc[1])
        + (fc[0] * fc[0] + fc[1] * fc[1]) * (fa[0] * fb[1] - fb[0] * fa[1])
    )
    return (d > 0) - (d < 0)


def _orient(ax, ay, bx, by, cx, cy) -> int:
    from geos_spark.kernels.orientation import orientation_index

    return int(orientation_index(ax, ay, bx, by, cx, cy))


def delaunay(points: np.ndarray):
    """Bowyer-Watson triangulation of unique points.

    Returns (tris, pts): tris is a list of CCW (i, j, k) vertex-index
    triples into pts (super-triangle faces removed)."""
    pts = np.unique(
        np.asarray(points, dtype=np.float64).reshape(-1, 2), axis=0
    )
    n = len(pts)
    if n < 3:
        return [], pts
    x0, y0 = pts.min(axis=0)
    x1, y1 = pts.max(axis=0)
    dmax = max(x1 - x0, y1 - y0, 1.0)
    midx = (x0 + x1) / 2.0
    midy = (y0 + y1) / 2.0
    # super-triangle well outside the point set
    sup = np.array(
        [
            [midx - 20.0 * dmax, midy - 10.0 * dmax],
            [midx + 20.0 * dmax, midy - 10.0 * dmax],
            [midx, midy + 20.0 * dmax],
        ]
    )
    allp = np.vstack([pts, sup])
    S0, S1, S2 = n, n + 1, n + 2

    # triangle store: dict id -> (i, j, k) CCW; edge map for adjacency
    tris: dict[int, tuple[int, int, int]] = {0: (S0, S1, S2)}
    next_id = 1
    # edge -> tri id (directed edge (u, v) belongs to the tri having
    # u->v in CCW order)
    edge_tri: dict[tuple[int, int], int] = {
        (S0, S1): 0, (S1, S2): 0, (S2, S0): 0
    }

    def circum_contains(tid: int, p: int) -> bool:
        i, j, k = tris[tid]
        return (
            _incircle(
                allp[i, 0], allp[i, 1], allp[j, 0], allp[j, 1],
                allp[k, 0], allp[k, 1], allp[p, 0], allp[p, 1],
            )
            > 0
        )

    # insertion in lexicographic order (DelaunayTriangulationBuilder
    # normalizes input into a CoordinateSequence sorted order)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    for p in order:
        # find all triangles whose circumcircle contains p (grow from
        # any containing/violating triangle via adjacency)
        bad = [t for t in tris if circum_contains(t, int(p))]
        if not bad:
            continue
        bad_set = set(bad)
        # boundary polygon of the cavity: directed edges of bad tris
        # whose reverse edge is not in a bad tri
        boundary = []
        for t in bad:
            i, j, k = tris[t]
            for u, v in ((i, j), (j, k), (k, i)):
                rt = edge_tri.get((v, u))
                if rt is None or rt not in bad_set:
                    boundary.append((u, v))
        for t in bad:
            i, j, k = tris[t]
            for u, v in ((i, j), (j, k), (k, i)):
                del edge_tri[(u, v)]
            del tris[t]
        for u, v in boundary:
            tid = next_id
            next_id += 1
            tris[tid] = (u, v, int(p))
            edge_tri[(u, v)] = tid
            edge_tri[(v, int(p))] = tid
            edge_tri[(int(p), u)] = tid

    out = [
        t for t in tris.values() if all(v < n for v in t)
    ]
    # canonical rotation: smallest index first
    canon = []
    for i, j, k in out:
        m = min(i, j, k)
        if i == m:
            canon.append((i, j, k))
        elif j == m:
            canon.append((j, k, i))
        else:
            canon.append((k, i, j))
    canon.sort()
    return canon, pts


def _tri_polygon(pts: np.ndarray, t) -> G.Geom:
    i, j, k = t
    ring = np.array(
        [pts[i], pts[j], pts[k], pts[i]], dtype=np.float64
    )
    return G.Geom(G.POLYGON, [ring])


def delaunay_triangulation(g: G.Geom, tolerance: float = 0.0) -> G.Geom:
    """GEOSDelaunayTriangulation (edges=0): GEOMETRYCOLLECTION of
    triangle polygons over the input's unique vertices."""
    pts = g.all_coords()
    tris, upts = delaunay(pts)
    return G.Geom.collection(
        G.GEOMETRYCOLLECTION, [_tri_polygon(upts, t) for t in tris]
    )


def delaunay_edges(g: G.Geom, tolerance: float = 0.0) -> G.Geom:
    """GEOSDelaunayTriangulation (edges=1): unique triangulation edges
    as a MULTILINESTRING."""
    pts = g.all_coords()
    tris, upts = delaunay(pts)
    edges = set()
    for i, j, k in tris:
        for u, v in ((i, j), (j, k), (k, i)):
            edges.add((min(u, v), max(u, v)))
    lines = [
        G.Geom(
            G.LINESTRING,
            np.array([upts[u], upts[v]], dtype=np.float64),
        )
        for u, v in sorted(edges)
    ]
    return G.Geom(G.MULTILINESTRING, lines)
