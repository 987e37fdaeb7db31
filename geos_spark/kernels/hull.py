"""Concave hull of a point set.

Re-derivation of ``src/algorithm/hull/ConcaveHull.cpp`` + HullTri:
Delaunay triangulation of the input vertices, then erosion of border
triangles (largest first, by boundary-edge length or circumradius for
alpha shapes) while keeping the hull connected, with optional hole
excavation. API parity: concaveHullByLength / concaveHullByLengthRatio
(GEOSConcaveHull, capi geos_c.h.in) and alpha_shape.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.delaunay import delaunay


def _next(i: int) -> int:
    return (i + 1) % 3


def _prev(i: int) -> int:
    return (i + 2) % 3


class _HullTris:
    """Mutable triangulation with adjacency (the TriList/HullTri
    model, src/algorithm/hull/HullTri.cpp)."""

    def __init__(self, tris, pts):
        self.pts = pts
        self.verts = {t: tuple(tri) for t, tri in enumerate(tris)}
        self.edge_tri: dict = {}
        for t, (i, j, k) in self.verts.items():
            for u, v in ((i, j), (j, k), (k, i)):
                self.edge_tri[(u, v)] = t

    def adjacent(self, t: int, i: int):
        vs = self.verts[t]
        return self.edge_tri.get((vs[_next(i)], vs[i]))

    def num_adjacent(self, t: int) -> int:
        return sum(1 for i in range(3) if self.adjacent(t, i) is not None)

    def edge_len(self, t: int, i: int) -> float:
        vs = self.verts[t]
        a = self.pts[vs[i]]
        b = self.pts[vs[_next(i)]]
        return math.hypot(a[0] - b[0], a[1] - b[1])

    def boundary_len(self, t: int) -> float:
        return sum(
            self.edge_len(t, i)
            for i in range(3)
            if self.adjacent(t, i) is None
        )

    def longest_edge(self, t: int) -> float:
        return max(self.edge_len(t, i) for i in range(3))

    def circumradius(self, t: int) -> float:
        vs = self.verts[t]
        a, b, c = (self.pts[v] for v in vs)
        la = math.hypot(b[0] - c[0], b[1] - c[1])
        lb = math.hypot(a[0] - c[0], a[1] - c[1])
        lc = math.hypot(a[0] - b[0], a[1] - b[1])
        area2 = abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        )
        if area2 == 0:
            return math.inf
        return (la * lb * lc) / (2.0 * area2)

    def is_interior_vertex(self, t: int, i: int) -> bool:
        """Tri::isInteriorVertex: full ring of triangles around the
        vertex (Tri.cpp:371-387)."""
        v = self.verts[t][i]
        curr, ci = t, i
        while True:
            adj = self.adjacent(curr, ci)
            if adj is None:
                return False
            ci = self.verts[adj].index(v)
            curr = adj
            if curr == t:
                return True

    def is_connecting(self, t: int) -> bool:
        """HullTri::isConnecting — the vertex between the two adjacent
        edges must be interior, else removal splits the hull."""
        has = [self.adjacent(t, i) is not None for i in range(3)]
        if has[0] and has[1]:
            idx = 1
        elif has[1] and has[2]:
            idx = 2
        elif has[2] and has[0]:
            idx = 0
        else:
            return False
        return not self.is_interior_vertex(t, idx)

    def is_border(self, t: int) -> bool:
        return any(self.adjacent(t, i) is None for i in range(3))

    def has_boundary_touch(self, t: int) -> bool:
        for i in range(3):
            if self.adjacent(t, i) is None:
                continue
            if self.adjacent(t, _prev(i)) is None:
                continue
            if not self.is_interior_vertex(t, i):
                return True
        return False

    def remove(self, t: int) -> None:
        i, j, k = self.verts[t]
        for u, v in ((i, j), (j, k), (k, i)):
            if self.edge_tri.get((u, v)) == t:
                del self.edge_tri[(u, v)]
        del self.verts[t]


def _erode(ht: _HullTris, qsize_fn, init_size_fn, max_size, holes) -> None:
    """ConcaveHull::computeHullBorder: pop border tris largest-first
    (queue size = boundary length for the edge criterion, circumradius
    for alpha — HullTri::setSizeToBoundary), stop when the largest is
    in the hull, remove when removal keeps the hull simply
    connected."""
    counter = 0
    heap: list = []

    def push_border(t):
        nonlocal counter
        if t is None or t not in ht.verts:
            return
        if ht.num_adjacent(t) != 2:
            return
        heapq.heappush(heap, (-qsize_fn(t), -counter, t))
        counter += 1

    for t in list(ht.verts):
        push_border(t)
    while heap:
        negsz, _, t = heapq.heappop(heap)
        if t not in ht.verts:
            continue
        # the size is the one recorded at push time (the reference
        # processes stale queue entries the same way)
        if -negsz < max_size:
            break
        if ht.num_adjacent(t) == 2 and not ht.is_connecting(t):
            adjs = [ht.adjacent(t, i) for i in range(3)]
            ht.remove(t)
            for a in adjs:
                push_border(a)

    if holes:
        _erode_holes(ht, qsize_fn, init_size_fn, max_size)


def _erode_holes(ht: _HullTris, qsize_fn, init_size_fn, max_size) -> None:
    """ConcaveHull::computeHullHoles / removeHole."""
    candidates = [
        t
        for t in ht.verts
        if init_size_fn(t) >= max_size
        and not ht.is_border(t)
        and not ht.has_boundary_touch(t)
    ]
    candidates.sort(key=init_size_fn, reverse=True)
    for hole in candidates:
        if (
            hole not in ht.verts
            or ht.is_border(hole)
            or ht.has_boundary_touch(hole)
        ):
            continue
        counter = 0
        heap = [(-init_size_fn(hole), -counter, hole)]
        first = True
        while heap:
            negsz, _, t = heapq.heappop(heap)
            if t not in ht.verts:
                continue
            if not first and -negsz < max_size:
                break
            ok = first or (
                ht.num_adjacent(t) == 2 and not ht.has_boundary_touch(t)
            )
            first = False
            if ok:
                adjs = [ht.adjacent(t, i) for i in range(3)]
                ht.remove(t)
                for a in adjs:
                    if (
                        a is not None
                        and a in ht.verts
                        and ht.num_adjacent(a) == 2
                    ):
                        counter += 1
                        heapq.heappush(heap, (-qsize_fn(a), -counter, a))


def _trace_boundary(ht: _HullTris) -> G.Geom:
    """HullTriangulation::traceBoundaryPolygon."""
    if len(ht.verts) == 1:
        t = next(iter(ht.verts))
        i, j, k = ht.verts[t]
        ring = np.array(
            [ht.pts[i], ht.pts[j], ht.pts[k], ht.pts[i]], dtype=np.float64
        )
        return G.Geom(G.POLYGON, [ring])
    # boundary directed edges (u -> v) with no reverse triangle
    bedges = {}
    for t, (i, j, k) in ht.verts.items():
        for a in range(3):
            if ht.adjacent(t, a) is None:
                vs = ht.verts[t]
                bedges[vs[a]] = vs[_next(a)]
    if not bedges:
        return G.Geom(G.POLYGON, [])
    start = next(iter(bedges))
    ring = [start]
    v = bedges[start]
    while v != start:
        ring.append(v)
        v = bedges[v]
    ring.append(start)
    coords = np.array([ht.pts[v] for v in ring], dtype=np.float64)
    return G.Geom(G.POLYGON, [coords])


def _to_geometry(ht: _HullTris, holes: bool) -> G.Geom:
    if not holes:
        return _trace_boundary(ht)
    from geos_spark.kernels.union import cascaded_polygon_union

    polys = []
    for t, (i, j, k) in ht.verts.items():
        ring = np.array(
            [ht.pts[i], ht.pts[j], ht.pts[k], ht.pts[i]], dtype=np.float64
        )
        polys.append(G.Geom(G.POLYGON, [ring]))
    if not polys:
        return G.Geom(G.POLYGON, [])
    return cascaded_polygon_union(polys)


def _hull(
    g: G.Geom,
    *,
    max_length: float | None = None,
    length_ratio: float | None = None,
    alpha: float | None = None,
    holes: bool = False,
) -> G.Geom:
    from geos_spark.kernels.scalars import convex_hull

    if g.is_empty:
        return G.Geom(G.POLYGON, [])
    tris, pts = delaunay(g.all_coords())
    if not tris:
        return convex_hull(g)
    ht = _HullTris(tris, pts)

    if alpha is not None:
        qsize_fn = init_size_fn = ht.circumradius
        max_size = alpha
    else:
        qsize_fn = ht.boundary_len  # HullTri::setSizeToBoundary
        init_size_fn = ht.longest_edge  # setSizeToLongestEdge
        if length_ratio is not None:
            lens = [
                ht.edge_len(t, i) for t in ht.verts for i in range(3)
            ]
            mx, mn = max(lens), min(lens)
            if length_ratio == 1:
                max_size = 2 * mx
            elif length_ratio == 0:
                max_size = 0.0
            else:
                max_size = length_ratio * (mx - mn) + mn
        else:
            max_size = float(max_length or 0.0)

    _erode(ht, qsize_fn, init_size_fn, max_size, holes)
    return _to_geometry(ht, holes)


def concave_hull_by_length(
    g: G.Geom, max_length: float, holes: bool = False
) -> G.Geom:
    """ConcaveHull::concaveHullByLength."""
    return _hull(g, max_length=max_length, holes=holes)


def concave_hull_by_length_ratio(
    g: G.Geom, ratio: float, holes: bool = False
) -> G.Geom:
    """ConcaveHull::concaveHullByLengthRatio (GEOSConcaveHull's
    ratio parameter)."""
    return _hull(g, length_ratio=ratio, holes=holes)


def alpha_shape(g: G.Geom, alpha: float, holes: bool = False) -> G.Geom:
    """ConcaveHull::alphaShape (circumradius criterion)."""
    return _hull(g, alpha=alpha, holes=holes)
