"""PolygonHullSimplifier — topology-preserving outer/inner hulls of
polygonal geometry by concave-corner removal.

Reference parity: src/simplify/PolygonHullSimplifier.cpp (driver),
src/simplify/RingHull.cpp (per-ring corner queue),
src/simplify/RingHullIndex.cpp (cross-ring overlap guard),
capi GEOSPolygonHullSimplify / GEOSPolygonHullSimplifyMode
(geos_c.h.in:4625-4688; GEOSHULL_PARAM_VERTEX_RATIO=1,
GEOSHULL_PARAM_AREA_RATIO=2).

Algorithm (RingHull): orient each ring CW for an outer hull (CCW for
inner), queue every non-convex corner by (triangle area, index) in a
min-heap, and repeatedly remove the smallest corner's apex unless the
corner triangle contains another remaining vertex (of this ring, or —
when overlaps are possible — of any ring in the shared index).
Stop at the target: vertex mode stops when the ring size drops below
ceil(fraction * (n-1)); area mode stops when the accumulated removed
area plus the candidate corner's would exceed
ringWeight * areaDeltaRatio * ringArea.

The structure is a linked ring (prev/next arrays + alive mask); the
reference's VertexSequencePackedRtree vertex query is replaced by a
vectorized bbox filter over the alive coordinates — same candidates,
numpy instead of a packed R-tree (rings in a pUDF row are small; the
distribution axis is rows, not one huge ring).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.orientation import orientation_index
from geos_spark.kernels.scalars import ring_signed_area

_CW = -1  # Orientation::CLOCKWISE


def _tri_area(pp, p, pn) -> float:
    return abs(
        (
            (p[0] - pp[0]) * (pn[1] - pp[1])
            - (pn[0] - pp[0]) * (p[1] - pp[1])
        )
        / 2.0
    )


def _tri_intersects(a, b, c, v) -> bool:
    """Triangle::intersects (Triangle.cpp:153-164): point in triangle
    incl. boundary, via the exterior-side test."""
    ccw = (
        orientation_index(a[0], a[1], b[0], b[1], c[0], c[1]) > 0
    )
    ext = _CW if ccw else 1
    if orientation_index(a[0], a[1], b[0], b[1], v[0], v[1]) == ext:
        return False
    if orientation_index(b[0], b[1], c[0], c[1], v[0], v[1]) == ext:
        return False
    if orientation_index(c[0], c[1], a[0], a[1], v[0], v[1]) == ext:
        return False
    return True


class _RingHull:
    def __init__(self, ring: np.ndarray, is_outer: bool):
        # open ring, oriented CW for outer hulls / CCW for inner
        # (RingHull::init)
        pts = np.asarray(ring, dtype=np.float64)
        if len(pts) > 1 and (
            pts[0, 0] == pts[-1, 0] and pts[0, 1] == pts[-1, 1]
        ):
            pts = pts[:-1]
        is_ccw = ring_signed_area(
            np.vstack([pts, pts[:1]])
        ) > 0
        if is_ccw == is_outer:  # orientCW == isCCW -> reverse
            pts = pts[::-1].copy()
        self.pts = pts
        n = len(pts)
        self.n_alive = n
        self.prev = np.roll(np.arange(n), 1)
        self.next = np.roll(np.arange(n), -1)
        self.alive = np.ones(n, dtype=bool)
        self.env = (
            float(pts[:, 0].min()),
            float(pts[:, 1].min()),
            float(pts[:, 0].max()),
            float(pts[:, 1].max()),
        )
        self.target_vertex_num = -1.0
        self.target_area_delta = -1.0
        self.area_delta = 0.0
        self.queue: list = []
        for i in range(n):
            self._add_corner(i)

    # -- corner bookkeeping -------------------------------------------
    def _is_convex(self, i: int) -> bool:
        pp = self.pts[self.prev[i]]
        p = self.pts[i]
        pn = self.pts[self.next[i]]
        return (
            orientation_index(pp[0], pp[1], p[0], p[1], pn[0], pn[1])
            == _CW
        )

    def _add_corner(self, i: int) -> None:
        if self._is_convex(i):
            return
        pp = self.pts[self.prev[i]]
        p = self.pts[i]
        pn = self.pts[self.next[i]]
        heapq.heappush(
            self.queue,
            (
                _tri_area(pp, p, pn),
                i,
                int(self.prev[i]),
                int(self.next[i]),
            ),
        )

    # -- targets -------------------------------------------------------
    def set_min_vertex_num(self, k: int) -> None:
        self.target_vertex_num = float(k)

    def set_max_area_delta(self, d: float) -> None:
        self.target_area_delta = d

    def _at_target(self, corner_area: float) -> bool:
        if self.target_vertex_num >= 0:
            return self.n_alive < self.target_vertex_num
        if self.target_area_delta >= 0:
            # include the candidate corner to avoid overshooting
            return (
                self.area_delta + corner_area > self.target_area_delta
            )
        return True

    # -- vertex queries -------------------------------------------------
    def query_alive(self, env) -> np.ndarray:
        """Indices of alive vertices inside an envelope (vectorized
        stand-in for VertexSequencePackedRtree::query)."""
        x, y = self.pts[:, 0], self.pts[:, 1]
        m = (
            self.alive
            & (x >= env[0])
            & (x <= env[2])
            & (y >= env[1])
            & (y <= env[3])
        )
        return np.flatnonzero(m)

    # -- main loop ------------------------------------------------------
    def compute(self, hull_index: list["_RingHull"] | None) -> None:
        while self.queue and self.n_alive > 3:
            area, i, cp, cn = heapq.heappop(self.queue)
            if (
                not self.alive[i]
                or self.prev[i] != cp
                or self.next[i] != cn
            ):
                continue  # stale corner
            if self._at_target(area):
                return
            if self._is_removable(i, hull_index):
                self._remove_corner(i, area)

    def _corner_env(self, i: int):
        tri = self.pts[[self.prev[i], i, self.next[i]]]
        return (
            float(tri[:, 0].min()),
            float(tri[:, 1].min()),
            float(tri[:, 0].max()),
            float(tri[:, 1].max()),
        )

    def _is_removable(
        self, i: int, hull_index: list["_RingHull"] | None
    ) -> bool:
        env = self._corner_env(i)
        if self._has_intersecting_vertex(i, env, self):
            return False
        if not hull_index:
            return True
        for hull in hull_index:
            if hull is self:
                continue
            he = hull.env
            if (
                env[0] <= he[2]
                and he[0] <= env[2]
                and env[1] <= he[3]
                and he[1] <= env[3]
            ) and self._has_intersecting_vertex(i, env, hull):
                return False
        return True

    def _has_intersecting_vertex(
        self, i: int, env, hull: "_RingHull"
    ) -> bool:
        a = self.pts[self.prev[i]]
        b = self.pts[i]
        c = self.pts[self.next[i]]
        trio = (int(self.prev[i]), int(i), int(self.next[i]))
        for j in hull.query_alive(env):
            if hull is self and int(j) in trio:
                continue
            if _tri_intersects(a, b, c, hull.pts[j]):
                return True
        return False

    def _remove_corner(self, i: int, area: float) -> None:
        p, n = int(self.prev[i]), int(self.next[i])
        self.alive[i] = False
        self.next[p] = n
        self.prev[n] = p
        self.n_alive -= 1
        self.area_delta += area
        self._add_corner(p)
        self._add_corner(n)

    def hull_ring(self) -> np.ndarray:
        """Remaining vertices in ring order, closed."""
        start = int(np.flatnonzero(self.alive)[0])
        out = [self.pts[start]]
        j = int(self.next[start])
        while j != start:
            out.append(self.pts[j])
            j = int(self.next[j])
        out.append(self.pts[start])
        return np.asarray(out, dtype=np.float64)


def _ring_area(r: np.ndarray) -> float:
    return abs(ring_signed_area(np.asarray(r, dtype=np.float64)))


def _init_polygon(
    poly: G.Geom,
    is_outer: bool,
    vertex_num_fraction: float,
    area_delta_ratio: float,
    hull_index: list | None,
) -> list[_RingHull]:
    hulls: list[_RingHull] = []
    if poly.is_empty:
        return hulls
    area_total = 0.0
    if area_delta_ratio >= 0:
        area_total = sum(_ring_area(r) for r in poly.data)
    for k, ring in enumerate(poly.data):
        rh = _RingHull(ring, is_outer if k == 0 else not is_outer)
        n_pts = len(ring)
        if vertex_num_fraction >= 0:
            rh.set_min_vertex_num(
                int(math.ceil(vertex_num_fraction * (n_pts - 1)))
            )
        elif area_delta_ratio >= 0:
            ring_area = _ring_area(ring)
            weight = ring_area / area_total if area_total > 0 else 0.0
            rh.set_max_area_delta(
                weight * area_delta_ratio * ring_area
            )
        if hull_index is not None:
            hull_index.append(rh)
        hulls.append(rh)
    return hulls


def _polygon_from_hulls(
    poly: G.Geom, hulls: list[_RingHull], hull_index: list | None
) -> G.Geom:
    if poly.is_empty:
        return poly
    rings = [h.hull_ring() for h in hulls]
    return G.Geom(G.POLYGON, rings)


def _compute_polygon(
    poly: G.Geom,
    is_outer: bool,
    vertex_num_fraction: float,
    area_delta_ratio: float,
) -> G.Geom:
    # single polygon: overlaps only possible for inner hulls with
    # holes present (PolygonHullSimplifier::computePolygon)
    overlap_possible = (not is_outer) and len(poly.data) > 1
    hull_index: list | None = [] if overlap_possible else None
    hulls = _init_polygon(
        poly, is_outer, vertex_num_fraction, area_delta_ratio,
        hull_index,
    )
    for h in hulls:
        h.compute(hull_index)
    return _polygon_from_hulls(poly, hulls, hull_index)


def polygon_hull_simplify(
    g: G.Geom,
    is_outer: bool,
    vertex_num_fraction: float = -1.0,
    area_delta_ratio: float = -1.0,
) -> G.Geom:
    """GEOSPolygonHullSimplify(+Mode): outer/inner topology-preserving
    hull of a POLYGON or MULTIPOLYGON."""
    vertex_num_fraction = (
        min(abs(vertex_num_fraction), 1.0)
        if vertex_num_fraction >= 0
        else vertex_num_fraction
    )
    # trivial parameter values return the input unchanged
    if vertex_num_fraction == 1.0 or area_delta_ratio == 0.0:
        return g
    if g.type_id == G.MULTIPOLYGON:
        polys = g.data
        overlap_possible = is_outer and len(polys) > 1
        if overlap_possible:
            hull_index: list = []
            all_hulls = [
                _init_polygon(
                    p, is_outer, vertex_num_fraction,
                    area_delta_ratio, hull_index,
                )
                for p in polys
            ]
            out = []
            for p, hulls in zip(polys, all_hulls):
                for h in hulls:
                    h.compute(hull_index)
                out.append(_polygon_from_hulls(p, hulls, hull_index))
            return G.Geom(G.MULTIPOLYGON, out)
        return G.Geom(
            G.MULTIPOLYGON,
            [
                _compute_polygon(
                    p, is_outer, vertex_num_fraction, area_delta_ratio
                )
                for p in polys
            ],
        )
    if g.type_id == G.POLYGON:
        return _compute_polygon(
            g, is_outer, vertex_num_fraction, area_delta_ratio
        )
    raise ValueError("polygonHullSimplify: input must be polygonal")
