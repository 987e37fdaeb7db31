"""Clip-by-rectangle kernel — raster<->vector tile materialization.

Semantics follow the reference's rectangle-intersection path
(``src/operation/intersection/RectangleIntersection.cpp``, and
OverlayNG's ``RingClipper`` used when the clip window is rectangular):
polygon rings are clipped with the classic Sutherland–Hodgman
half-plane cascade (exact for a rectangle clipper), lines are clipped
to maximal in-window sub-segments (Cohen–Sutherland style parametric
clip), points by containment.

Degenerate results (ring collapses to a zero-area sliver lying on the
clip boundary) are returned as-is; callers that need area filtering
use ``ring_signed_area``.
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.scalars import ring_signed_area


def clip_ring(
    ring: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float
) -> np.ndarray:
    """Sutherland–Hodgman clip of a closed ring to a rectangle.

    Returns a closed ring (k>=4) or an empty (0,2) array.
    """
    pts = ring[:-1] if len(ring) and np.array_equal(ring[0], ring[-1]) else ring

    def clip_half(pts: np.ndarray, inside, intersect) -> np.ndarray:
        if len(pts) == 0:
            return pts
        out = []
        n = len(pts)
        for i in range(n):
            cur = pts[i]
            prev = pts[i - 1]
            cin = inside(cur)
            pin = inside(prev)
            if cin:
                if not pin:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prev, cur))
        return np.asarray(out, dtype=np.float64).reshape(-1, 2)

    def x_cut(v: float):
        def inter(p, q):
            t = (v - p[0]) / (q[0] - p[0])
            return np.array([v, p[1] + t * (q[1] - p[1])])

        return inter

    def y_cut(v: float):
        def inter(p, q):
            t = (v - p[1]) / (q[1] - p[1])
            return np.array([p[0] + t * (q[0] - p[0]), v])

        return inter

    pts = clip_half(pts, lambda p: p[0] >= xmin, x_cut(xmin))
    pts = clip_half(pts, lambda p: p[0] <= xmax, x_cut(xmax))
    pts = clip_half(pts, lambda p: p[1] >= ymin, y_cut(ymin))
    pts = clip_half(pts, lambda p: p[1] <= ymax, y_cut(ymax))
    if len(pts) < 3:
        return np.zeros((0, 2))
    # drop consecutive duplicates
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (np.diff(pts, axis=0) != 0).any(axis=1)
    pts = pts[keep]
    if len(pts) < 3:
        return np.zeros((0, 2))
    return np.vstack([pts, pts[:1]])


def clip_polygon(
    g: G.Geom, xmin: float, ymin: float, xmax: float, ymax: float
) -> G.Geom:
    """Clip a polygon/multipolygon to a rectangle. Hole rings are
    clipped independently; collapsed rings are dropped."""
    polys = (
        [g] if g.type_id == G.POLYGON else
        [p for p in g.geoms() if p.type_id == G.POLYGON]
    )
    out_polys = []
    for p in polys:
        if not p.data:
            continue
        shell = clip_ring(p.data[0], xmin, ymin, xmax, ymax)
        if len(shell) == 0 or ring_signed_area(shell) == 0.0:
            continue
        rings = [shell]
        for hole in p.data[1:]:
            h = clip_ring(hole, xmin, ymin, xmax, ymax)
            if len(h) and ring_signed_area(h) != 0.0:
                rings.append(h)
        out_polys.append(G.Geom(G.POLYGON, rings))
    if not out_polys:
        return G.Geom.empty(G.POLYGON)
    if len(out_polys) == 1:
        return out_polys[0]
    return G.Geom(G.MULTIPOLYGON, out_polys)


def clip_line(
    coords: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float
) -> list[np.ndarray]:
    """Clip a polyline to a rectangle -> list of sub-polylines."""
    out: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(coords) - 1):
        seg = _clip_seg(coords[i], coords[i + 1], xmin, ymin, xmax, ymax)
        if seg is None:
            if cur:
                out.append(cur)
                cur = []
            continue
        a, b = seg
        if cur and np.array_equal(cur[-1], a):
            cur.append(b)
        else:
            if cur:
                out.append(cur)
            cur = [a, b]
    if cur:
        out.append(cur)
    return [np.asarray(c) for c in out if len(c) >= 2]


def _clip_seg(p, q, xmin, ymin, xmax, ymax):
    """Liang–Barsky parametric segment clip."""
    t0, t1 = 0.0, 1.0
    dx, dy = q[0] - p[0], q[1] - p[1]
    for d, lo, hi in ((dx, xmin - p[0], xmax - p[0]), (dy, ymin - p[1], ymax - p[1])):
        if d == 0:
            if lo > 0 or hi < 0:
                return None
            continue
        ta, tb = lo / d, hi / d
        if ta > tb:
            ta, tb = tb, ta
        t0 = max(t0, ta)
        t1 = min(t1, tb)
        if t0 > t1:
            return None
    a = np.array([p[0] + t0 * dx, p[1] + t0 * dy])
    b = np.array([p[0] + t1 * dx, p[1] + t1 * dy])
    if np.array_equal(a, b):
        return None
    return a, b


def clip_geom(
    g: G.Geom, xmin: float, ymin: float, xmax: float, ymax: float
) -> G.Geom:
    d = g.dimension()
    if d == 2:
        return clip_polygon(g, xmin, ymin, xmax, ymax)
    if d == 1:
        parts = []
        for line in (
            p.data for p in g.geoms() if p.type_id == G.LINESTRING
        ):
            for sub in clip_line(line, xmin, ymin, xmax, ymax):
                parts.append(G.Geom(G.LINESTRING, sub))
        if not parts:
            return G.Geom.empty(G.LINESTRING)
        if len(parts) == 1:
            return parts[0]
        return G.Geom(G.MULTILINESTRING, parts)
    pts = [
        p
        for p in g.geoms()
        if p.type_id == G.POINT
        and not p.is_empty
        and xmin <= p.data[0, 0] <= xmax
        and ymin <= p.data[0, 1] <= ymax
    ]
    if not pts:
        return G.Geom.empty(G.POINT)
    if len(pts) == 1:
        return pts[0]
    return G.Geom(G.MULTIPOINT, pts)
