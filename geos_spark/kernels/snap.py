"""Geometry snapping (GEOSSnap).

Re-derivation of the reference's vertex+segment snapper:
``src/operation/overlay/snap/GeometrySnapper.cpp`` (snapTo,
snapToSelf, tolerance heuristics) and ``LineStringSnapper.cpp``
(snapVertices / snapSegments with the projection-factor endpoint
re-snap rules). Snap points are the target geometry's unique
coordinates in traversal order (UniqueCoordinateArrayFilter).
"""

from __future__ import annotations

import math

import numpy as np

from geos_spark.kernels import geom as G

SNAP_PRECISION_FACTOR = 1e-9  # GeometrySnapper::snapPrecisionFactor


def _unique_coords(g: G.Geom) -> list[tuple[float, float]]:
    seen: set = set()
    out: list[tuple[float, float]] = []
    for p in g.all_coords():
        k = (float(p[0]), float(p[1]))
        if k not in seen:
            seen.add(k)
            out.append(k)
    return out


def _dist(a, b) -> float:
    return math.hypot(a[0] - b[0], a[1] - b[1])


def _seg_dist(p, a, b) -> float:
    from geos_spark.kernels.dd import _point_to_segment

    return _point_to_segment(p, a, b)


def _projection_factor(p, a, b) -> float:
    dx = b[0] - a[0]
    dy = b[1] - a[1]
    l2 = dx * dx + dy * dy
    if l2 == 0.0:
        return 0.0
    return ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / l2


def _snap_line(
    coords: list[tuple[float, float]],
    snap_pts: list[tuple[float, float]],
    tol: float,
    is_closed: bool,
    allow_source_vertices: bool = False,
) -> list[tuple[float, float]]:
    """LineStringSnapper::snapTo on one coordinate chain."""
    src = list(coords)

    # --- pass 1: vertex snapping (LineStringSnapper::snapVertices)
    for sp in snap_pts:
        limit = len(src) - 1 if is_closed else len(src)
        best = None
        best_d = tol
        for i in range(limit):
            d = _dist(src[i], sp)
            if d >= best_d:
                continue
            if d == 0.0:
                best = i
                break
            best = i
            best_d = d
        if best is None:
            continue
        src[best] = sp
        if best == 0 and is_closed:
            src[-1] = sp

    # --- pass 2: segment snapping (LineStringSnapper::snapSegments)
    for sp in snap_pts:
        # findSegmentToSnap: nearest segment within tol; give up if the
        # snap point already equals a source vertex
        best = None
        best_d = tol
        give_up = False
        for i in range(len(src) - 1):
            if src[i] == sp or src[i + 1] == sp:
                if allow_source_vertices:
                    continue
                give_up = True
                break
            d = _seg_dist(sp, src[i], src[i + 1])
            if d < best_d:
                best_d = d
                best = i
        if give_up or best is None:
            continue
        i = best
        p0, p1 = src[i], src[i + 1]
        pf = _projection_factor(sp, p0, p1)
        if pf >= 1.0:
            # endpoint should have snapped: re-snap it, keep the old
            # endpoint in whichever adjacent segment is closer
            old = p1
            src[i + 1] = sp
            if i + 1 == len(src) - 1:
                if is_closed:
                    src[0] = sp
                    nxt = src[1]
                else:
                    src.insert(i + 1, old)
                    continue
            else:
                nxt = src[i + 2]
            if _seg_dist(old, sp, nxt) < _seg_dist(old, p0, sp):
                src.insert(i + 2, old)
            else:
                src.insert(i + 1, old)
        elif pf <= 0.0:
            old = p0
            src[i] = sp
            if i == 0:
                if is_closed:
                    src[-1] = sp
                    prv = src[-2]
                else:
                    src.insert(1, old)
                    continue
            else:
                prv = src[i - 1]
            if _seg_dist(old, prv, sp) < _seg_dist(old, sp, p1):
                src.insert(i, old)
            else:
                src.insert(i + 1, old)
        else:
            src.insert(i + 1, sp)
    return src


def _snap_geom(
    g: G.Geom, snap_pts: list, tol: float, allow_source_vertices: bool
) -> G.Geom:
    if g.type_id == G.POINT:
        if not len(g.data):
            return g
        p = (float(g.data[0, 0]), float(g.data[0, 1]))
        for sp in snap_pts:
            if _dist(p, sp) < tol:
                return G.Geom.point(*sp)
        return g
    if g.type_id == G.LINESTRING:
        if len(g.data) < 2:
            return g
        c = [(float(x), float(y)) for x, y in g.data]
        closed = c[0] == c[-1]
        out = _snap_line(c, snap_pts, tol, closed, allow_source_vertices)
        return G.Geom(
            G.LINESTRING, np.asarray(out, dtype=np.float64).reshape(-1, 2)
        )
    if g.type_id == G.POLYGON:
        rings = []
        for r in g.data:
            c = [(float(x), float(y)) for x, y in r]
            out = _snap_line(
                c, snap_pts, tol, True, allow_source_vertices
            )
            rings.append(np.asarray(out, dtype=np.float64).reshape(-1, 2))
        return G.Geom(G.POLYGON, rings)
    if g.is_collection:
        return G.Geom(
            g.type_id,
            [
                _snap_geom(p, snap_pts, tol, allow_source_vertices)
                for p in g.data
            ],
        )
    return g


def snap(src: G.Geom, target: G.Geom, tol: float) -> G.Geom:
    """GEOSSnap (capi geos_c.h.in:5241): snap the vertices and
    segments of ``src`` to the vertices of ``target`` within
    ``tol``."""
    if src.is_empty or target.is_empty or tol <= 0:
        return src
    return _snap_geom(src, _unique_coords(target), tol, False)


def snap_to_self(g: G.Geom, tol: float, clean: bool = True) -> G.Geom:
    """GeometrySnapper::snapToSelf: snap a geometry's vertices to its
    own coordinate set (allowing source-vertex snaps); optionally
    clean areal results with a zero buffer."""
    if g.is_empty or tol <= 0:
        return g
    res = _snap_geom(g, _unique_coords(g), tol, True)
    if clean and res.dimension() == 2:
        from geos_spark.kernels.buffer import buffer_geom

        res = buffer_geom(res, 0.0)
    return res


def size_based_snap_tolerance(g: G.Geom) -> float:
    """GeometrySnapper::computeSizeBasedSnapTolerance."""
    x0, y0, x1, y1 = g.envelope()
    if any(math.isnan(v) for v in (x0, y0, x1, y1)):
        return 0.0
    return min(x1 - x0, y1 - y0) * SNAP_PRECISION_FACTOR
