"""Unary scalar geometry kernels: area, length, centroid, envelope,
convex hull, distance, simplify.

Operation-order matches the reference scalar algorithms so results are
bit-identical on the same inputs:
- area: shoelace in the reference's form sum((x[i]-x[i+1]) * (y ...))
  (``src/algorithm/Area.cpp:73-87``)
- centroid: area-weighted triangle centroid with base-point translation
  (``src/algorithm/Centroid.cpp:99-150``)
- length: sum of segment hypotenuses (``src/algorithm/Length.cpp``)
- convex hull: Graham scan (``src/algorithm/ConvexHull.cpp``) — same
  result set; vertex order canonicalized by normalize() for comparison
- simplify: Douglas-Peucker (``src/simplify/DouglasPeuckerSimplifier.cpp``)
- distance: min facet distance (``src/operation/distance/DistanceOp.cpp``)
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.orientation import orientation_index


# ----------------------------------------------------------------------
# area / length
# ----------------------------------------------------------------------


def ring_signed_area(ring: np.ndarray) -> float:
    """Signed area, CCW positive. Reference form: based at ring[0]
    (Area::ofRingSigned uses x-base translation for robustness)."""
    if len(ring) < 3:
        return 0.0
    x = ring[:, 0]
    y = ring[:, 1]
    # translate by x0 as the reference does to reduce magnitude
    x0 = x[0]
    xs = x[1:-1] - x0
    return float(np.sum(xs * (y[2:] - y[:-2])) / 2.0)


def geom_area(g: G.Geom) -> float:
    if g.type_id == G.POLYGON:
        if not g.data:
            return 0.0
        a = abs(ring_signed_area(g.data[0]))
        for hole in g.data[1:]:
            a -= abs(ring_signed_area(hole))
        return a
    if g.is_collection:
        return float(sum(geom_area(p) for p in g.data))
    return 0.0


def geom_length(g: G.Geom) -> float:
    if g.type_id == G.LINESTRING:
        d = np.diff(g.data, axis=0)
        return float(np.sum(np.hypot(d[:, 0], d[:, 1])))
    if g.type_id == G.POLYGON:
        return float(
            sum(
                np.sum(np.hypot(*np.diff(r, axis=0).T)) for r in g.data
            )
        )
    if g.is_collection:
        return float(sum(geom_length(p) for p in g.data))
    return 0.0


# ----------------------------------------------------------------------
# centroid (Centroid.cpp semantics: areas, then lines, then points)
# ----------------------------------------------------------------------


def geom_centroid(g: G.Geom) -> tuple[float, float] | None:
    areasum2 = 0.0
    cg3 = np.zeros(2)
    linelen = 0.0
    linesum = np.zeros(2)
    ptcount = 0
    ptsum = np.zeros(2)
    base: np.ndarray | None = None

    def add_ring(ring: np.ndarray, sign: float) -> None:
        nonlocal areasum2, cg3, base
        if base is None and len(ring):
            base = ring[0].copy()
        for i in range(len(ring) - 1):
            p = ring[i] - base
            q = ring[i + 1] - base
            a2 = p[0] * q[1] - q[0] * p[1]
            areasum2 += sign * a2
            cg3 += sign * a2 * (p + q)

    def add_line(coords: np.ndarray) -> None:
        nonlocal linelen, linesum
        d = np.diff(coords, axis=0)
        seglen = np.hypot(d[:, 0], d[:, 1])
        mids = (coords[:-1] + coords[1:]) / 2.0
        linelen += float(seglen.sum())
        linesum += (seglen[:, None] * mids).sum(axis=0)

    def visit(g: G.Geom) -> None:
        nonlocal ptcount, ptsum
        if g.is_empty:
            return
        if g.type_id == G.POINT:
            ptcount += 1
            ptsum += g.data[0]
        elif g.type_id == G.LINESTRING:
            add_line(g.data)
        elif g.type_id == G.POLYGON:
            shell = g.data[0]
            shell_sign = 1.0 if ring_signed_area(shell) >= 0 else -1.0
            add_ring(shell, shell_sign)
            for hole in g.data[1:]:
                hole_sign = 1.0 if ring_signed_area(hole) >= 0 else -1.0
                add_ring(hole, -hole_sign)
        else:
            for p in g.data:
                visit(p)

    visit(g)
    if abs(areasum2) > 0:
        c = cg3 / 3.0 / areasum2
        return float(c[0] + base[0]), float(c[1] + base[1])
    if linelen > 0:
        c = linesum / linelen
        return float(c[0]), float(c[1])
    if ptcount > 0:
        c = ptsum / ptcount
        return float(c[0]), float(c[1])
    return None


# ----------------------------------------------------------------------
# convex hull (Graham scan; collinear points dropped as in reference)
# ----------------------------------------------------------------------


def convex_hull(g: G.Geom) -> G.Geom:
    pts = np.unique(g.all_coords(), axis=0)
    if len(pts) == 0:
        return G.Geom.empty(G.GEOMETRYCOLLECTION)
    if len(pts) == 1:
        return G.Geom(G.POINT, pts[:1])
    if len(pts) == 2:
        return G.Geom(G.LINESTRING, pts)
    # Andrew's monotone chain (same hull set as Graham scan)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and (
                orientation_index(
                    out[-2][0], out[-2][1], out[-1][0], out[-1][1], p[0], p[1]
                )
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1] + [lower[0]])
    if len(ring) < 4:  # collinear input -> line
        return G.Geom(G.LINESTRING, np.array([pts[0], pts[-1]]))
    # emitted CCW; reference emits hull with CW shell after normalize —
    # comparisons use normalize() so orientation is canonicalized there
    return G.Geom(G.POLYGON, [ring])


# ----------------------------------------------------------------------
# Douglas-Peucker simplify
# ----------------------------------------------------------------------


def _dp_mask(coords: np.ndarray, tol: float) -> np.ndarray:
    n = len(coords)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = coords[j] - coords[i]
        seglen2 = seg @ seg
        sub = coords[i + 1 : j]
        if seglen2 == 0:
            d = np.hypot(*(sub - coords[i]).T)
        else:
            t = np.clip(((sub - coords[i]) @ seg) / seglen2, 0, 1)
            proj = coords[i] + t[:, None] * seg
            d = np.hypot(*(sub - proj).T)
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_dp(g: G.Geom, tol: float) -> G.Geom:
    if g.type_id == G.LINESTRING:
        if len(g.data) < 3:
            return g
        return G.Geom(G.LINESTRING, g.data[_dp_mask(g.data, tol)])
    if g.type_id == G.POLYGON:
        rings = []
        for r in g.data:
            s = r[_dp_mask(r, tol)]
            if len(s) >= 4:
                rings.append(s)
        if not rings or not len(rings) or (g.data and len(rings) == 0):
            return G.Geom.empty(G.POLYGON)
        return G.Geom(G.POLYGON, rings)
    if g.is_collection:
        return G.Geom(
            g.type_id, [simplify_dp(p, tol) for p in g.data]
        )
    return g


# ----------------------------------------------------------------------
# distance (min facet distance; DistanceOp semantics)
# ----------------------------------------------------------------------


def _seg_point_dist2(ax, ay, bx, by, px, py):
    """Vectorized point-to-segment squared distance."""
    dx = bx - ax
    dy = by - ay
    l2 = dx * dx + dy * dy
    t = np.where(l2 > 0, ((px - ax) * dx + (py - ay) * dy) / np.where(l2 == 0, 1, l2), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx = ax + t * dx
    cy = ay + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def _segments(g: G.Geom) -> np.ndarray:
    """All segments of a geometry as (k, 4) array [x1 y1 x2 y2]."""
    segs = []
    for p in g.geoms():
        if p.type_id == G.LINESTRING and len(p.data) > 1:
            segs.append(np.hstack([p.data[:-1], p.data[1:]]))
        elif p.type_id == G.POLYGON:
            for r in p.data:
                if len(r) > 1:
                    segs.append(np.hstack([r[:-1], r[1:]]))
    if not segs:
        return np.zeros((0, 4))
    return np.concatenate(segs)


def geom_distance(a: G.Geom, b: G.Geom) -> float:
    """Minimum distance. Zero if they intersect (area containment
    checked via PIP for polygon operands)."""
    from geos_spark.kernels.pip import EXTERIOR, PolygonPack, locate_points

    if a.is_empty or b.is_empty:
        return float("nan")

    # point sets
    pa = np.concatenate(
        [p.data for p in a.geoms() if p.type_id == G.POINT]
        + [np.zeros((0, 2))]
    )
    pb = np.concatenate(
        [p.data for p in b.geoms() if p.type_id == G.POINT]
        + [np.zeros((0, 2))]
    )
    sa = _segments(a)
    sb = _segments(b)
    best = np.inf

    # vertex sets for segment endpoints
    va = np.concatenate([pa, sa[:, :2], sa[:, 2:]]) if len(sa) else pa
    vb = np.concatenate([pb, sb[:, :2], sb[:, 2:]]) if len(sb) else pb

    # point/vertex to segment distances both directions
    if len(sb) and len(va):
        d2 = _seg_point_dist2(
            sb[None, :, 0], sb[None, :, 1], sb[None, :, 2], sb[None, :, 3],
            va[:, None, 0], va[:, None, 1],
        )
        best = min(best, float(np.sqrt(d2.min())))
    if len(sa) and len(vb):
        d2 = _seg_point_dist2(
            sa[None, :, 0], sa[None, :, 1], sa[None, :, 2], sa[None, :, 3],
            vb[:, None, 0], vb[:, None, 1],
        )
        best = min(best, float(np.sqrt(d2.min())))
    if len(va) and len(vb) and not len(sa) and not len(sb):
        d2 = (va[:, None, 0] - vb[None, :, 0]) ** 2 + (
            va[:, None, 1] - vb[None, :, 1]
        ) ** 2
        best = min(best, float(np.sqrt(d2.min())))

    # segment crossings -> distance 0 handled by seg-seg min distance
    # approximation: crossing detection via orientation
    if len(sa) and len(sb) and best > 0:
        from geos_spark.kernels.segments import segments_intersect_any

        if segments_intersect_any(sa, sb):
            return 0.0

    # containment: a point/vertex of one inside the other's area
    def _contains_any(poly_geom: G.Geom, pts: np.ndarray) -> bool:
        polys = [
            p for p in poly_geom.geoms() if p.type_id == G.POLYGON and p.data
        ]
        if not polys or not len(pts):
            return False
        pack = PolygonPack.from_rings([p.data for p in polys])
        npairs = len(pts) * len(polys)
        pt_i = np.repeat(np.arange(len(pts)), len(polys))
        pl_i = np.tile(np.arange(len(polys)), len(pts))
        loc = locate_points(pts, pack, pt_i, pl_i)
        del npairs
        return bool((loc != EXTERIOR).any())

    if best > 0:
        if _contains_any(a, vb) or _contains_any(b, va):
            return 0.0
    return best
