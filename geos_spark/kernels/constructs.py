"""Construction ops: minimum bounding circle, minimum diameter
(width), minimum rotated rectangle.

Faithful ports of the reference algorithms:
- ``MinimumBoundingCircle`` (``src/algorithm/MinimumBoundingCircle.cpp``):
  lowest-point / min-angle extremal search over the convex hull,
  2- or 3-point support set, circumcentre in plain doubles
  (``src/geom/Triangle.cpp:68-85``);
- ``MinimumDiameter`` (``src/algorithm/MinimumDiameter.cpp``):
  rotating-calipers max-perpendicular scan over the hull ring,
  rectangle from the minimal base segment's parallel/perpendicular
  support lines.
"""

from __future__ import annotations

import math

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.scalars import convex_hull


def _hull_pts(g: G.Geom) -> list:
    h = convex_hull(g)
    if h.is_empty:
        return []
    if h.type_id == G.POINT:
        return [(float(h.data[0, 0]), float(h.data[0, 1]))]
    if h.type_id == G.LINESTRING:
        return [(float(x), float(y)) for x, y in h.data]
    ring = h.data[0]
    return [(float(x), float(y)) for x, y in ring]


def _dist(a, b):
    return math.hypot(a[0] - b[0], a[1] - b[1])


def _is_obtuse(a, b, c) -> bool:
    """Angle::isObtuse — angle at b greater than pi/2."""
    dx0 = a[0] - b[0]
    dy0 = a[1] - b[1]
    dx1 = c[0] - b[0]
    dy1 = c[1] - b[1]
    return dx0 * dx1 + dy0 * dy1 < 0


def _angle_between(tip1, tail, tip2) -> float:
    a1 = math.atan2(tip1[1] - tail[1], tip1[0] - tail[0])
    a2 = math.atan2(tip2[1] - tail[1], tip2[0] - tail[0])
    d = a1 - a2
    if d <= -math.pi:
        d += 2 * math.pi
    if d > math.pi:
        d -= 2 * math.pi
    return abs(d)


def _circumcentre(p0, p1, p2):
    """Triangle::circumcentre (Triangle.cpp:68-85)."""
    cx, cy = p2
    ax = p0[0] - cx
    ay = p0[1] - cy
    bx = p1[0] - cx
    by = p1[1] - cy
    det = lambda m00, m01, m10, m11: m00 * m11 - m01 * m10
    denom = 2 * det(ax, ay, bx, by)
    numx = det(ay, ax * ax + ay * ay, by, bx * bx + by * by)
    numy = det(ax, ax * ax + ay * ay, bx, bx * bx + by * by)
    return (cx - numx / denom, cy + numy / denom)


def min_bounding_circle(g: G.Geom):
    """-> (centre (x, y) | None, radius, extremal points list)."""
    pts = _hull_pts(g)
    if not pts:
        return None, 0.0, []
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) <= 2:
        ext = pts
    else:
        # lowest point, then min-angle-with-x, then iterate
        P = min(pts, key=lambda p: p[1])

        def min_angle_x(P):
            best = None
            best_sin = math.inf
            for p in pts:
                if p == P:
                    continue
                dx = p[0] - P[0]
                dy = abs(p[1] - P[1])
                ln = math.hypot(dx, dy)
                s = dy / ln
                if s < best_sin:
                    best_sin = s
                    best = p
            return best

        Q = min_angle_x(P)
        ext = None
        for _ in range(len(pts)):
            best = None
            best_ang = math.inf
            for p in pts:
                if p == P or p == Q:
                    continue
                ang = _angle_between(P, p, Q)
                if ang < best_ang:
                    best_ang = ang
                    best = p
            R = best
            if R is None or _is_obtuse(P, R, Q):
                ext = [P, Q]
                break
            if _is_obtuse(R, P, Q):
                P = R
                continue
            if _is_obtuse(R, Q, P):
                Q = R
                continue
            ext = [P, Q, R]
            break
        if ext is None:
            ext = [P, Q]
    if len(ext) == 0:
        return None, 0.0, []
    if len(ext) == 1:
        return ext[0], 0.0, ext
    if len(ext) == 2:
        c = ((ext[0][0] + ext[1][0]) / 2.0, (ext[0][1] + ext[1][1]) / 2.0)
    else:
        c = _circumcentre(ext[0], ext[1], ext[2])
    return c, _dist(c, ext[0]), ext


def min_bounding_circle_geom(g: G.Geom, quad_segs: int = 8) -> G.Geom:
    """MinimumBoundingCircle::getCircle: centre buffered by radius."""
    from geos_spark.kernels.buffer import buffer_geom

    c, r, ext = min_bounding_circle(g)
    if c is None:
        return G.Geom(G.POLYGON, [])
    if r == 0.0:
        return G.Geom.point(c[0], c[1])
    return buffer_geom(G.Geom.point(c[0], c[1]), r, quad_segs=quad_segs)


def _perp_dist(seg0, seg1, p) -> float:
    dx = seg1[0] - seg0[0]
    dy = seg1[1] - seg0[1]
    ln = math.hypot(dx, dy)
    s = ((seg0[1] - p[1]) * dx - (seg0[0] - p[0]) * dy) / (ln * ln)
    return abs(s) * ln


def minimum_diameter(g: G.Geom):
    """-> (width, base segment (p0, p1), width point) —
    MinimumDiameter rotating calipers."""
    pts = _hull_pts(g)
    if not pts:
        return 0.0, None, None
    n = len(pts)
    if n == 1:
        return 0.0, (pts[0], pts[0]), pts[0]
    # ring form: closed; open sequences of 2-3 points are degenerate
    if pts[0] != pts[-1] or len(pts) <= 3:
        return 0.0, (pts[0], pts[1] if len(pts) > 1 else pts[0]), pts[0]
    min_width = math.inf
    min_base = None
    min_pt = None
    curr_max = 1
    npts = len(pts)
    for i in range(1, npts):
        seg0 = pts[i - 1]
        seg1 = pts[i]
        max_d = _perp_dist(seg0, seg1, pts[curr_max])
        next_d = max_d
        max_i = curr_max
        next_i = max_i
        start = curr_max
        while next_d >= max_d:
            max_d = next_d
            max_i = next_i
            next_i = (max_i + 1) % npts
            if next_i == start:
                break
            next_d = _perp_dist(seg0, seg1, pts[next_i])
        curr_max = max_i
        if max_d < min_width:
            min_width = max_d
            min_base = (seg0, seg1)
            min_pt = pts[max_i]
    return min_width, min_base, min_pt


def minimum_width_line(g: G.Geom) -> G.Geom:
    """GEOSMinimumWidth: segment from the base projection to the
    width point (MinimumDiameter::getDiameter)."""
    w, base, pt = minimum_diameter(g)
    if base is None:
        return G.Geom.empty(G.LINESTRING)
    (x0, y0), (x1, y1) = base
    dx = x1 - x0
    dy = y1 - y0
    ln2 = dx * dx + dy * dy
    if ln2 == 0:
        proj = base[0]
    else:
        r = ((pt[0] - x0) * dx + (pt[1] - y0) * dy) / ln2
        proj = (x0 + r * dx, y0 + r * dy)
    return G.Geom.linestring(np.array([proj, pt], dtype=np.float64))


def minimum_rotated_rectangle(g: G.Geom) -> G.Geom:
    """MinimumDiameter::getMinimumRectangle."""
    pts = _hull_pts(g)
    w, base, _pt = minimum_diameter(g)
    if base is None:
        return G.Geom(G.POLYGON, [])
    if w == 0.0:
        if base[0] == base[1]:
            return G.Geom.point(base[0][0], base[0][1])
        # maximum extent line through the degenerate hull
        lo = min(pts)
        hi = max(pts)
        return G.Geom.linestring(np.array([lo, hi], dtype=np.float64))
    dx = base[1][0] - base[0][0]
    dy = base[1][1] - base[0][1]

    def compute_c(a, b, p):
        return a * p[1] - b * p[0]

    paras = [compute_c(dx, dy, p) for p in pts]
    perps = [compute_c(-dy, dx, p) for p in pts]
    min_para, max_para = min(paras), max(paras)
    min_perp, max_perp = min(perps), max(perps)

    def line_for(a, b, c):
        # segment of the line a*x + b*y = c (computeSegmentForLine)
        if abs(b) > abs(a):
            return ((0.0, c / b), (1.0, c / b - a / b))
        return ((c / a, 0.0), (c / a - b / a, 1.0))

    def line_int(l1, l2):
        (x1, y1), (x2, y2) = l1
        (x3, y3), (x4, y4) = l2
        den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
        px = (
            (x1 * y2 - y1 * x2) * (x3 - x4)
            - (x1 - x2) * (x3 * y4 - y3 * x4)
        ) / den
        py = (
            (x1 * y2 - y1 * x2) * (y3 - y4)
            - (y1 - y2) * (x3 * y4 - y3 * x4)
        ) / den
        return (px, py)

    max_perp_line = line_for(-dx, -dy, max_perp)
    min_perp_line = line_for(-dx, -dy, min_perp)
    max_para_line = line_for(-dy, dx, max_para)
    min_para_line = line_for(-dy, dx, min_para)
    p0 = line_int(max_para_line, max_perp_line)
    p1 = line_int(min_para_line, max_perp_line)
    p2 = line_int(min_para_line, min_perp_line)
    p3 = line_int(max_para_line, min_perp_line)
    ring = np.array([p0, p1, p2, p3, p0], dtype=np.float64)
    return G.Geom(G.POLYGON, [ring])
