"""Double-double (DD) arithmetic + robust segment intersection point.

Bit-faithful reimplementation of the reference's extended-precision
pipeline for computing noded intersection coordinates:

- DD add/sub/mul/div follow ``src/math/DD.cpp:65-200`` operation-for-
  operation (SPLIT = 2^27+1, ``include/geos/math/DD.h:110``); Python
  floats are IEEE doubles with the same rounding, so results are
  identical bit-for-bit.
- ``dd_intersection`` follows ``CGAlgorithmsDD::intersection``
  (``src/algorithm/CGAlgorithmsDD.cpp:116-155``): homogeneous-
  coordinate cross products in DD, one rounding at the final divide.
- ``segment_intersection_point`` follows ``LineIntersector``
  (``include/geos/algorithm/LineIntersector.h:525-608``): DD point,
  nearest-endpoint fallback when the computed point is non-finite or
  escapes the segment envelopes; endpoint/collinear touches return the
  original endpoint coordinate exactly (RobustLineIntersector rules).

Scalar python (not vectorized): called only for the handful of
crossing pairs a geometry pair produces during overlay noding.
"""

from __future__ import annotations

import math

_SPLIT = 134217729.0  # 2^27 + 1


class DD:
    """Double-double value; ops mirror src/math/DD.cpp exactly."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi: float = 0.0, lo: float = 0.0):
        self.hi = hi
        self.lo = lo

    def add(self, y: "DD") -> "DD":
        hi, lo, yhi, ylo = self.hi, self.lo, y.hi, y.lo
        S = hi + yhi
        T = lo + ylo
        e = S - hi
        f = T - lo
        s = S - e
        t = T - f
        s = (yhi - e) + (hi - s)
        t = (ylo - f) + (lo - t)
        e = s + T
        H = S + e
        h = e + (S - H)
        e = t + h
        zhi = H + e
        zlo = e + (H - zhi)
        return DD(zhi, zlo)

    def sub(self, y: "DD") -> "DD":
        return self.add(DD(-1 * y.hi, -1 * y.lo))

    def mul(self, y: "DD") -> "DD":
        hi, lo, yhi, ylo = self.hi, self.lo, y.hi, y.lo
        C = _SPLIT * hi
        hx = C - hi
        c = _SPLIT * yhi
        hx = C - hx
        tx = hi - hx
        hy = c - yhi
        C = hi * yhi
        hy = c - hy
        ty = yhi - hy
        c = ((((hx * hy - C) + hx * ty) + tx * hy) + tx * ty) + (
            hi * ylo + lo * yhi
        )
        zhi = C + c
        hx = C - zhi
        zlo = c + hx
        return DD(zhi, zlo)

    def div(self, y: "DD") -> "DD":
        hi, lo, yhi, ylo = self.hi, self.lo, y.hi, y.lo
        C = hi / yhi
        c = _SPLIT * C
        hc = c - C
        u = _SPLIT * yhi
        hc = c - hc
        tc = C - hc
        hy = u - yhi
        U = C * yhi
        hy = u - hy
        ty = yhi - hy
        u = (((hc * hy - U) + hc * ty) + tc * hy) + tc * ty
        c = ((((hi - U) - u) + lo) - C * ylo) / yhi
        u = C + c
        return DD(u, (C - u) + c)

    def to_double(self) -> float:
        return self.hi + self.lo


def dd_intersection(p1, p2, q1, q2):
    """Line-line intersection in DD homogeneous coordinates.

    Returns (x, y) or None when non-finite (parallel / degenerate).
    Mirrors CGAlgorithmsDD::intersection.
    """
    p1x, p1y = DD(p1[0]), DD(p1[1])
    p2x, p2y = DD(p2[0]), DD(p2[1])
    q1x, q1y = DD(q1[0]), DD(q1[1])
    q2x, q2y = DD(q2[0]), DD(q2[1])

    px = p1y.sub(p2y)
    py = p2x.sub(p1x)
    pw = p1x.mul(p2y).sub(p2x.mul(p1y))

    qx = q1y.sub(q2y)
    qy = q2x.sub(q1x)
    qw = q1x.mul(q2y).sub(q2x.mul(q1y))

    x = py.mul(qw).sub(qy.mul(pw))
    y = qx.mul(pw).sub(px.mul(qw))
    w = px.mul(qy).sub(qx.mul(py))

    x_int = x.div(w).to_double()
    y_int = y.div(w).to_double()
    if not (math.isfinite(x_int) and math.isfinite(y_int)):
        return None
    return (x_int, y_int)


def _point_to_segment(p, a, b) -> float:
    """Distance::pointToSegment (src/algorithm/Distance.h semantics)."""
    if a[0] == b[0] and a[1] == b[1]:
        return math.hypot(p[0] - a[0], p[1] - a[1])
    dx = b[0] - a[0]
    dy = b[1] - a[1]
    len2 = dx * dx + dy * dy
    r = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / len2
    if r <= 0.0:
        return math.hypot(p[0] - a[0], p[1] - a[1])
    if r >= 1.0:
        return math.hypot(p[0] - b[0], p[1] - b[1])
    s = ((a[1] - p[1]) * dx - (a[0] - p[0]) * dy) / len2
    return abs(s) * math.sqrt(len2)


def nearest_endpoint(p1, p2, q1, q2):
    """LineIntersector::nearestEndpoint (LineIntersector.cpp:217-238)."""
    nearest = p1
    min_dist = _point_to_segment(p1, q1, q2)
    d = _point_to_segment(p2, q1, q2)
    if d < min_dist:
        min_dist = d
        nearest = p2
    d = _point_to_segment(q1, p1, p2)
    if d < min_dist:
        min_dist = d
        nearest = q1
    d = _point_to_segment(q2, p1, p2)
    if d < min_dist:
        nearest = q2
    return (float(nearest[0]), float(nearest[1]))


def _in_segment_envelopes(pt, p1, p2, q1, q2) -> bool:
    x, y = pt
    return (
        min(p1[0], p2[0]) <= x <= max(p1[0], p2[0])
        and min(p1[1], p2[1]) <= y <= max(p1[1], p2[1])
        and min(q1[0], q2[0]) <= x <= max(q1[0], q2[0])
        and min(q1[1], q2[1]) <= y <= max(q1[1], q2[1])
    )


def segment_intersection_point(p1, p2, q1, q2, o1, o2, o3, o4):
    """Single intersection point of two segments classified POINT.

    ``o1..o4`` are the robust orientation signs (q1 vs p, q2 vs p,
    p1 vs q, p2 vs q) already computed by the caller's classifier.
    Endpoint-touch cases return the touching endpoint's original
    coordinates (RobustLineIntersector endpoint rules); proper
    crossings use the DD computation with the nearest-endpoint
    robustness fallback.
    """
    p1 = (float(p1[0]), float(p1[1]))
    p2 = (float(p2[0]), float(p2[1]))
    q1 = (float(q1[0]), float(q1[1]))
    q2 = (float(q2[0]), float(q2[1]))
    if o1 != 0 and o2 != 0 and o3 != 0 and o4 != 0:
        pt = dd_intersection(p1, p2, q1, q2)
        if pt is None or not _in_segment_envelopes(pt, p1, p2, q1, q2):
            pt = nearest_endpoint(p1, p2, q1, q2)
        return pt
    # non-proper: some endpoint lies on the other segment
    if q1 == p1 or q1 == p2:
        return q1
    if q2 == p1 or q2 == p2:
        return q2
    if o1 == 0:
        return q1
    if o2 == 0:
        return q2
    if o3 == 0:
        return p1
    return p2
