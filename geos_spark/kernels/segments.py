"""Robust segment-segment intersection kernel.

Semantics follow GEOS ``LineIntersector``
(``src/algorithm/LineIntersector.cpp``; outcomes NO / POINT /
COLLINEAR per ``include/geos/algorithm/LineIntersector.h:139-145``)
via orientation tests: segments properly cross iff each straddles the
other's line; touching/collinear-overlap cases are detected with
orientation zeros plus envelope overlap.
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels.orientation import orientation_index

NO_INTERSECTION = 0
POINT_INTERSECTION = 1
COLLINEAR_INTERSECTION = 2


def _env_overlap(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise envelope-overlap mask for (n,4) x (n,4) aligned segs."""
    ax0 = np.minimum(a[:, 0], a[:, 2])
    ax1 = np.maximum(a[:, 0], a[:, 2])
    ay0 = np.minimum(a[:, 1], a[:, 3])
    ay1 = np.maximum(a[:, 1], a[:, 3])
    bx0 = np.minimum(b[:, 0], b[:, 2])
    bx1 = np.maximum(b[:, 0], b[:, 2])
    by0 = np.minimum(b[:, 1], b[:, 3])
    by1 = np.maximum(b[:, 1], b[:, 3])
    return (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)


def intersect_pairs(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """Classify aligned pairs of segments (both (n,4) [x1 y1 x2 y2]).

    Returns (n,) uint8: 0 = none, 1 = point, 2 = collinear overlap.
    Touching at an endpoint counts as POINT (as in the reference).
    """
    n = len(sa)
    out = np.zeros(n, dtype=np.uint8)
    if n == 0:
        return out
    env = _env_overlap(sa, sb)
    if not env.any():
        return out
    i = np.flatnonzero(env)
    a1x, a1y, a2x, a2y = sa[i, 0], sa[i, 1], sa[i, 2], sa[i, 3]
    b1x, b1y, b2x, b2y = sb[i, 0], sb[i, 1], sb[i, 2], sb[i, 3]
    # orientation of each b endpoint vs segment a, and vice versa
    o1 = orientation_index(a1x, a1y, a2x, a2y, b1x, b1y).astype(np.int8)
    o2 = orientation_index(a1x, a1y, a2x, a2y, b2x, b2y).astype(np.int8)
    o3 = orientation_index(b1x, b1y, b2x, b2y, a1x, a1y).astype(np.int8)
    o4 = orientation_index(b1x, b1y, b2x, b2y, a2x, a2y).astype(np.int8)

    straddle = (o1 * o2 <= 0) & (o3 * o4 <= 0)
    collinear = (o1 == 0) & (o2 == 0)  # (with env overlap) same line
    res = np.zeros(len(i), dtype=np.uint8)
    res[straddle] = POINT_INTERSECTION
    if collinear.any():
        # overlap of projections: envelope test already passed; decide
        # overlap (shared extent) vs single-point touch
        c = np.flatnonzero(collinear)
        ax0 = np.minimum(a1x[c], a2x[c])
        ax1 = np.maximum(a1x[c], a2x[c])
        bx0 = np.minimum(b1x[c], b2x[c])
        bx1 = np.maximum(b1x[c], b2x[c])
        ay0 = np.minimum(a1y[c], a2y[c])
        ay1 = np.maximum(a1y[c], a2y[c])
        by0 = np.minimum(b1y[c], b2y[c])
        by1 = np.maximum(b1y[c], b2y[c])
        ox = np.minimum(ax1, bx1) - np.maximum(ax0, bx0)
        oy = np.minimum(ay1, by1) - np.maximum(ay0, by0)
        overlap = (ox > 0) | (oy > 0)
        res[c[overlap]] = COLLINEAR_INTERSECTION
        res[c[~overlap]] = POINT_INTERSECTION
    out[i] = res
    return out


def intersect_matrix(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """All-pairs classification: (len(sa), len(sb)) uint8 matrix.

    Used on small (oracle/test) inputs; the distributed path blocks
    candidate pairs by Hilbert cell before calling this.
    """
    na, nb = len(sa), len(sb)
    if na == 0 or nb == 0:
        return np.zeros((na, nb), dtype=np.uint8)
    ia = np.repeat(np.arange(na), nb)
    ib = np.tile(np.arange(nb), na)
    return intersect_pairs(sa[ia], sb[ib]).reshape(na, nb)


def segments_intersect_any(sa: np.ndarray, sb: np.ndarray) -> bool:
    """True iff any segment of a intersects any segment of b."""
    # block to bound memory on larger inputs
    BLOCK = 512
    for i in range(0, len(sa), BLOCK):
        ca = sa[i : i + BLOCK]
        for j in range(0, len(sb), BLOCK):
            cb = sb[j : j + BLOCK]
            if intersect_matrix(ca, cb).any():
                return True
    return False


def intersection_points(sa: np.ndarray, sb: np.ndarray):
    """Proper + endpoint intersection points for all crossing pairs.

    Returns (pts (k,2), ia (k,), ib (k,)) for pairs classified POINT.
    Intersection coordinates computed with the reference's
    normalized-determinant form (LineIntersector::intersection).
    Collinear overlaps are NOT returned here (callers handle dim-1
    overlaps separately).
    """
    na, nb = len(sa), len(sb)
    if na == 0 or nb == 0:
        return np.zeros((0, 2)), np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    ia = np.repeat(np.arange(na), nb)
    ib = np.tile(np.arange(nb), na)
    cls = intersect_pairs(sa[ia], sb[ib])
    m = cls == POINT_INTERSECTION
    ia, ib = ia[m], ib[m]
    A, B = sa[ia], sb[ib]
    x1, y1, x2, y2 = A[:, 0], A[:, 1], A[:, 2], A[:, 3]
    x3, y3, x4, y4 = B[:, 0], B[:, 1], B[:, 2], B[:, 3]
    denom = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
    pts = np.empty((len(ia), 2))
    nz = denom != 0
    t = np.zeros(len(ia))
    t[nz] = (
        (x3[nz] - x1[nz]) * (y4[nz] - y3[nz])
        - (y3[nz] - y1[nz]) * (x4[nz] - x3[nz])
    ) / denom[nz]
    pts[:, 0] = x1 + t * (x2 - x1)
    pts[:, 1] = y1 + t * (y2 - y1)
    # endpoint-touch pairs with zero denominator (collinear point touch):
    # snap to the shared endpoint
    if (~nz).any():
        for k in np.flatnonzero(~nz):
            a_pts = [(x1[k], y1[k]), (x2[k], y2[k])]
            b_pts = {(x3[k], y3[k]), (x4[k], y4[k])}
            shared = [p for p in a_pts if p in b_pts]
            if shared:
                pts[k] = shared[0]
    # snap near-endpoint results exactly onto endpoints (reference
    # nearest-endpoint snapping)
    return pts, ia, ib


def segment_intersection(
    ax0: float, ay0: float, ax1: float, ay1: float,
    bx0: float, by0: float, bx1: float, by1: float,
):
    """GEOSSegmentIntersection (capi geos_ts_c.cpp:4455-4474,
    LineSegment::intersection): the intersection point of two
    segments, or None when they do not intersect.  Collinear
    overlaps return the LineIntersector's first stored point
    (RobustLineIntersector::computeCollinearIntersection order)."""
    sa = np.array([[ax0, ay0, ax1, ay1]], dtype=np.float64)
    sb = np.array([[bx0, by0, bx1, by1]], dtype=np.float64)
    cls = int(intersect_pairs(sa, sb)[0])
    if cls == 0:
        return None
    if cls == POINT_INTERSECTION:
        pts, _, _ = intersection_points(sa, sb)
        return float(pts[0, 0]), float(pts[0, 1])
    # collinear overlap: first point per computeCollinearIntersection
    p1, p2 = (ax0, ay0), (ax1, ay1)
    q1, q2 = (bx0, by0), (bx1, by1)

    def covers(s0, s1, p):
        return (
            min(s0[0], s1[0]) <= p[0] <= max(s0[0], s1[0])
            and min(s0[1], s1[1]) <= p[1] <= max(s0[1], s1[1])
        )

    if covers(p1, p2, q1) and covers(p1, p2, q2):
        return q1
    if covers(q1, q2, p1) and covers(q1, q2, p2):
        return p1
    if covers(p1, p2, q1):
        return q1
    if covers(p1, p2, q2):
        return q2
    return p1
