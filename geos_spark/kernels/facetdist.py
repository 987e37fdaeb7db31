"""Indexed facet distance (branch-and-bound).

Reimplements IndexedFacetDistance semantics
(src/operation/distance/IndexedFacetDistance.cpp:32-57,
src/index/strtree/... FacetSequenceTreeBuilder): facets (segments and
isolated points) are packed in sequence order — spatially coherent
for linework — and the minimum distance between two facet sets is
found by best-first search over envelope-distance lower bounds,
bisecting facet ranges until leaf blocks are compared exactly
(vectorized).  Exact result, sub-quadratic work on large linework
(the brute pair matrix is O(V·S)).
"""

from __future__ import annotations

import heapq

import numpy as np

_LEAF = 32


def _env_of(s: np.ndarray, lo: int, hi: int):
    seg = s[lo:hi]
    return (
        float(np.minimum(seg[:, 0], seg[:, 2]).min()),
        float(np.minimum(seg[:, 1], seg[:, 3]).min()),
        float(np.maximum(seg[:, 0], seg[:, 2]).max()),
        float(np.maximum(seg[:, 1], seg[:, 3]).max()),
    )


def _env_dist(ea, eb) -> float:
    dx = max(0.0, max(ea[0], eb[0]) - min(ea[2], eb[2]))
    dy = max(0.0, max(ea[1], eb[1]) - min(ea[3], eb[3]))
    return float(np.hypot(dx, dy))


def _seg_point_d2(s: np.ndarray, px: np.ndarray, py: np.ndarray):
    """(n_seg, n_pt) squared point-to-segment distances."""
    x1, y1, x2, y2 = (
        s[:, 0][:, None],
        s[:, 1][:, None],
        s[:, 2][:, None],
        s[:, 3][:, None],
    )
    dx, dy = x2 - x1, y2 - y1
    len2 = dx * dx + dy * dy
    t = np.where(
        len2 > 0,
        ((px[None, :] - x1) * dx + (py[None, :] - y1) * dy)
        / np.where(len2 > 0, len2, 1.0),
        0.0,
    )
    t = np.clip(t, 0.0, 1.0)
    qx = x1 + t * dx
    qy = y1 + t * dy
    return (qx - px[None, :]) ** 2 + (qy - py[None, :]) ** 2


def _leaf_dist(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact min distance between two small facet blocks."""
    from geos_spark.kernels.segments import segments_intersect_any

    if segments_intersect_any(sa, sb):
        return 0.0
    va = np.concatenate([sa[:, :2], sa[:, 2:]])
    vb = np.concatenate([sb[:, :2], sb[:, 2:]])
    d2 = _seg_point_d2(sb, va[:, 0], va[:, 1]).min()
    d2 = min(d2, _seg_point_d2(sa, vb[:, 0], vb[:, 1]).min())
    return float(np.sqrt(d2))


def facet_min_dist(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact minimum distance between two facet arrays ((n,4) segment
    rows; points as degenerate segments), best-first branch and
    bound."""
    if len(sa) == 0 or len(sb) == 0:
        return float("inf")
    envs: dict = {}

    def env(side, s, lo, hi):
        k = (side, lo, hi)
        v = envs.get(k)
        if v is None:
            v = _env_of(s, lo, hi)
            envs[k] = v
        return v

    best = float("inf")
    ea = env(0, sa, 0, len(sa))
    eb = env(1, sb, 0, len(sb))
    heap = [(_env_dist(ea, eb), 0, len(sa), 0, len(sb))]
    while heap:
        lb, alo, ahi, blo, bhi = heapq.heappop(heap)
        if lb >= best:
            break
        na, nb = ahi - alo, bhi - blo
        if na <= _LEAF and nb <= _LEAF:
            d = _leaf_dist(sa[alo:ahi], sb[blo:bhi])
            if d < best:
                best = d
                if best == 0.0:
                    break
            continue
        # split the larger range
        if na >= nb:
            mid = (alo + ahi) // 2
            for lo2, hi2 in ((alo, mid), (mid, ahi)):
                lb2 = _env_dist(
                    env(0, sa, lo2, hi2), env(1, sb, blo, bhi)
                )
                if lb2 < best:
                    heapq.heappush(heap, (lb2, lo2, hi2, blo, bhi))
        else:
            mid = (blo + bhi) // 2
            for lo2, hi2 in ((blo, mid), (mid, bhi)):
                lb2 = _env_dist(
                    env(0, sa, alo, ahi), env(1, sb, lo2, hi2)
                )
                if lb2 < best:
                    heapq.heappush(heap, (lb2, alo, ahi, lo2, hi2))
    return best


def facets_of(g) -> np.ndarray:
    """Facet array of a geometry: its segments plus isolated points
    as degenerate segments."""
    from geos_spark.kernels import geom as G
    from geos_spark.kernels.scalars import _segments

    s = _segments(g)
    pts = [p.data for p in g.geoms() if p.type_id == G.POINT]
    if pts:
        pa = np.concatenate(pts).reshape(-1, 2)
        degen = np.concatenate([pa, pa], axis=1)
        s = np.concatenate([s, degen]) if len(s) else degen
    return s
