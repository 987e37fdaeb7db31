"""Minimum clearance (robustness measure of a geometry).

Reimplements the reference's ``precision::MinimumClearance``
(``src/precision/MinimumClearance.cpp``; capi ``geos_c.h.in:3446``):
the smallest positive distance between (a) two distinct vertices or
(b) a vertex and a segment it is not an endpoint of.  Geometries with
fewer than two distinct vertices have clearance
``numeric_limits<double>::max()`` and an EMPTY clearance line (the
corpus's expected values, ``TestMinimumClearance.xml``).

Brute-force O(V*S) over numpy buffers; the reference uses a facet
branch-and-bound which prunes the same candidate set — results are
identical, only search order differs (and the clearance LINE is
compared normalized, so pair orientation washes out).
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G

MAX_CLEARANCE = np.finfo(np.float64).max  # 1.7976931348623157E308


def _vertices_and_segments(g: G.Geom):
    vs = []
    segs = []
    for p in g.geoms():
        if p.type_id == G.POINT and len(p.data):
            vs.append(p.data)
        elif p.type_id == G.LINESTRING and len(p.data):
            vs.append(p.data)
            if len(p.data) > 1:
                segs.append(np.hstack([p.data[:-1], p.data[1:]]))
        elif p.type_id == G.POLYGON and p.data:
            for r in p.data:
                vs.append(r[:-1] if len(r) > 1 else r)
                if len(r) > 1:
                    segs.append(np.hstack([r[:-1], r[1:]]))
    v = np.concatenate(vs) if vs else np.zeros((0, 2))
    s = np.concatenate(segs) if segs else np.zeros((0, 4))
    keep = ~((s[:, 0] == s[:, 2]) & (s[:, 1] == s[:, 3]))
    return v, s[keep]


def _bnb_clearance(v: np.ndarray, s: np.ndarray):
    """Branch-and-bound facet search for the clearance pair on large
    inputs (the reference's FacetSequenceTreeBuilder approach,
    src/precision/MinimumClearance.cpp): best-first over
    envelope-distance lower bounds of (vertex-range, facet-range)
    pairs; exclusions (identical vertices, incident segments) only
    remove candidates, so envelope bounds stay valid. Returns
    (dist, p, q) with a witness pair, or None."""
    import heapq

    from geos_spark.kernels.facetdist import _env_dist, _env_of

    vseg = np.concatenate([v, v], axis=1)  # vertices as degenerate segs
    sides = [vseg, np.concatenate([vseg, s]) if len(s) else vseg]
    LEAF = 64
    envs: dict = {}

    def env(side, lo, hi):
        k = (side, lo, hi)
        e = envs.get(k)
        if e is None:
            e = _env_of(sides[side], lo, hi)
            envs[k] = e
        return e

    def leaf(alo, ahi, blo, bhi):
        """Min positive clearance between vertex block and facet
        block, excluding incident pairs. Returns (d, p, q) or None."""
        pv = v[alo:ahi]
        fb = sides[1][blo:bhi]
        x1, y1, x2, y2 = fb[:, 0], fb[:, 1], fb[:, 2], fb[:, 3]
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        px = pv[:, 0][:, None]
        py = pv[:, 1][:, None]
        r = np.where(
            len2 > 0,
            ((px - x1) * dx + (py - y1) * dy)
            / np.where(len2 > 0, len2, 1.0),
            0.0,
        )
        r = np.clip(r, 0.0, 1.0)
        cx = x1 + r * dx
        cy = y1 + r * dy
        d = np.hypot(px - cx, py - cy)
        endp = ((x1 == px) & (y1 == py)) | ((x2 == px) & (y2 == py))
        d = np.where(endp | (d <= 0.0), np.inf, d)
        k = np.argmin(d)
        i, j = np.unravel_index(k, d.shape)
        if not np.isfinite(d[i, j]):
            return None
        return (
            float(d[i, j]),
            (float(pv[i, 0]), float(pv[i, 1])),
            (float(cx[i, j]), float(cy[i, j])),
        )

    best = None
    heap = [
        (
            _env_dist(env(0, 0, len(v)), env(1, 0, len(sides[1]))),
            0,
            len(v),
            0,
            len(sides[1]),
        )
    ]
    while heap:
        lb, alo, ahi, blo, bhi = heapq.heappop(heap)
        if best is not None and lb >= best[0]:
            break
        na, nb = ahi - alo, bhi - blo
        if na <= LEAF and nb <= LEAF:
            r = leaf(alo, ahi, blo, bhi)
            if r is not None and (best is None or r[0] < best[0]):
                best = r
            continue
        if na >= nb:
            mid = (alo + ahi) // 2
            for lo2, hi2 in ((alo, mid), (mid, ahi)):
                if lo2 == hi2:
                    continue
                lb2 = _env_dist(env(0, lo2, hi2), env(1, blo, bhi))
                if best is None or lb2 < best[0]:
                    heapq.heappush(heap, (lb2, lo2, hi2, blo, bhi))
        else:
            mid = (blo + bhi) // 2
            for lo2, hi2 in ((blo, mid), (mid, bhi)):
                if lo2 == hi2:
                    continue
                lb2 = _env_dist(env(0, alo, ahi), env(1, lo2, hi2))
                if best is None or lb2 < best[0]:
                    heapq.heappush(heap, (lb2, alo, ahi, lo2, hi2))
    return best


def min_clearance(g: G.Geom):
    """-> (clearance: float, line: Geom LINESTRING)."""
    v, s = _vertices_and_segments(g)
    best = MAX_CLEARANCE
    line = G.Geom.empty(G.LINESTRING)
    n = len(v)
    if n * (n + len(s)) > 4_000_000:
        r = _bnb_clearance(v, s)
        if r is None:
            return MAX_CLEARANCE, G.Geom.empty(G.LINESTRING)
        d, p, q = r
        return d, G.Geom.linestring(np.array([p, q]))
    if n >= 2:
        for i in range(n):
            dx = v[i + 1:, 0] - v[i, 0]
            dy = v[i + 1:, 1] - v[i, 1]
            d = np.hypot(dx, dy)
            nz = d > 0.0
            if nz.any():
                k = np.argmin(np.where(nz, d, np.inf))
                if d[k] < best:
                    best = float(d[k])
                    line = G.Geom.linestring(
                        np.array([v[i], v[i + 1 + k]])
                    )
    if n and len(s):
        x1, y1, x2, y2 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
        dx = x2 - x1
        dy = y2 - y1
        len2 = dx * dx + dy * dy
        for i in range(n):
            px, py = v[i]
            # exclude segments having this vertex as an endpoint
            endp = ((x1 == px) & (y1 == py)) | ((x2 == px) & (y2 == py))
            r = ((px - x1) * dx + (py - y1) * dy) / len2
            r = np.clip(r, 0.0, 1.0)
            cx = x1 + r * dx
            cy = y1 + r * dy
            d = np.hypot(px - cx, py - cy)
            ok = (~endp) & (d > 0.0)
            if ok.any():
                k = np.argmin(np.where(ok, d, np.inf))
                if d[k] < best:
                    best = float(d[k])
                    line = G.Geom.linestring(
                        np.array([[px, py], [cx[k], cy[k]]])
                    )
    return best, line
