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


def min_clearance(g: G.Geom):
    """-> (clearance: float, line: Geom LINESTRING)."""
    v, s = _vertices_and_segments(g)
    best = MAX_CLEARANCE
    line = G.Geom.empty(G.LINESTRING)
    n = len(v)
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
