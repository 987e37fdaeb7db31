"""Discrete Hausdorff and Fréchet distances.

Ports of ``src/algorithm/distance/DiscreteHausdorffDistance.cpp``
(max over A's (optionally densified) vertices of the min distance to
B's facets, oriented both ways) and ``DiscreteFrechetDistance.cpp``
(coupled-traversal DP over the (optionally densified) coordinate
sequences, point-to-point distances)."""

from __future__ import annotations

import math

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.dd import _point_to_segment


def _all_coords(g: G.Geom) -> list:
    out = []
    for p in g.geoms():
        if p.type_id in (G.POINT, G.LINESTRING):
            out.extend((float(x), float(y)) for x, y in p.data)
        elif p.type_id == G.POLYGON:
            for r in p.data:
                out.extend((float(x), float(y)) for x, y in r)
    return out


def _facets(g: G.Geom):
    segs = []
    pts = []
    for p in g.geoms():
        if p.type_id == G.POINT and len(p.data):
            pts.append((float(p.data[0, 0]), float(p.data[0, 1])))
        elif p.type_id == G.LINESTRING and len(p.data) > 1:
            c = p.data
            segs.append(np.hstack([c[:-1], c[1:]]))
        elif p.type_id == G.POLYGON:
            for r in p.data:
                if len(r) > 1:
                    segs.append(np.hstack([r[:-1], r[1:]]))
    return (np.concatenate(segs) if segs else np.zeros((0, 4)), pts)


def _pt_to_geom(p, segs, pts) -> float:
    best = math.inf
    for s in segs:
        d = _point_to_segment(p, (s[0], s[1]), (s[2], s[3]))
        if d < best:
            best = d
    for q in pts:
        d = math.hypot(p[0] - q[0], p[1] - q[1])
        if d < best:
            best = d
    return best


def _densify_vertices(g: G.Geom, frac: float) -> list:
    out = []
    n = int(round(1.0 / frac))
    for p in g.geoms():
        if p.type_id == G.POINT and len(p.data):
            out.append((float(p.data[0, 0]), float(p.data[0, 1])))
        else:
            rings = (
                [p.data]
                if p.type_id == G.LINESTRING
                else (p.data if p.type_id == G.POLYGON else [])
            )
            for c in rings:
                for i in range(len(c) - 1):
                    for j in range(n):
                        t = j / n
                        out.append(
                            (
                                c[i, 0] + t * (c[i + 1, 0] - c[i, 0]),
                                c[i, 1] + t * (c[i + 1, 1] - c[i, 1]),
                            )
                        )
                if len(c):
                    out.append((float(c[-1, 0]), float(c[-1, 1])))
    return out


def hausdorff_distance(
    a: G.Geom, b: G.Geom, densify: float | None = None
) -> float:
    """DiscreteHausdorffDistance::distance (symmetric)."""

    def oriented(x, y):
        segs, pts = _facets(y)
        vx = (
            _densify_vertices(x, densify)
            if densify
            else _all_coords(x)
        )
        worst = 0.0
        for p in vx:
            d = _pt_to_geom(p, segs, pts)
            if d > worst:
                worst = d
        return worst

    return max(oriented(a, b), oriented(b, a))


def frechet_distance(
    a: G.Geom, b: G.Geom, densify: float | None = None
) -> float:
    """DiscreteFrechetDistance::distance."""
    if a.is_empty or b.is_empty:
        raise ValueError("Fréchet distance of empty geometry")
    pa = _all_coords(a)
    pb = _all_coords(b)

    def seq(pts):
        if not densify:
            return pts
        n = int(round(1.0 / densify))
        out = []
        total = (len(pts) - 1) * n + 1 if len(pts) > 1 else 1
        for idx in range(total):
            i, j = divmod(idx, n)
            if i >= len(pts) - 1:
                out.append(pts[-1])
                continue
            p0, p1 = pts[i], pts[i + 1]
            out.append(
                (
                    p0[0] + j * (p1[0] - p0[0]) / n,
                    p0[1] + j * (p1[1] - p0[1]) / n,
                )
            )
        return out

    P = seq(pa)
    Q = seq(pb)
    npx, nq = len(P), len(Q)
    Pa = np.asarray(P)
    Qa = np.asarray(Q)
    # pairwise point distances, DP for the coupled traversal
    d = np.hypot(
        Pa[:, None, 0] - Qa[None, :, 0], Pa[:, None, 1] - Qa[None, :, 1]
    )
    ca = np.empty((npx, nq))
    ca[0, 0] = d[0, 0]
    for i in range(1, npx):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
    for j in range(1, nq):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, npx):
        for j in range(1, nq):
            ca[i, j] = max(
                min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]), d[i, j]
            )
    return float(ca[-1, -1])
