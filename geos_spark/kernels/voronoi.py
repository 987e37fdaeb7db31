"""Voronoi diagram of a point set.

Matches ``src/triangulate/VoronoiDiagramBuilder.cpp`` semantics: the
diagram envelope is the site envelope expanded by its larger dimension
(plus any user clip envelope), and every cell is clipped to it. The
cells themselves are computed by direct half-plane intersection
(each cell = the envelope rectangle cut by the perpendicular-bisector
half-plane against every other site) instead of walking a quad-edge
subdivision — the resulting polygons are mathematically identical.
O(n^2) per diagram; this runs per-group inside a pandas UDF, the
distributed axis is the group count.
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G


def _clip_halfplane(poly: list, a, b) -> list:
    """Sutherland-Hodgman clip of polygon (open vertex list) by the
    half-plane of points closer to ``a`` than ``b``."""
    nx = b[0] - a[0]
    ny = b[1] - a[1]
    mx = (a[0] + b[0]) / 2.0
    my = (a[1] + b[1]) / 2.0

    def side(p) -> float:
        # negative = closer to a
        return (p[0] - mx) * nx + (p[1] - my) * ny

    out = []
    n = len(poly)
    for i in range(n):
        p = poly[i]
        q = poly[(i + 1) % n]
        sp, sq = side(p), side(q)
        if sp <= 0:
            out.append(p)
        if (sp < 0) != (sq < 0) and sp != sq:
            t = sp / (sp - sq)
            out.append(
                (p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1]))
            )
    return out


def voronoi_cells(points: np.ndarray, clip_env=None):
    """-> (cells, sites): cell polygons (open vertex lists) for each
    unique site, clipped to the diagram envelope."""
    sites = np.unique(
        np.asarray(points, dtype=np.float64).reshape(-1, 2), axis=0
    )
    if len(sites) < 2:
        # a diagram needs >= 2 sites (the reference returns an empty
        # collection for a single site)
        return [], sites[:0]
    x0, y0 = sites.min(axis=0)
    x1, y1 = sites.max(axis=0)
    expand = max(x1 - x0, y1 - y0)
    if expand == 0:
        expand = 1.0
    ex0, ey0, ex1, ey1 = (
        x0 - expand, y0 - expand, x1 + expand, y1 + expand
    )
    if clip_env is not None:
        cx0, cy0, cx1, cy1 = clip_env
        ex0, ey0 = min(ex0, cx0), min(ey0, cy0)
        ex1, ey1 = max(ex1, cx1), max(ey1, cy1)
    rect = [(ex0, ey0), (ex1, ey0), (ex1, ey1), (ex0, ey1)]
    cells = []
    for i in range(len(sites)):
        s = (float(sites[i, 0]), float(sites[i, 1]))
        cell = rect
        # prune with distance ordering: nearer sites cut more
        order = np.argsort(
            (sites[:, 0] - s[0]) ** 2 + (sites[:, 1] - s[1]) ** 2
        )
        for j in order:
            if j == i or not cell:
                continue
            t = (float(sites[j, 0]), float(sites[j, 1]))
            cell = _clip_halfplane(cell, s, t)
        cells.append(cell)
    return cells, sites


def voronoi_diagram(g: G.Geom, tolerance: float = 0.0) -> G.Geom:
    """GEOSVoronoiDiagram (edges=0): GEOMETRYCOLLECTION of cell
    polygons over the input's unique vertices, clipped to the
    expanded diagram envelope."""
    cells, _ = voronoi_cells(g.all_coords())
    polys = []
    for c in cells:
        if len(c) < 3:
            continue
        ring = np.array(c + [c[0]], dtype=np.float64)
        polys.append(G.Geom(G.POLYGON, [ring]))
    return G.Geom.collection(G.GEOMETRYCOLLECTION, polys)


def voronoi_edges(g: G.Geom, tolerance: float = 0.0) -> G.Geom:
    """GEOSVoronoiDiagram (edges=1): the interior bisector edges (an
    edge belongs to the diagram iff two cells share it — envelope
    border pieces appear in only one cell and are dropped)."""
    cells, _ = voronoi_cells(g.all_coords())
    count: dict = {}
    first: dict = {}
    for c in cells:
        n = len(c)
        for i in range(n):
            p, q = c[i], c[(i + 1) % n]
            key = tuple(
                round(v, 6) for pt in (min(p, q), max(p, q)) for v in pt
            )
            count[key] = count.get(key, 0) + 1
            if key not in first:
                first[key] = (p, q)
    lines = [
        G.Geom(
            G.LINESTRING, np.array(first[k], dtype=np.float64)
        )
        for k, n in count.items()
        if n >= 2
    ]
    return G.Geom(G.MULTILINESTRING, lines)
