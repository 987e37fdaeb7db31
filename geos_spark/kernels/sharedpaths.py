"""Shared-paths extraction between lineal geometries.

Re-derivation of ``src/operation/sharedpaths/SharedPathsOp.cpp``:
linear components of the overlay intersection, classified by whether
the path runs the same direction along both inputs (``isForward`` via
linear referencing of two probe points at 10% / 90% of the path's
first segment, SharedPathsOp.cpp:126-160). Output matches
GEOSSharedPaths (capi geos_ts_c.cpp:4228): GEOMETRYCOLLECTION of
(MULTILINESTRING same-direction, MULTILINESTRING opposite).
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G


def _check_lineal(g: G.Geom) -> None:
    for p in g.geoms():
        if p.type_id != G.LINESTRING:
            raise ValueError("Geometry is not lineal")


def _index_of_point(g: G.Geom, p) -> tuple[int, float]:
    """LocationIndexOfPoint::indexOf — (component, length-along) of
    the nearest location on the lineal geometry."""
    from geos_spark.kernels.linear import project
    from geos_spark.kernels.relate import _line_parts

    best = (0, 0.0)
    best_d = np.inf
    for ci, c in enumerate(_line_parts(g)):
        # nearest distance + arc index on this component
        x, y = p
        along = project(c, x, y)
        # recompute the achieved distance at that arc index
        acc = 0.0
        q = c[0]
        for i in range(len(c) - 1):
            a, b = c[i], c[i + 1]
            seg = float(np.hypot(*(b - a)))
            if along <= acc + seg or i == len(c) - 2:
                t = 0.0 if seg == 0 else min(max((along - acc) / seg, 0.0), 1.0)
                q = a + t * (b - a)
                break
            acc += seg
        d = float(np.hypot(q[0] - x, q[1] - y))
        if d < best_d:
            best_d = d
            best = (ci, float(along))
    return best


def _is_forward(edge: np.ndarray, g: G.Geom) -> bool:
    p1 = edge[0]
    p2 = edge[1]
    pt1i = (p1[0] + 0.1 * (p2[0] - p1[0]), p1[1] + 0.1 * (p2[1] - p1[1]))
    pt2i = (p1[0] + 0.9 * (p2[0] - p1[0]), p1[1] + 0.9 * (p2[1] - p1[1]))
    return _index_of_point(g, pt1i) < _index_of_point(g, pt2i)


def shared_paths(g1: G.Geom, g2: G.Geom) -> G.Geom:
    """GEOSSharedPaths: GC(same-direction MLS, opposite MLS)."""
    from geos_spark.kernels import overlay as OV

    _check_lineal(g1)
    _check_lineal(g2)
    inter = OV.overlay_robust(g1, g2, OV.INTERSECTION)
    same: list[G.Geom] = []
    opp: list[G.Geom] = []
    for part in inter.geoms():
        if part.type_id != G.LINESTRING or len(part.data) < 2:
            continue
        f1 = _is_forward(part.data, g1)
        f2 = _is_forward(part.data, g2)
        (same if f1 == f2 else opp).append(part)
    return G.Geom.collection(
        G.GEOMETRYCOLLECTION,
        [
            G.Geom(G.MULTILINESTRING, same),
            G.Geom(G.MULTILINESTRING, opp),
        ],
    )
