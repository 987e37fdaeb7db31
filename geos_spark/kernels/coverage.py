"""Coverage union: fast union of a valid polygonal coverage.

Re-derivation of ``src/operation/overlayng/CoverageUnion.cpp``:
in a valid coverage, shared boundaries are traversed exactly twice in
opposite directions, so the union boundary is the set of segments
whose net directed multiplicity is non-zero — no noding, no overlay.
The surviving directed edges re-assemble into result rings with the
overlay engine's ring tracer. This is exactly the cheap re-union a
tiling engine wants for clipped fragments (fragments of one tiling
level form a valid coverage by construction).
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G


def coverage_union(g: G.Geom) -> G.Geom:
    """CoverageUnion::geomunion. Input polygons must form a valid
    coverage (edge-matched, non-overlapping interiors)."""
    from geos_spark.kernels.overlay import _assemble_polygons, _trace_rings
    from geos_spark.kernels.scalars import ring_signed_area

    net: dict = {}
    any_poly = False
    for poly in g.geoms():
        if poly.type_id != G.POLYGON or not poly.data:
            continue
        any_poly = True
        for ri, r in enumerate(poly.data):
            if len(r) < 4:
                continue
            # normalize traversal so interiors are consistently on the
            # left: shells CCW, holes CW
            ccw = ring_signed_area(r) > 0
            is_hole = ri > 0
            coords = r if (ccw != is_hole) else r[::-1]
            for i in range(len(coords) - 1):
                a = (float(coords[i, 0]), float(coords[i, 1]))
                b = (float(coords[i + 1, 0]), float(coords[i + 1, 1]))
                if a == b:
                    continue
                lo, hi = (a, b) if a < b else (b, a)
                net[(lo, hi)] = net.get((lo, hi), 0) + (
                    1 if a == lo else -1
                )
    if not any_poly:
        return G.Geom(G.POLYGON, [])
    directed = []
    for (lo, hi), n in net.items():
        if n > 0:
            directed.extend([(lo, hi)] * n)
        elif n < 0:
            directed.extend([(hi, lo)] * (-n))
    if not directed:
        return G.Geom(G.POLYGON, [])
    polys = _assemble_polygons(_trace_rings(directed))
    if not polys:
        return G.Geom(G.POLYGON, [])
    if len(polys) == 1:
        return polys[0]
    return G.Geom.collection(G.MULTIPOLYGON, polys)
