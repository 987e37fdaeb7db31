"""Structural accessors over the Geom model — the GEOS C-API
"getter" surface re-expressed as per-value kernels.

Reference parity (capi/geos_c.h.in):
  GEOSGeomGetPointN / GetStartPoint / GetEndPoint  (:1822-1855)
  GEOSGetExteriorRing / GEOSGetInteriorRingN        (:1759-1768)
  GEOSGetNumInteriorRings / GEOSGetNumCoordinates   (:1725,1769)
  GEOSGetGeometryN                                  (:1684)
  GEOSGeom_extractUniquePoints                      (:1183; 2D equality,
      first-occurrence order — util/UniqueCoordinateArrayFilter)
  GEOSGeom_getDimensions                            (:1779)
  GEOSHasZ / GEOSHasM                               (:1501; declared
      Z/M channels on the Geom side-channels)
  GEOSOrientPolygons                                (:3288; exteriorCW
      flag orients shells CW and holes CCW, or the reverse)
  GEOSPointOnSurface == interiorPoint               (:1090)

The per-row error contract matches the C API: an accessor that the
reference defines as failing (wrong type, index out of range) raises,
and the column layer surfaces NULL for that row.
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.scalars import ring_signed_area

_SIMPLE_CURVES = (G.LINESTRING, G.CIRCULARSTRING)


def point_n(g: G.Geom, n: int) -> G.Geom:
    """N'th vertex (zero-based) of a simple curve -> POINT. Z/M
    ordinates travel with the vertex (the reference returns the full
    coordinate)."""
    if g.type_id not in _SIMPLE_CURVES:
        raise ValueError("pointN: not a simple curve")
    if n < 0 or n >= len(g.data):
        raise ValueError("pointN: index out of range")
    return G.Geom(
        G.POINT,
        g.data[n : n + 1].copy(),
        zs=None if g.zs is None else g.zs[n : n + 1].copy(),
        ms=None if g.ms is None else g.ms[n : n + 1].copy(),
    )


def start_point(g: G.Geom) -> G.Geom:
    return point_n(g, 0)


def end_point(g: G.Geom) -> G.Geom:
    if g.type_id not in _SIMPLE_CURVES:
        raise ValueError("endPoint: not a simple curve")
    return point_n(g, len(g.data) - 1)


def exterior_ring(g: G.Geom) -> G.Geom:
    """Shell of a POLYGON (as closed LINESTRING) or the shell ring
    geometry of a CURVEPOLYGON."""
    if g.type_id == G.POLYGON:
        if not g.data:
            return G.Geom.empty(G.LINESTRING)
        return G.Geom(
            G.LINESTRING,
            g.data[0].copy(),
            is_ring=True,
            zs=None if g.zs is None else g.zs[0].copy(),
            ms=None if g.ms is None else g.ms[0].copy(),
        )
    if g.type_id == G.CURVEPOLYGON:
        if not g.data:
            return G.Geom.empty(G.LINESTRING)
        return g.data[0]
    raise ValueError("exteriorRing: not a polygon")


def num_interior_rings(g: G.Geom) -> int:
    if g.type_id not in (G.POLYGON, G.CURVEPOLYGON):
        raise ValueError("numInteriorRings: not a polygon")
    return max(0, len(g.data) - 1)


def interior_ring_n(g: G.Geom, n: int) -> G.Geom:
    if g.type_id not in (G.POLYGON, G.CURVEPOLYGON):
        raise ValueError("interiorRingN: not a polygon")
    if n < 0 or n + 1 >= len(g.data):
        raise ValueError("interiorRingN: index out of range")
    if g.type_id == G.POLYGON:
        return G.Geom(
            G.LINESTRING,
            g.data[n + 1].copy(),
            is_ring=True,
            zs=None if g.zs is None else g.zs[n + 1].copy(),
            ms=None if g.ms is None else g.ms[n + 1].copy(),
        )
    return g.data[n + 1]


def geometry_n(g: G.Geom, n: int) -> G.Geom:
    """N'th member of a collection; an atomic geometry is its own
    member 0 (Geometry::getGeometryN)."""
    if not g.is_collection:
        if n != 0:
            raise ValueError("geometryN: index out of range")
        return g
    if n < 0 or n >= len(g.data):
        raise ValueError("geometryN: index out of range")
    return g.data[n]


def num_coordinates(g: G.Geom) -> int:
    """Geometry::getNumPoints over the whole structure
    (GEOSGetNumCoordinates)."""
    from geos_spark.kernels.scalars import geom_num_points

    return geom_num_points(g)


def extract_unique_points(g: G.Geom) -> G.Geom:
    """MULTIPOINT of distinct vertices in first-occurrence order
    (2D equality, like UniqueCoordinateArrayFilter)."""
    seen: set = set()
    pts: list[np.ndarray] = []

    def walk(p: G.Geom) -> None:
        if p.type_id in (G.POINT, G.LINESTRING, G.CIRCULARSTRING):
            arrs = [p.data]
        elif p.type_id == G.POLYGON:
            arrs = list(p.data)
        else:
            for c in p.data:
                walk(c)
            return
        for a in arrs:
            for x, y in np.asarray(a, dtype=np.float64):
                k = (float(x), float(y))
                if k not in seen:
                    seen.add(k)
                    pts.append(np.array([[x, y]]))

    walk(g)
    if not pts:
        return G.Geom.empty(G.MULTIPOINT)
    return G.Geom(
        G.MULTIPOINT, [G.Geom(G.POINT, p) for p in pts]
    )


def orient_polygons(g: G.Geom, exterior_cw: bool = False) -> G.Geom:
    """Orient every polygon's shell CCW and holes CW (the OGC
    convention), or the reverse when ``exterior_cw`` — in-structure
    rewrite, non-polygonal members untouched (GEOSOrientPolygons)."""

    def fix_ring(r: np.ndarray, want_ccw: bool) -> np.ndarray:
        a = ring_signed_area(r)
        is_ccw = a > 0
        if a != 0 and is_ccw != want_ccw:
            return r[::-1].copy()
        return r

    def walk(p: G.Geom) -> G.Geom:
        if p.type_id == G.POLYGON:
            if not p.data:
                return p
            rings = [fix_ring(p.data[0], not exterior_cw)]
            rings += [fix_ring(r, exterior_cw) for r in p.data[1:]]
            return G.Geom(G.POLYGON, rings)
        if p.type_id == G.CURVEPOLYGON:
            # the reference's component filter throws exactly here
            # (capi/geos_ts_c.cpp:1861-1863); other curve linework
            # passes through untouched
            raise ValueError(
                "orientPolygons: curved geometries unsupported"
            )
        if p.is_collection:
            return G.Geom(p.type_id, [walk(c) for c in p.data])
        return p

    return walk(g)
