"""GeometryFixer — the GEOS_MAKE_VALID_STRUCTURE repair method.

Reference parity: src/geom/util/GeometryFixer.cpp (the capi
GEOSMakeValidWithParams STRUCTURE branch, geos_ts_c.cpp:2410-2418),
RepeatedPointRemover::removeRepeatedAndInvalidPoints, and
BufferOp::bufferByZero(geom, bothOrientations=true) for ring repair.
Oracle: tests/unit/geom/util/GeometryFixerTest.cpp (all 2D cases,
tests/test_fixer.py).

Structure semantics vs the linework method (kernels/polygonize.py
make_valid): each component is repaired in place — NaN/repeated
points dropped, collapsed components dropped (or kept as lower-dim
geometries when ``keep_collapsed``), polygon rings rebuilt by
zero-buffer keeping BOTH orientations' area, holes re-classified
against the fixed shell (a "hole" outside the shell becomes a shell
and is unioned in).
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G

_RING_MIN = 3  # LinearRing::MINIMUM_VALID_SIZE (LinearRing.h:62)


def _clean_coords(c: np.ndarray) -> np.ndarray:
    """removeRepeatedAndInvalidPoints: drop NaN/inf vertices and
    consecutive duplicates."""
    c = np.asarray(c, dtype=np.float64)
    if len(c) == 0:
        return c
    finite = np.isfinite(c).all(axis=1)
    c = c[finite]
    if len(c) == 0:
        return c
    keep = np.ones(len(c), dtype=bool)
    keep[1:] = (c[1:] != c[:-1]).any(axis=1)
    return c[keep]


def _fix_point_element(g: G.Geom) -> G.Geom | None:
    if g.is_empty or not np.isfinite(g.data).all():
        return None
    return g


def _fix_line_element(g: G.Geom, keep_collapsed: bool) -> G.Geom | None:
    if g.is_empty:
        return None
    pts = _clean_coords(g.data)
    if keep_collapsed and len(pts) == 1:
        return G.Geom(G.POINT, pts[:1])
    if len(pts) <= 1:
        return None
    return G.Geom(G.LINESTRING, pts)


def _ring_is_valid(ring: np.ndarray) -> bool:
    """LinearRing::isValid — closed + simple (IsValidOp on the ring)."""
    from geos_spark.kernels.valid import is_valid

    if len(ring) < 4:
        return False
    if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
        return False
    try:
        return is_valid(G.Geom(G.POLYGON, [ring]))
    except Exception:
        return False


def _fix_linear_ring_element(
    g: G.Geom, keep_collapsed: bool
) -> G.Geom | None:
    """fixLinearRingElement (GeometryFixer.cpp:141-170)."""
    if g.is_empty:
        return None
    pts = _clean_coords(g.data)
    n = len(pts)
    if keep_collapsed:
        if n == 1:
            return G.Geom(G.POINT, pts[:1])
        if 1 < n <= 3:
            return G.Geom(G.LINESTRING, pts)
    if n <= _RING_MIN:
        return None
    if not _ring_is_valid(pts):
        return G.Geom(G.LINESTRING, pts)
    return G.Geom(G.LINESTRING, pts, is_ring=True)


def _winding_number(pts: np.ndarray, x: float, y: float) -> int:
    """Winding number of the closed polyline ``pts`` around (x, y)
    (standard signed crossing count; the query point is a face
    interior point, never on an edge)."""
    x0, y0 = pts[:-1, 0], pts[:-1, 1]
    x1, y1 = pts[1:, 0], pts[1:, 1]
    # upward crossings where point is strictly left; downward where
    # strictly right
    cross = (x1 - x0) * (y - y0) - (x - x0) * (y1 - y0)
    up = (y0 <= y) & (y1 > y) & (cross > 0)
    dn = (y0 > y) & (y1 <= y) & (cross < 0)
    return int(up.sum()) - int(dn.sum())


def _fix_ring(ring: np.ndarray) -> G.Geom:
    """fixRing: zero-buffer of the raw ring keeping BOTH orientations
    (BufferOp::bufferByZero(poly, true)).  A zero buffer keeps the
    region with nonzero winding under the chosen orientation; taking
    both orientations keeps every face the closed curve winds around
    a net nonzero number of times — bowtie lobes (windings +1/-1)
    both survive, while a pocket traversed once each way (net 0)
    does not.  Computed as: node the ring linework, polygonize the
    arrangement faces, keep faces whose interior point has nonzero
    winding w.r.t. the original curve, union."""
    from geos_spark.kernels.polygonize import (
        _node_line_with_first_coordinate,
        polygonize,
    )
    from geos_spark.kernels.scalars import interior_point

    pts = _clean_coords(ring)
    if len(pts) < 3:
        return G.Geom(G.POLYGON, [])
    if pts[0, 0] != pts[-1, 0] or pts[0, 1] != pts[-1, 1]:
        pts = np.vstack([pts, pts[:1]])
    try:
        noded = _node_line_with_first_coordinate(
            G.Geom(G.LINESTRING, pts), None
        )
        if noded is None or noded.is_empty:
            return G.Geom(G.POLYGON, [])
        faces = polygonize(noded)
        kept = []
        for f in faces:
            c = interior_point(f)
            if c is None:
                continue
            if _winding_number(pts, c[0], c[1]) != 0:
                kept.append(f)
        return _union_polygonal(kept)
    except Exception:
        return G.Geom(G.POLYGON, [])


def _union_polygonal(parts: list[G.Geom]) -> G.Geom:
    from geos_spark.kernels.union import unary_union

    parts = [p for p in parts if not p.is_empty]
    if not parts:
        return G.Geom(G.POLYGON, [])
    if len(parts) == 1:
        return parts[0]
    return unary_union(G.Geom.collection(G.GEOMETRYCOLLECTION, parts))


def _fix_polygon_element(
    g: G.Geom, keep_collapsed: bool
) -> G.Geom | None:
    """fixPolygonElement (GeometryFixer.cpp:244-283)."""
    from geos_spark.kernels.overlay import DIFFERENCE, overlay_robust
    from geos_spark.kernels.relate import intersects

    if not g.data:
        return None
    shell_ring = g.data[0]
    fix_shell = _fix_ring(shell_ring)
    if fix_shell.is_empty:
        if keep_collapsed:
            line = G.Geom(G.LINESTRING, np.asarray(shell_ring))
            fixed = _fix_line_element(line, keep_collapsed=True)
            return fixed
        return None
    if len(g.data) == 1:
        return fix_shell
    holes_fixed = [
        h for h in (_fix_ring(r) for r in g.data[1:]) if h is not None
    ]
    holes: list[G.Geom] = []
    shells: list[G.Geom] = []
    for h in holes_fixed:
        if h.is_empty:
            continue
        if intersects(fix_shell, h):
            holes.append(h)
        else:
            shells.append(h)
    if holes:
        poly = overlay_robust(
            fix_shell, _union_polygonal(holes), DIFFERENCE
        )
    else:
        poly = fix_shell
    if not shells:
        return poly
    return _union_polygonal(shells + [poly])


def fix_structure(g: G.Geom, keep_collapsed: bool = False) -> G.Geom:
    """GeometryFixer::fix / GEOSMakeValidWithParams STRUCTURE method."""
    t = g.type_id

    # truly empty inputs are returned unchanged (getResult():57-60)
    def n_geoms(p: G.Geom) -> int:
        return len(p.data) if p.is_collection else (0 if p.is_empty else 1)

    if t == G.POINT:
        pt = _fix_point_element(g)
        return pt if pt is not None else G.Geom.empty(G.POINT)
    if g.is_collection and len(g.data) == 0:
        return g
    if t == G.MULTIPOINT:
        pts = [
            p
            for p in (
                _fix_point_element(q) for q in g.data if not q.is_empty
            )
            if p is not None
        ]
        return G.Geom(G.MULTIPOINT, pts)
    if t == G.LINESTRING:
        if g.is_ring:
            out = _fix_linear_ring_element(g, keep_collapsed)
            if out is None:
                return G.Geom(
                    G.LINESTRING,
                    np.zeros((0, 2), dtype=np.float64),
                    is_ring=True,
                )
            return out
        if g.is_empty:
            return g
        out = _fix_line_element(g, keep_collapsed)
        return out if out is not None else G.Geom.empty(G.LINESTRING)
    if t == G.MULTILINESTRING:
        fixed = []
        mixed = False
        for line in g.data:
            if line.is_empty:
                continue
            f = _fix_line_element(line, keep_collapsed)
            if f is None:
                continue
            if f.type_id != G.LINESTRING:
                mixed = True
            fixed.append(f)
        if len(fixed) == 1:
            return fixed[0]
        if mixed:
            # points sort ahead of lines in the canonical collection
            return G.Geom.collection(
                G.GEOMETRYCOLLECTION,
                sorted(fixed, key=lambda p: p.type_id),
            )
        return G.Geom(G.MULTILINESTRING, fixed)
    if t == G.POLYGON:
        if g.is_empty:
            return g
        out = _fix_polygon_element(g, keep_collapsed)
        return out if out is not None else G.Geom(G.POLYGON, [])
    if t == G.MULTIPOLYGON:
        polys = []
        for p in g.data:
            if p.is_empty:
                continue
            f = _fix_polygon_element(p, keep_collapsed)
            if f is not None and not f.is_empty:
                polys.append(f)
        if not polys:
            return G.Geom(G.MULTIPOLYGON, [])
        polygonal = [p for p in polys if p.dimension() == 2]
        rest = [p for p in polys if p.dimension() != 2]
        u = _union_polygonal(polygonal) if polygonal else None
        if rest:
            items = rest + (
                [u] if u is not None and not u.is_empty else []
            )
            if len(items) == 1:
                return items[0]
            return G.Geom.collection(
                G.GEOMETRYCOLLECTION,
                sorted(items, key=lambda p: p.type_id),
            )
        return u if u is not None else G.Geom(G.MULTIPOLYGON, [])
    if t == G.GEOMETRYCOLLECTION:
        return G.Geom(
            G.GEOMETRYCOLLECTION,
            [fix_structure(p, keep_collapsed) for p in g.data],
        )
    raise ValueError("fix_structure: unsupported geometry type")


def _rrp_filter(c: np.ndarray, tol: float) -> np.ndarray:
    """RepeatedInvalidPointFilter: skip initial invalids, then drop
    invalid points and points within ``tol`` of the last kept."""
    out: list[np.ndarray] = []
    sq = tol * tol
    for p in np.asarray(c, dtype=np.float64):
        if not np.isfinite(p).all():
            continue
        if out:
            d = p - out[-1]
            if (p == out[-1]).all() or float(d @ d) <= sq:
                continue
        out.append(p)
    if not out:
        return np.zeros((0, 2), dtype=np.float64)
    return np.vstack(out)


def _rrp_sequence(
    c: np.ndarray, tol: float, min_length: int
) -> np.ndarray:
    """RepeatedPointCoordinateOperation::edit
    (RepeatedPointRemover.cpp:170-227)."""
    c = np.asarray(c, dtype=np.float64)
    if len(c) <= min_length:
        return c.copy()
    filt = _rrp_filter(c, tol)
    if len(filt) == 0:
        raise ValueError("removeRepeatedPoints: sequence vanished")
    orig_end = c[-1]
    if len(filt) < min_length:
        filt = np.vstack([filt, orig_end[None, :]])
    if not (filt[-1] == orig_end).all():
        d = filt[-1] - orig_end
        if float(d @ d) <= tol * tol:
            filt = filt[:-1]
        filt = np.vstack([filt, orig_end[None, :]])
    return filt


def remove_repeated_points(g: G.Geom, tolerance: float = 0.0) -> G.Geom:
    """GEOSRemoveRepeatedPoints (capi geos_ts_c.cpp:2426-2438):
    consecutive points closer than ``tolerance`` removed, per
    coordinate sequence, preserving endpoints; a ring that collapses
    below a constructible size is an error (per-row NULL at the
    column layer), as is curved input."""
    t = g.type_id
    if t in G.CURVED_TYPES:
        raise ValueError("removeRepeatedPoints: curved unsupported")
    if t == G.POINT:
        return g
    if t == G.LINESTRING:
        min_len = 3 if g.is_ring else 2
        out = _rrp_sequence(g.data, tolerance, min_len)
        if g.is_ring and len(g.data) >= 4 and len(out) < 4:
            raise ValueError("removeRepeatedPoints: ring collapsed")
        return G.Geom(G.LINESTRING, out, is_ring=g.is_ring)
    if t == G.POLYGON:
        rings = []
        for r in g.data:
            out = _rrp_sequence(r, tolerance, 3)
            # the reference clones too-short sequences untouched
            # (edit(): size <= minLength -> clone); the error case is
            # removal itself collapsing a constructible ring
            if len(r) >= 4 and len(out) < 4:
                raise ValueError(
                    "removeRepeatedPoints: ring collapsed"
                )
            rings.append(out)
        return G.Geom(G.POLYGON, rings)
    if g.is_collection:
        return G.Geom(
            t, [remove_repeated_points(p, tolerance) for p in g.data]
        )
    raise ValueError("removeRepeatedPoints: unsupported type")
