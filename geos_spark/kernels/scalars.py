"""Unary scalar geometry kernels: area, length, centroid, envelope,
convex hull, distance, simplify.

Operation-order matches the reference scalar algorithms so results are
bit-identical on the same inputs:
- area: shoelace in the reference's form sum((x[i]-x[i+1]) * (y ...))
  (``src/algorithm/Area.cpp:73-87``)
- centroid: area-weighted triangle centroid with base-point translation
  (``src/algorithm/Centroid.cpp:99-150``)
- length: sum of segment hypotenuses (``src/algorithm/Length.cpp``)
- convex hull: Graham scan (``src/algorithm/ConvexHull.cpp``) — same
  result set; vertex order canonicalized by normalize() for comparison
- simplify: Douglas-Peucker (``src/simplify/DouglasPeuckerSimplifier.cpp``)
- distance: min facet distance (``src/operation/distance/DistanceOp.cpp``)
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.orientation import orientation_index


# ----------------------------------------------------------------------
# area / length
# ----------------------------------------------------------------------


def ring_signed_area(ring: np.ndarray) -> float:
    """Signed area, CCW positive. Reference form: based at ring[0]
    (Area::ofRingSigned uses x-base translation for robustness)."""
    if len(ring) < 3:
        return 0.0
    x = ring[:, 0]
    y = ring[:, 1]
    # translate by x0 as the reference does to reduce magnitude
    x0 = x[0]
    xs = x[1:-1] - x0
    return float(np.sum(xs * (y[2:] - y[:-2])) / 2.0)


def _ring_sections(ring: G.Geom) -> list:
    """Curve ring -> [(coords, is_curved)] sections (a COMPOUNDCURVE
    contributes one section per member)."""
    if ring.type_id == G.COMPOUNDCURVE:
        return [
            (c.data, c.type_id == G.CIRCULARSTRING) for c in ring.data
        ]
    return [(ring.data, ring.type_id == G.CIRCULARSTRING)]


def geom_area(g: G.Geom) -> float:
    if g.type_id == G.POLYGON:
        if not g.data:
            return 0.0
        a = abs(ring_signed_area(g.data[0]))
        for hole in g.data[1:]:
            a -= abs(ring_signed_area(hole))
        return a
    if g.type_id == G.CURVEPOLYGON:
        # CurvePolygon::getArea (src/geom/CurvePolygon.cpp:55-61):
        # shell closed-curve area minus hole closed-curve areas
        from geos_spark.kernels.arcs import closed_curve_area

        if not g.data or g.data[0].is_empty:
            return 0.0
        for ring in g.data:
            if not curve_is_closed(ring):
                raise ValueError("curve polygon ring is not closed")
        a = closed_curve_area(_ring_sections(g.data[0]))
        for hole in g.data[1:]:
            a -= closed_curve_area(_ring_sections(hole))
        return a
    if g.is_collection:
        return float(sum(geom_area(p) for p in g.data))
    return 0.0


def geom_length(g: G.Geom) -> float:
    if g.type_id == G.LINESTRING:
        d = np.diff(g.data, axis=0)
        return float(np.sum(np.hypot(d[:, 0], d[:, 1])))
    if g.type_id == G.CIRCULARSTRING:
        # CircularString::getLength: arc triples at stride 2
        from geos_spark.kernels.arcs import circularstring_length

        return circularstring_length(g.data)
    if g.type_id in (G.POLYGON, G.COMPOUNDCURVE, G.CURVEPOLYGON):
        if g.type_id == G.POLYGON:
            return float(
                sum(
                    np.sum(np.hypot(*np.diff(r, axis=0).T))
                    for r in g.data
                )
            )
        return float(sum(geom_length(p) for p in g.data))
    if g.is_collection:
        return float(sum(geom_length(p) for p in g.data))
    return 0.0


def curve_is_closed(g: G.Geom) -> bool:
    """isClosed for linework (GEOSisClosed). SimpleCurve: first ==
    last coordinate; CompoundCurve: start of first section == end of
    last (src/geom/CompoundCurve.cpp:271-281). Multi-linework is
    closed iff every member is (MultiCurve::isClosed)."""
    if g.is_empty:
        return False
    if g.type_id in (G.LINESTRING, G.CIRCULARSTRING):
        return bool(
            g.data[0, 0] == g.data[-1, 0]
            and g.data[0, 1] == g.data[-1, 1]
        )
    if g.type_id == G.COMPOUNDCURVE:
        first, last = g.data[0].data, g.data[-1].data
        return bool(
            first[0, 0] == last[-1, 0] and first[0, 1] == last[-1, 1]
        )
    if g.type_id in (G.MULTILINESTRING, G.MULTICURVE):
        return all(curve_is_closed(p) for p in g.data)
    raise ValueError("isClosed: not a curve")


def geom_num_points(g: G.Geom) -> int:
    """Total vertex count (Geometry::getNumPoints; CompoundCurve sums
    its sections, CompoundCurve.cpp:233-241)."""
    if g.type_id in (G.POINT, G.LINESTRING, G.CIRCULARSTRING):
        return int(len(g.data))
    if g.type_id == G.POLYGON:
        return int(sum(len(r) for r in g.data))
    return int(sum(geom_num_points(p) for p in g.data))


def geom_num_geometries(g: G.Geom) -> int:
    """GEOSGetNumGeometries: member count for collections, else 1
    (0 only for the typed-empty collection)."""
    if g.is_collection:
        return len(g.data)
    return 1


def geometry_type_name(g: G.Geom) -> str:
    """Geometry::getGeometryType CamelCase name (GEOSGeomType)."""
    return G.CAMEL_NAMES[g.type_id]


# ----------------------------------------------------------------------
# centroid (Centroid.cpp semantics: areas, then lines, then points)
# ----------------------------------------------------------------------


def geom_centroid(g: G.Geom) -> tuple[float, float] | None:
    """Exact replication of the reference Centroid state machine
    (src/algorithm/Centroid.cpp): per-shell area base point, sign from
    ring orientation (CW shell positive, CCW hole positive), rings also
    feed the line-centroid fallback, and zero-length linework degrades
    to a point-average of first coordinates. Same operation order ->
    bit-identical results."""
    state = {
        "areasum2": 0.0, "cg3x": 0.0, "cg3y": 0.0,
        "totlen": 0.0, "linex": 0.0, "liney": 0.0,
        "ptcount": 0, "ptx": 0.0, "pty": 0.0,
        "base": None,
    }

    def add_point(x: float, y: float) -> None:
        state["ptcount"] += 1
        state["ptx"] += x
        state["pty"] += y

    def add_line_segments(pts: np.ndarray) -> None:
        linelen = 0.0
        for i in range(len(pts) - 1):
            seglen = float(
                np.hypot(pts[i + 1, 0] - pts[i, 0], pts[i + 1, 1] - pts[i, 1])
            )
            if seglen == 0.0:
                continue
            linelen += seglen
            state["linex"] += seglen * ((pts[i, 0] + pts[i + 1, 0]) / 2)
            state["liney"] += seglen * ((pts[i, 1] + pts[i + 1, 1]) / 2)
        state["totlen"] += linelen
        if linelen == 0.0 and len(pts) > 0:
            add_point(float(pts[0, 0]), float(pts[0, 1]))

    def add_triangles(ring: np.ndarray, positive: bool) -> None:
        sign = 1.0 if positive else -1.0
        bx, by = state["base"]
        for i in range(len(ring) - 1):
            p1x, p1y = ring[i]
            p2x, p2y = ring[i + 1]
            a2 = (p1x - bx) * (p2y - by) - (p2x - bx) * (p1y - by)
            state["areasum2"] += sign * a2
            state["cg3x"] += sign * a2 * (bx + p1x + p2x)
            state["cg3y"] += sign * a2 * (by + p1y + p2y)

    def visit(g: G.Geom) -> None:
        if g.is_empty:
            return
        if g.type_id == G.POINT:
            add_point(float(g.data[0, 0]), float(g.data[0, 1]))
        elif g.type_id == G.LINESTRING:
            add_line_segments(g.data)
        elif g.type_id == G.POLYGON:
            shell = g.data[0]
            if len(shell):
                state["base"] = (float(shell[0, 0]), float(shell[0, 1]))
            # CW shell is positive (Centroid.cpp:120 "!isCCW")
            add_triangles(shell, positive=ring_signed_area(shell) <= 0)
            add_line_segments(shell)
            for hole in g.data[1:]:
                if not len(hole):
                    continue
                add_triangles(hole, positive=ring_signed_area(hole) > 0)
                add_line_segments(hole)
        else:
            for p in g.data:
                visit(p)

    visit(g)
    if abs(state["areasum2"]) > 0.0:
        return (
            state["cg3x"] / 3.0 / state["areasum2"],
            state["cg3y"] / 3.0 / state["areasum2"],
        )
    if state["totlen"] > 0.0:
        return (
            state["linex"] / state["totlen"],
            state["liney"] / state["totlen"],
        )
    if state["ptcount"] > 0:
        return (
            state["ptx"] / state["ptcount"],
            state["pty"] / state["ptcount"],
        )
    return None


# ----------------------------------------------------------------------
# convex hull (Graham scan; collinear points dropped as in reference)
# ----------------------------------------------------------------------


def convex_hull_coords(pts: np.ndarray) -> np.ndarray:
    """Hull of a coordinate array -> closed ring (k,2); degenerate
    inputs return the input points."""
    g = convex_hull(G.Geom(G.LINESTRING, np.asarray(pts, dtype=np.float64)))
    return g.all_coords()


def convex_hull(g: G.Geom) -> G.Geom:
    pts = np.unique(g.all_coords(), axis=0)
    if len(pts) == 0:
        return G.Geom.empty(G.GEOMETRYCOLLECTION)
    if len(pts) == 1:
        return G.Geom(G.POINT, pts[:1])
    if len(pts) == 2:
        return G.Geom(G.LINESTRING, pts)
    # Andrew's monotone chain (same hull set as Graham scan)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and (
                orientation_index(
                    out[-2][0], out[-2][1], out[-1][0], out[-1][1], p[0], p[1]
                )
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1] + [lower[0]])
    if len(ring) < 4:  # collinear input -> line
        return G.Geom(G.LINESTRING, np.array([pts[0], pts[-1]]))
    # emitted CCW; reference emits hull with CW shell after normalize —
    # comparisons use normalize() so orientation is canonicalized there
    return G.Geom(G.POLYGON, [ring])


# ----------------------------------------------------------------------
# Douglas-Peucker simplify
# ----------------------------------------------------------------------


def _seg_dist(p0, p1, q) -> float:
    """Point-to-segment distance (LineSegment::distance)."""
    d2 = _seg_point_dist2(
        np.array([p0[0]]), np.array([p0[1]]),
        np.array([p1[0]]), np.array([p1[1]]),
        np.array([q[0]]), np.array([q[1]]),
    )
    return float(np.sqrt(d2[0]))


def _dp_simplify_coords(
    coords: np.ndarray, tol: float, preserve_closed_endpoint: bool
) -> np.ndarray:
    """DouglasPeuckerLineSimplifier semantics
    (src/simplify/DouglasPeuckerLineSimplifier.cpp): recursive
    max-deviation section split with fixed endpoints, then the ring
    endpoint-removal pass (when the sequence is a ring and the
    endpoint need not be preserved): if coords[0] is within tolerance
    of segment (out[-2], out[1]), drop it and re-close from out[1]."""
    n = len(coords)
    if n == 0:
        return coords
    use = np.ones(n, dtype=bool)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if i + 1 == j:
            continue
        dmax = -1.0
        kmax = i
        for k in range(i + 1, j):
            d = _seg_dist(coords[i], coords[j], coords[k])
            if d > dmax:
                dmax = d
                kmax = k
        if dmax <= tol:
            use[i + 1 : j] = False
        else:
            stack.append((i, kmax))
            stack.append((kmax, j))
    out = coords[use]
    is_ring = n >= 4 and np.array_equal(coords[0], coords[-1])
    MIN_RING = 3  # LinearRing::MINIMUM_VALID_SIZE
    if not preserve_closed_endpoint and is_ring and len(out) > MIN_RING:
        if _seg_dist(out[-2], out[1], out[0]) <= tol:
            body = out[1:-1]
            out = np.vstack([body, body[:1]])
    return out


def _buffer0_repair(g: G.Geom) -> G.Geom:
    """DPTransformer::createValidArea buffer(0.0) repair of an
    invalid rough simplification result: polygonize the ring
    arrangement and keep faces whose interior point is covered by an
    odd number of shell rings and an even number of hole rings (the
    buffer depth rule for a single polygon's curve set), then
    dissolve (faces form a coverage)."""
    from geos_spark.kernels.coverage import coverage_union
    from geos_spark.kernels.overlay import _point_in_ring_parity
    from geos_spark.kernels.polygonize import polygonize

    shells = []
    holes = []
    for p in g.geoms():
        if p.type_id != G.POLYGON or not p.data:
            continue
        shells.append(np.asarray(p.data[0], dtype=np.float64))
        holes.extend(np.asarray(r, dtype=np.float64) for r in p.data[1:])
    linework = G.Geom.collection(
        G.MULTILINESTRING,
        [G.Geom.linestring(r) for r in shells + holes],
    )
    # polygonize expects noded input; buffer's curve set builder nodes
    # the rings itself — node via the lineal self-union
    from geos_spark.kernels.polygonize import (
        _node_line_with_first_coordinate,
    )

    noded = _node_line_with_first_coordinate(linework)
    faces = polygonize(noded if noded is not None else linework)
    keep = []
    for f in faces:
        ip = interior_point(f)
        if ip is None:
            continue
        sp = sum(1 for r in shells if _point_in_ring_parity(ip, r)) % 2
        hp = sum(1 for r in holes if _point_in_ring_parity(ip, r)) % 2
        if sp == 1 and hp == 0:
            keep.append(f)
    if not keep:
        return G.Geom.empty(G.POLYGON)
    return coverage_union(
        G.Geom.collection(G.GEOMETRYCOLLECTION, keep)
    )


def _valid_area(rough: G.Geom) -> G.Geom:
    """DPTransformer::createValidArea: return the rough result when
    it is a valid area, else the buffer(0) repair."""
    from geos_spark.kernels.valid import is_valid

    if rough.dimension() == 2 and not is_valid(rough):
        return _buffer0_repair(rough)
    return rough


def simplify_dp(g: G.Geom, tol: float) -> G.Geom:
    """DouglasPeuckerSimplifier transformer semantics
    (src/simplify/DouglasPeuckerSimplifier.cpp): degenerate rings are
    removed from polygons (a removed shell empties the polygon), empty
    parts are dropped from multis, and a single surviving part is
    returned bare (GeometryTransformer::buildGeometry). Invalid areal
    results get the createValidArea buffer(0) repair
    (DouglasPeuckerSimplifier.cpp:100-120).
    """
    if g.type_id == G.POINT:
        return g
    if g.type_id == G.LINESTRING:
        if g.is_empty:
            return g
        return G.Geom(
            G.LINESTRING, _dp_simplify_coords(g.data, tol, True)
        )
    if g.type_id == G.POLYGON:
        if g.is_empty:
            return g
        shell = _dp_simplify_coords(g.data[0], tol, False)
        if len(shell) < 4:
            return G.Geom.empty(G.POLYGON)
        rings = [shell]
        for r in g.data[1:]:
            s = _dp_simplify_coords(r, tol, False)
            if len(s) >= 4:
                rings.append(s)
        return _valid_area(G.Geom(G.POLYGON, rings))
    if g.is_collection:
        parts = []
        for p in g.data:
            sp = simplify_dp(p, tol)
            if sp.is_empty:
                continue
            parts.append(sp)
        if len(parts) == 1:
            return parts[0]
        if not parts:
            return G.Geom.empty(g.type_id)
        out = G.Geom(g.type_id, parts)
        if g.type_id == G.MULTIPOLYGON:
            out = _valid_area(out)
        return out
    return g


# ----------------------------------------------------------------------
# distance (min facet distance; DistanceOp semantics)
# ----------------------------------------------------------------------


def _seg_point_dist2(ax, ay, bx, by, px, py):
    """Vectorized point-to-segment squared distance."""
    dx = bx - ax
    dy = by - ay
    l2 = dx * dx + dy * dy
    t = np.where(l2 > 0, ((px - ax) * dx + (py - ay) * dy) / np.where(l2 == 0, 1, l2), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx = ax + t * dx
    cy = ay + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def _segments(g: G.Geom) -> np.ndarray:
    """All segments of a geometry as (k, 4) array [x1 y1 x2 y2]."""
    segs = []
    for p in g.geoms():
        if p.type_id == G.LINESTRING and len(p.data) > 1:
            segs.append(np.hstack([p.data[:-1], p.data[1:]]))
        elif p.type_id == G.POLYGON:
            for r in p.data:
                if len(r) > 1:
                    segs.append(np.hstack([r[:-1], r[1:]]))
    if not segs:
        return np.zeros((0, 4))
    return np.concatenate(segs)


def set_precision(g: G.Geom, scale: float) -> G.Geom:
    """Round coordinates to a fixed-precision grid:
    x' = round(x * scale) / scale (PrecisionModel FIXED semantics,
    include/geos/geom/PrecisionModel.h:63-80). Collapsed consecutive
    duplicates are removed; degenerate rings are dropped."""

    def snap(c: np.ndarray) -> np.ndarray:
        out = np.round(c * scale) / scale
        if len(out) > 1:
            keep = np.ones(len(out), dtype=bool)
            keep[1:] = (np.diff(out, axis=0) != 0).any(axis=1)
            out = out[keep]
        return out

    if g.type_id == G.POINT:
        return G.Geom(G.POINT, snap(g.data)) if not g.is_empty else g
    if g.type_id == G.LINESTRING:
        return G.Geom(G.LINESTRING, snap(g.data), is_ring=g.is_ring)
    if g.type_id == G.POLYGON:
        rings = []
        for r in g.data:
            s = snap(r)
            if len(s) and not np.array_equal(s[0], s[-1]):
                s = np.vstack([s, s[:1]])
            if len(s) >= 4:
                rings.append(s)
        return G.Geom(G.POLYGON, rings)
    if g.is_collection:
        return G.Geom(g.type_id, [set_precision(p, scale) for p in g.data])
    return g


def reverse_geom(g: G.Geom) -> G.Geom:
    """Reverse coordinate order of linework (GEOSReverse). Z/M side
    channels reverse with the XY sequence (CoordinateSequence::reverse
    swaps whole coordinates, so the declared dimension is kept)."""
    if g.type_id == G.POINT:
        return g
    if g.type_id in (G.LINESTRING, G.CIRCULARSTRING):
        return G.Geom(
            g.type_id,
            g.data[::-1].copy(),
            is_ring=g.is_ring,
            zs=None if g.zs is None else g.zs[::-1].copy(),
            ms=None if g.ms is None else g.ms[::-1].copy(),
        )
    if g.type_id == G.POLYGON:
        return G.Geom(
            G.POLYGON,
            [r[::-1].copy() for r in g.data],
            zs=None if g.zs is None else [z[::-1].copy() for z in g.zs],
            ms=None if g.ms is None else [m[::-1].copy() for m in g.ms],
        )
    if g.type_id == G.COMPOUNDCURVE:
        # reverse each section AND the section order
        # (CompoundCurve::reverseImpl)
        return G.Geom(
            G.COMPOUNDCURVE, [reverse_geom(p) for p in g.data[::-1]]
        )
    return G.Geom(g.type_id, [reverse_geom(p) for p in g.data])


def transform_xy(g: G.Geom, fn) -> G.Geom:
    """Apply a coordinate transform (GEOSGeom_transformXY). fn maps
    (x_array, y_array) -> (x', y') vectorized."""

    def t(c: np.ndarray) -> np.ndarray:
        if len(c) == 0:
            return c
        x, y = fn(c[:, 0], c[:, 1])
        return np.column_stack([x, y]).astype(np.float64)

    if g.type_id in (G.POINT, G.LINESTRING, G.CIRCULARSTRING):
        return G.Geom(g.type_id, t(g.data), is_ring=g.is_ring)
    if g.type_id == G.POLYGON:
        return G.Geom(G.POLYGON, [t(r) for r in g.data])
    return G.Geom(g.type_id, [transform_xy(p, fn) for p in g.data])


def normalize_geom(g: G.Geom) -> G.Geom:
    """Canonical form (see geom.canonical — used for normalized
    comparison, the role of Geometry::normalize)."""
    from geos_spark.kernels.geom import canonical

    return canonical(g)


def interior_point(g: G.Geom) -> tuple[float, float] | None:
    """Guaranteed-interior representative point.

    Exact reference semantics by dimension:
    - area: scan-line at the bisector Y (ScanLineYOrdinateFinder),
      even/odd crossing pairs, midpoint of the widest interior section
      (src/algorithm/InteriorPointArea.cpp)
    - line: interior vertex closest to the centroid, endpoints as
      fallback (InteriorPointLine.cpp)
    - point: point closest to the centroid (InteriorPointPoint.cpp)
    """
    if g.is_empty:
        return None
    d = g.dimension()
    if d == 2:
        best = None
        best_w = -1.0
        for p in g.geoms():
            if p.type_id != G.POLYGON or p.is_empty:
                continue
            r = _interior_point_polygon(p)
            if r is not None and r[1] > best_w:
                best, best_w = r[0], r[1]
        return best
    cen = geom_centroid(g)
    if cen is None:
        return None
    cx, cy = cen
    if d == 1:
        cands = []
        for p in g.geoms():
            if p.type_id == G.LINESTRING and len(p.data) > 2:
                cands.extend(tuple(v) for v in p.data[1:-1])
        if not cands:
            for p in g.geoms():
                if p.type_id == G.LINESTRING and len(p.data):
                    cands.append(tuple(p.data[0]))
                    cands.append(tuple(p.data[-1]))
    else:
        cands = [
            tuple(p.data[0])
            for p in g.geoms()
            if p.type_id == G.POINT and not p.is_empty
        ]
    if not cands:
        return None
    best = None
    best_d = np.inf
    for x, y in cands:
        dd = float(np.hypot(x - cx, y - cy))
        if dd < best_d:
            best_d = dd
            best = (float(x), float(y))
    return best


def _interior_point_polygon(p: G.Geom):
    rings = [r for r in p.data if len(r)]
    if not rings:
        return None
    all_y = np.concatenate([r[:, 1] for r in rings])
    lo_y = float(all_y.min())
    hi_y = float(all_y.max())
    centre_y = (lo_y + hi_y) / 2.0
    lo, hi = lo_y, hi_y
    for y in all_y:
        if y <= centre_y:
            if y > lo:
                lo = float(y)
        elif y < hi:
            hi = float(y)
    scan_y = (hi + lo) / 2.0

    crossings: list[float] = []
    for r in rings:
        if scan_y < r[:, 1].min() or scan_y > r[:, 1].max():
            continue
        for i in range(1, len(r)):
            x0, y0 = r[i - 1]
            x1, y1 = r[i]
            if (y0 > scan_y and y1 > scan_y) or (y0 < scan_y and y1 < scan_y):
                continue
            if y0 == y1:
                continue  # horizontal
            if y0 == scan_y and y1 < scan_y:
                continue  # downward excludes start
            if y1 == scan_y and y0 < scan_y:
                continue  # upward excludes end
            if x0 == x1:
                crossings.append(float(x0))
            else:
                m = (y1 - y0) / (x1 - x0)
                crossings.append(float(x0 + (scan_y - y0) / m))
    if not crossings:
        # zero-area: default to first coordinate
        return (float(rings[0][0, 0]), float(rings[0][0, 1])), 0.0
    crossings.sort()
    best = None
    width = 0.0
    it = iter(range(0, len(crossings) - 1, 2))
    for i in it:
        x1, x2 = crossings[i], crossings[i + 1]
        if x2 - x1 >= width:
            if x2 - x1 > width or best is None:
                width = x2 - x1
                best = ((x1 + x2) / 2.0, scan_y)
    return best, width


def geom_boundary(g: G.Geom) -> G.Geom:
    """OGC boundary (BoundaryOp semantics, Mod-2 rule for lines)."""
    from geos_spark.kernels.relate import _line_boundary_points, _line_parts

    if g.type_id == G.POINT or g.type_id == G.MULTIPOINT:
        return G.Geom.empty(G.GEOMETRYCOLLECTION)
    if g.type_id in (G.LINESTRING, G.MULTILINESTRING):
        bpts = _line_boundary_points(_line_parts(g))
        if len(bpts) == 0:
            return G.Geom.empty(G.MULTILINESTRING)
        if len(bpts) == 1:
            return G.Geom(G.POINT, bpts[:1])
        return G.Geom(
            G.MULTIPOINT, [G.Geom(G.POINT, bpts[i : i + 1]) for i in range(len(bpts))]
        )
    if g.type_id == G.POLYGON:
        rings = [G.Geom(G.LINESTRING, r) for r in g.data]
        if not rings:
            return G.Geom.empty(G.MULTILINESTRING)
        if len(rings) == 1:
            return rings[0]
        return G.Geom(G.MULTILINESTRING, rings)
    if g.type_id == G.MULTIPOLYGON:
        rings = [
            G.Geom(G.LINESTRING, r) for p in g.data for r in p.data
        ]
        if len(rings) == 1:
            return rings[0]
        return G.Geom(G.MULTILINESTRING, rings)
    parts = [geom_boundary(p) for p in g.data]
    return G.Geom(G.GEOMETRYCOLLECTION, parts)


def equals_exact(a: G.Geom, b: G.Geom, tol: float = 0.0) -> bool:
    """Coordinate-wise structural equality within tolerance
    (GEOSEqualsExact semantics: same structure, same order)."""
    if a.type_id != b.type_id:
        return False
    if a.type_id in (G.POINT, G.LINESTRING):
        if a.data.shape != b.data.shape:
            return False
        if tol == 0.0:
            return bool(np.array_equal(a.data, b.data))
        return bool((np.abs(a.data - b.data) <= tol).all())
    if a.type_id == G.POLYGON:
        if len(a.data) != len(b.data):
            return False
        for x, y in zip(a.data, b.data):
            if x.shape != y.shape:
                return False
            if tol == 0.0:
                if not np.array_equal(x, y):
                    return False
            elif not (np.abs(x - y) <= tol).all():
                return False
        return True
    if len(a.data) != len(b.data):
        return False
    return all(equals_exact(x, y, tol) for x, y in zip(a.data, b.data))


def equals_identical(a: G.Geom, b: G.Geom) -> bool:
    """GEOSEqualsIdentical (capi/geos_c.h.in:5431, Geometry.h
    equalsIdentical): pointwise equality — identical type, structure,
    vertex order, coordinate values AND coordinate dimension (a
    declared-Z geometry never equals its XY twin). Unlike
    ``equals_exact(tol=0)``, NaN compares equal to NaN (value
    semantics); IEEE gives -0.0 == 0.0."""

    def _coords(x: np.ndarray, y: np.ndarray) -> bool:
        if x.shape != y.shape:
            return False
        if x.size == 0:
            return True
        return bool(((x == y) | (np.isnan(x) & np.isnan(y))).all())

    def _extra(x, y) -> bool:
        if (x is None) != (y is None):
            return False
        if x is None:
            return True
        return _coords(np.asarray(x), np.asarray(y))

    if a.type_id != b.type_id:
        return False
    if a.type_id in (G.POINT, G.LINESTRING, G.CIRCULARSTRING):
        return (
            _coords(a.data, b.data)
            and _extra(a.zs, b.zs)
            and _extra(a.ms, b.ms)
        )
    if a.type_id == G.POLYGON:
        if len(a.data) != len(b.data):
            return False
        az = a.zs if a.zs is not None else [None] * len(a.data)
        bz = b.zs if b.zs is not None else [None] * len(b.data)
        am = a.ms if a.ms is not None else [None] * len(a.data)
        bm = b.ms if b.ms is not None else [None] * len(b.data)
        return (
            (a.zs is None) == (b.zs is None)
            and (a.ms is None) == (b.ms is None)
            and all(_coords(x, y) for x, y in zip(a.data, b.data))
            and all(_extra(x, y) for x, y in zip(az, bz))
            and all(_extra(x, y) for x, y in zip(am, bm))
        )
    if len(a.data) != len(b.data):
        return False
    return all(equals_identical(x, y) for x, y in zip(a.data, b.data))


def geom_distance(a: G.Geom, b: G.Geom) -> float:
    """Minimum distance. Zero if they intersect (area containment
    checked via PIP for polygon operands)."""
    from geos_spark.kernels.pip import EXTERIOR, PolygonPack, locate_points

    if a.is_empty or b.is_empty:
        return float("nan")

    # point sets
    pa = np.concatenate(
        [p.data for p in a.geoms() if p.type_id == G.POINT]
        + [np.zeros((0, 2))]
    )
    pb = np.concatenate(
        [p.data for p in b.geoms() if p.type_id == G.POINT]
        + [np.zeros((0, 2))]
    )
    sa = _segments(a)
    sb = _segments(b)
    best = np.inf

    # vertex sets for segment endpoints
    va = np.concatenate([pa, sa[:, :2], sa[:, 2:]]) if len(sa) else pa
    vb = np.concatenate([pb, sb[:, :2], sb[:, 2:]]) if len(sb) else pb

    # facet distance: brute vectorized pair matrix for small inputs,
    # branch-and-bound indexed facet distance for large linework
    # (IndexedFacetDistance.cpp:32-57 — same exact result,
    # sub-quadratic work)
    n_pairs = len(va) * len(sb) + len(vb) * len(sa)
    use_indexed = n_pairs > 2_000_000
    if use_indexed:
        from geos_spark.kernels.facetdist import facet_min_dist, facets_of

        best = min(best, facet_min_dist(facets_of(a), facets_of(b)))
        if best == 0.0:
            return 0.0
    else:
        # point/vertex to segment distances both directions
        if len(sb) and len(va):
            d2 = _seg_point_dist2(
                sb[None, :, 0], sb[None, :, 1], sb[None, :, 2],
                sb[None, :, 3], va[:, None, 0], va[:, None, 1],
            )
            best = min(best, float(np.sqrt(d2.min())))
        if len(sa) and len(vb):
            d2 = _seg_point_dist2(
                sa[None, :, 0], sa[None, :, 1], sa[None, :, 2],
                sa[None, :, 3], vb[:, None, 0], vb[:, None, 1],
            )
            best = min(best, float(np.sqrt(d2.min())))
        if len(va) and len(vb) and not len(sa) and not len(sb):
            d2 = (va[:, None, 0] - vb[None, :, 0]) ** 2 + (
                va[:, None, 1] - vb[None, :, 1]
            ) ** 2
            best = min(best, float(np.sqrt(d2.min())))

        # segment crossings -> distance 0 (facet path detects these
        # inside its leaf comparisons)
        if len(sa) and len(sb) and best > 0:
            from geos_spark.kernels.segments import segments_intersect_any

            if segments_intersect_any(sa, sb):
                return 0.0

    # containment: a point/vertex of one inside the other's area
    def _contains_any(poly_geom: G.Geom, pts: np.ndarray) -> bool:
        polys = [
            p for p in poly_geom.geoms() if p.type_id == G.POLYGON and p.data
        ]
        if not polys or not len(pts):
            return False
        pack = PolygonPack.from_rings([p.data for p in polys])
        npairs = len(pts) * len(polys)
        pt_i = np.repeat(np.arange(len(pts)), len(polys))
        pl_i = np.tile(np.arange(len(polys)), len(pts))
        loc = locate_points(pts, pack, pt_i, pl_i)
        del npairs
        return bool((loc != EXTERIOR).any())

    if best > 0:
        if _contains_any(a, vb) or _contains_any(b, va):
            return 0.0
    return best


def nearest_points(a: G.Geom, b: G.Geom):
    """Closest point pair (DistanceOp::nearestPoints,
    capi geos_c.h.in:3591). Returns ((x1,y1),(x2,y2)) or None for
    empty operands; for intersecting areal operands returns a shared
    witness point (distance 0)."""
    from geos_spark.kernels.dd import _point_to_segment
    from geos_spark.kernels.pip import EXTERIOR, PolygonPack, locate_points

    if a.is_empty or b.is_empty:
        return None

    def vertices(g):
        vs = []
        for p in g.geoms():
            if p.type_id == G.POINT and len(p.data):
                vs.append(p.data)
            elif p.type_id == G.LINESTRING and len(p.data):
                vs.append(p.data)
            elif p.type_id == G.POLYGON:
                for r in p.data:
                    vs.append(r)
        return np.concatenate(vs) if vs else np.zeros((0, 2))

    va = vertices(a)
    vb = vertices(b)
    sa = _segments(a)
    sb = _segments(b)

    # properly crossing linework: the nearest pair is the intersection
    # point twice (DistanceOp via LineSegment::closestPoints, which
    # returns the computed intersection for crossing segments)
    if len(sa) and len(sb):
        from geos_spark.kernels.segments import intersection_points

        ipts, _, _ = intersection_points(sa, sb)
        if len(ipts):
            p = (float(ipts[0, 0]), float(ipts[0, 1]))
            return (p, p)

    best = np.inf
    pair = None

    def check_pt_segs(pts, segs, swap):
        nonlocal best, pair
        for p in pts:
            for s in segs:
                p0 = (s[0], s[1])
                p1 = (s[2], s[3])
                d = _point_to_segment((p[0], p[1]), p0, p1)
                if d < best:
                    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
                    l2 = dx * dx + dy * dy
                    r = 0.0 if l2 == 0 else (
                        (p[0] - p0[0]) * dx + (p[1] - p0[1]) * dy
                    ) / l2
                    r = min(max(r, 0.0), 1.0)
                    q = (p0[0] + r * dx, p0[1] + r * dy)
                    best = d
                    pair = (
                        (q, (float(p[0]), float(p[1])))
                        if swap
                        else ((float(p[0]), float(p[1])), q)
                    )

    # vertex-vertex
    for p in va:
        d = np.hypot(vb[:, 0] - p[0], vb[:, 1] - p[1])
        if len(d):
            k = int(np.argmin(d))
            if d[k] < best:
                best = float(d[k])
                pair = (
                    (float(p[0]), float(p[1])),
                    (float(vb[k, 0]), float(vb[k, 1])),
                )
    if len(sb):
        check_pt_segs(va, sb, swap=False)
    if len(sa):
        check_pt_segs(vb, sa, swap=True)

    # containment: any vertex of one inside the other's polygons
    def inside_witness(pts, g, swap):
        nonlocal best, pair
        polys = [p.data for p in g.geoms() if p.type_id == G.POLYGON and p.data]
        if not polys or not len(pts):
            return
        pack = PolygonPack.from_rings(polys)
        n, m = len(pts), len(polys)
        loc = locate_points(
            pts, pack,
            np.repeat(np.arange(n), m), np.tile(np.arange(m), n),
        ).reshape(n, m)
        hit = np.flatnonzero((loc != EXTERIOR).any(axis=1))
        if len(hit):
            p = (float(pts[hit[0], 0]), float(pts[hit[0], 1]))
            best_local = 0.0
            if best_local < best:
                _set(p, swap, best_local)

    def _set(p, swap, d):
        nonlocal best, pair
        best = d
        pair = (p, p)

    if best > 0.0:
        inside_witness(va, b, False)
    if best > 0.0:
        inside_witness(vb, a, True)
    return pair
