"""isSimple / isValid (OGC validity, IsSimpleOp / IsValidOp semantics).

- ``is_simple``: element-boundary contact rule — intersections between
  non-adjacent segments are allowed only at points that are terminal
  vertices of both elements involved (closed elements treat their
  first/last segments as adjacent). Mirrors
  ``src/operation/valid/IsSimpleOp.cpp``.
- ``is_valid``: polygon validity checks from IsValidOp
  (``src/operation/valid/IsValidOp.cpp``): ring size/closure, ring
  self-intersection, ring-ring crossing or collinear overlap, holes
  inside shell, holes not nested, multipolygon shells not nested or
  overlapping, vertex-touch ring crossings
  (PolygonNodeTopology::isCrossing), interior connectivity (hole
  touch-graph cycles per PolygonRing::findHoleCycleLocation), and
  boundary-incident nesting via the corner-sector test
  (PolygonTopologyAnalyzer::isRingNested /
  IndexedNestedPolygonTester).
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.pip import EXTERIOR, INTERIOR, PolygonPack, locate_points
from geos_spark.kernels.segments import (
    COLLINEAR_INTERSECTION,
    POINT_INTERSECTION,
    intersect_pairs,
)


def _elem_segments(g: G.Geom):
    """Flat segment list with (elem_id, seg_pos, n_segs_of_elem,
    is_closed, term_pts) metadata for lineal simplicity checks."""
    segs = []
    meta = []
    elems = [
        p for p in g.geoms() if p.type_id == G.LINESTRING and len(p.data) > 1
    ]
    terminals = {}
    for ei, e in enumerate(elems):
        c = e.data
        closed = bool(np.array_equal(c[0], c[-1])) and len(c) > 3
        # positions index only EMITTED (non-degenerate) segments, so
        # repeated vertices don't break adjacency bookkeeping
        pos = 0
        first_of_elem = len(meta)
        for i in range(len(c) - 1):
            if np.array_equal(c[i], c[i + 1]):
                continue
            segs.append([c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1]])
            meta.append([ei, pos, 0, closed])
            pos += 1
        for m in meta[first_of_elem:]:
            m[2] = pos  # emitted count for this element
        # a closed element has EMPTY (Mod-2) boundary: its endpoint is
        # an *interior* point, so contacts there are non-simple
        terminals[ei] = (
            set() if closed else {tuple(c[0]), tuple(c[-1])}
        )
    return (
        np.asarray(segs, dtype=np.float64).reshape(-1, 4),
        [tuple(m) for m in meta],
        terminals,
    )


def is_simple(g: G.Geom) -> bool:
    if g.is_empty:
        return True
    d = g.dimension()
    if d == 0:
        pts = [tuple(p) for p in g.all_coords()]
        return len(pts) == len(set(pts))
    if d == 2:
        # polygonal geometry: simple iff every ring is simple as a
        # closed line (IsSimpleOp polygonal path)
        for p in g.geoms():
            if p.type_id != G.POLYGON:
                continue
            for r in p.data:
                if len(r) and _ring_self_intersects(r):
                    return False
                if len(r) and len(r) < 4:
                    return False
        return True
    segs, meta, terminals = _elem_segments(g)
    n = len(segs)
    if n < 2:
        return True
    ia, ib = np.triu_indices(n, k=1)
    cls = intersect_pairs(segs[ia], segs[ib])
    hits = np.flatnonzero(cls != 0)
    for k in hits:
        i, j = int(ia[k]), int(ib[k])
        (ei, pi, ni, ci) = meta[i]
        (ej, pj, nj, cj) = meta[j]
        adjacent = ei == ej and (
            abs(pi - pj) == 1
            or (ci and {pi, pj} == {0, ni - 1})
        )
        if adjacent:
            # consecutive segments share one vertex; a collinear
            # overlap between them (backtrack) is non-simple
            if cls[k] == COLLINEAR_INTERSECTION:
                return False
            continue
        if cls[k] == COLLINEAR_INTERSECTION:
            return False
        # point intersection: must be a shared endpoint that is a
        # terminal vertex of both elements
        p = _contact_point(segs[i], segs[j])
        if p is None:
            return False  # proper crossing
        if ei == ej:
            return False  # same element, non-adjacent touch
        if p not in terminals[ei] or p not in terminals[ej]:
            return False
    return True


def _contact_point(a: np.ndarray, b: np.ndarray):
    """Shared endpoint of two segments, or None (proper crossing)."""
    a_pts = {(a[0], a[1]), (a[2], a[3])}
    b_pts = {(b[0], b[1]), (b[2], b[3])}
    shared = a_pts & b_pts
    if not shared:
        return None
    # shared endpoint exists; but the pair may ALSO overlap elsewhere —
    # callers already excluded collinear class; a point-class
    # intersection with a shared endpoint is exactly that endpoint
    return next(iter(shared))


# ----------------------------------------------------------------------
# validity
# ----------------------------------------------------------------------


def _ring_segs(r: np.ndarray) -> np.ndarray:
    s = np.hstack([r[:-1], r[1:]])
    keep = ~((s[:, 0] == s[:, 2]) & (s[:, 1] == s[:, 3]))
    return s[keep]


def _ring_self_intersects(r: np.ndarray) -> bool:
    segs = _ring_segs(r)
    n = len(segs)
    if n < 3:
        return True
    ia, ib = np.triu_indices(n, k=1)
    cls = intersect_pairs(segs[ia], segs[ib])
    for k in np.flatnonzero(cls != 0):
        i, j = int(ia[k]), int(ib[k])
        adjacent = (j - i == 1) or (i == 0 and j == n - 1)
        if adjacent:
            if cls[k] == COLLINEAR_INTERSECTION:
                return True
            continue
        return True  # any non-adjacent contact is a self-intersection
    return False


def _on_seg_interior(p, s) -> bool:
    """p lies on segment s strictly between its endpoints (collinear
    assumed checked by caller via orientation)."""
    from geos_spark.kernels.orientation import orientation_index

    if orientation_index(s[0], s[1], s[2], s[3], p[0], p[1]) != 0:
        return False
    if (p[0], p[1]) in ((s[0], s[1]), (s[2], s[3])):
        return False
    return (
        min(s[0], s[2]) <= p[0] <= max(s[0], s[2])
        and min(s[1], s[3]) <= p[1] <= max(s[1], s[3])
    )


def _vertex_neighbors(ring: np.ndarray, p) -> tuple | None:
    """The two ring vertices adjacent to vertex p (ring closed)."""
    body = ring[:-1]
    for i in range(len(body)):
        if body[i, 0] == p[0] and body[i, 1] == p[1]:
            return tuple(body[i - 1]), tuple(body[(i + 1) % len(body)])
    return None


def _sides(a1, a2, pts) -> list[int]:
    from geos_spark.kernels.orientation import orientation_index

    return [
        int(orientation_index(a1[0], a1[1], a2[0], a2[1], q[0], q[1]))
        for q in pts
    ]


def _ring_pair_contacts(ra: np.ndarray, rb: np.ndarray):
    """Classify the interaction of two rings.

    Returns (crosses, touch_points): crosses=True for a proper edge
    crossing, a collinear shared piece, or a vertex-on-edge contact
    where the other ring's adjacent vertices lie on strictly opposite
    sides (i.e. the boundary passes through). touch_points are the
    point contacts (for the interior-connectivity touch graph).
    """
    sa, sb = _ring_segs(ra), _ring_segs(rb)
    na, nb = len(sa), len(sb)
    if na == 0 or nb == 0:
        return False, []
    ia = np.repeat(np.arange(na), nb)
    ib = np.tile(np.arange(nb), na)
    cls = intersect_pairs(sa[ia], sb[ib])
    if (cls == COLLINEAR_INTERSECTION).any():
        return True, []
    touches: set[tuple] = set()
    for k in np.flatnonzero(cls == POINT_INTERSECTION):
        i, j = int(ia[k]), int(ib[k])
        A, B = sa[i], sb[j]
        shared = _contact_point(A, B)
        if shared is not None:
            # vertex-vertex contact: check side configuration of B's
            # neighbors around the shared vertex w.r.t. A's rings is
            # deferred to the touch graph (point touch)
            touches.add(shared)
            continue
        # one endpoint on the other's interior, or proper crossing
        handled = False
        for p in ((A[0], A[1]), (A[2], A[3])):
            if _on_seg_interior(p, B):
                nbrs = _vertex_neighbors(ra, p)
                if nbrs is None:
                    continue
                s = [x for x in _sides((B[0], B[1]), (B[2], B[3]), nbrs) if x != 0]
                if len(s) == 2 and s[0] * s[1] < 0:
                    return True, []  # ring a passes through edge of b
                touches.add(p)
                handled = True
        for p in ((B[0], B[1]), (B[2], B[3])):
            if _on_seg_interior(p, A):
                nbrs = _vertex_neighbors(rb, p)
                if nbrs is None:
                    continue
                s = [x for x in _sides((A[0], A[1]), (A[2], A[3]), nbrs) if x != 0]
                if len(s) == 2 and s[0] * s[1] < 0:
                    return True, []
                touches.add(p)
                handled = True
        if not handled:
            return True, []  # proper interior-interior crossing
    return False, sorted(touches)


def _point_in_ring(p, ring: np.ndarray) -> int:
    pack = PolygonPack.from_rings([[ring]])
    return int(
        locate_points(
            np.asarray([p], dtype=np.float64), pack,
            np.array([0]), np.array([0]),
        )[0]
    )


def _locate_in_polygon(p, poly: G.Geom) -> int:
    """Locate a point in a polygon WITH holes."""
    pack = PolygonPack.from_rings([poly.data])
    return int(
        locate_points(
            np.asarray([p], dtype=np.float64), pack,
            np.array([0]), np.array([0]),
        )[0]
    )


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b) -> bool:
        """Union; returns False if already connected (cycle)."""
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.parent[ra] = rb
        return True


def _ring_self_intersection_info(r: np.ndarray):
    """None if clean, else (message, witness point) — proper crossings
    report "Self-intersection" at the computed intersection, vertex
    touches report "Ring Self-intersection" at the shared vertex
    (TopologyValidationError errMsg semantics,
    src/operation/valid/TopologyValidationError.cpp:32-46)."""
    from geos_spark.kernels.dd import segment_intersection_point
    from geos_spark.kernels.orientation import orientation_index

    segs = _ring_segs(r)
    n = len(segs)
    if n < 3:
        return ("Too few points in geometry component",
                (float(r[0][0]), float(r[0][1])))
    ia, ib = np.triu_indices(n, k=1)
    cls = intersect_pairs(segs[ia], segs[ib])
    for k in np.flatnonzero(cls != 0):
        i, j = int(ia[k]), int(ib[k])
        adjacent = (j - i == 1) or (i == 0 and j == n - 1)
        a, b = segs[i], segs[j]
        if adjacent:
            if cls[k] == COLLINEAR_INTERSECTION:
                return ("Ring Self-intersection",
                        (float(a[2]), float(a[3])))
            continue
        shared = _contact_point(tuple(a), tuple(b))
        if shared is not None:
            return ("Ring Self-intersection",
                    (float(shared[0]), float(shared[1])))
        o1 = int(orientation_index(a[0], a[1], a[2], a[3], b[0], b[1]))
        o2 = int(orientation_index(a[0], a[1], a[2], a[3], b[2], b[3]))
        o3 = int(orientation_index(b[0], b[1], b[2], b[3], a[0], a[1]))
        o4 = int(orientation_index(b[0], b[1], b[2], b[3], a[2], a[3]))
        pt = segment_intersection_point(
            (a[0], a[1]), (a[2], a[3]), (b[0], b[1]), (b[2], b[3]),
            o1, o2, o3, o4,
        )
        return ("Self-intersection", (float(pt[0]), float(pt[1])))
    return None


def _pt(v) -> tuple:
    return (float(v[0]), float(v[1]))


def _ring_nested(test: np.ndarray, target: np.ndarray) -> bool:
    """PolygonTopologyAnalyzer::isRingNested: is the test ring inside
    the region bounded by the target ring, deciding boundary-incident
    start points by the corner-sector topology
    (PolygonTopologyAnalyzer.cpp:76-127)."""
    from geos_spark.kernels.coverage_valid import _is_interior_segment

    p0 = test[0]
    loc = _point_in_ring(tuple(p0), target)
    if loc == EXTERIOR:
        return False
    if loc == INTERIOR:
        return True
    # boundary: find a non-equal follow vertex of the test ring
    p1 = None
    for i in range(1, len(test)):
        if test[i][0] != p0[0] or test[i][1] != p0[1]:
            p1 = test[i]
            break
    if p1 is None:
        return False
    # segment of target containing p0
    idx = None
    for i in range(len(target) - 1):
        a, b = target[i], target[i + 1]
        if (
            min(a[0], b[0]) <= p0[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= p0[1] <= max(a[1], b[1])
        ):
            from geos_spark.kernels.orientation import orientation_index

            if (
                int(
                    orientation_index(
                        np.array([a[0]]), np.array([a[1]]),
                        np.array([b[0]]), np.array([b[1]]),
                        np.array([p0[0]]), np.array([p0[1]]),
                    )[0]
                )
                == 0
            ):
                idx = i
                break
    if idx is None:
        return False

    def vert_prev(i):
        j = i
        c = target[j]
        while c[0] == p0[0] and c[1] == p0[1]:
            j = len(target) - 2 if j == 0 else j - 1
            c = target[j]
        return c

    def vert_next(i):
        j = i + 1
        c = target[j]
        while c[0] == p0[0] and c[1] == p0[1]:
            j = 0 if j >= len(target) - 2 else j + 1
            c = target[j]
        return c

    r_prev = vert_prev(idx)
    r_next = vert_next(idx)
    interior_on_right = _ring_signed_area(target) <= 0
    if not interior_on_right:
        r_prev, r_next = r_next, r_prev
    return _is_interior_segment(p0, r_prev, r_next, p1)


def _ring_signed_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _corner_arms(ring: np.ndarray, pt):
    """Arms of ``ring``'s corner at contact point ``pt``: prev/next
    non-equal vertices for a vertex contact, the segment endpoints for
    an edge-interior contact (PolygonIntersectionAnalyzer.cpp:120-136).
    Returns None if pt is not on the ring."""
    from geos_spark.kernels.orientation import orientation_index

    n = len(ring) - 1
    for i in range(n):
        if ring[i][0] == pt[0] and ring[i][1] == pt[1]:
            j = i
            c = ring[j]
            while c[0] == pt[0] and c[1] == pt[1]:
                j = (j - 1) % n
                c = ring[j]
            prv = c
            j = (i + 1) % n
            c = ring[j]
            while c[0] == pt[0] and c[1] == pt[1]:
                j = (j + 1) % n
                c = ring[j]
            return prv, c
    for i in range(n):
        a, b = ring[i], ring[i + 1]
        if (
            min(a[0], b[0]) <= pt[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= pt[1] <= max(a[1], b[1])
            and int(
                orientation_index(
                    np.array([a[0]]), np.array([a[1]]),
                    np.array([b[0]]), np.array([b[1]]),
                    np.array([pt[0]]), np.array([pt[1]]),
                )[0]
            )
            == 0
        ):
            return a, b
    return None


def _vertex_crossing_point(ring_a: np.ndarray, ring_b: np.ndarray, touches):
    """First touch point where the two rings CROSS at the contact
    (PolygonNodeTopology::isCrossing), or None."""
    from geos_spark.kernels.coverage_valid import _is_crossing

    for t in touches:
        arms_a = _corner_arms(ring_a, t)
        arms_b = _corner_arms(ring_b, t)
        if arms_a is None or arms_b is None:
            continue
        if _is_crossing(t, arms_a[0], arms_a[1], arms_b[0], arms_b[1]):
            return t
    return None


def _touch_cycle_point(pair_touches: dict):
    """PolygonRing::findHoleCycleLocation over single-point ring-pair
    touches: DFS per touch set; re-reaching a ring through a
    different point than the entry is a hole cycle
    (PolygonRing.cpp:147-230)."""
    adj: dict = {}
    for (r0, r1), pt in pair_touches.items():
        adj.setdefault(r0, []).append((r1, pt))
        adj.setdefault(r1, []).append((r0, pt))
    root_of: dict = {}
    for start in adj:
        if start in root_of:
            continue
        root_of[start] = start
        stack = []
        for ring, pt in adj[start]:
            root_of[ring] = start
            stack.append((ring, pt))
        while stack:
            ring, entry_pt = stack.pop()
            for nring, npt in adj[ring]:
                if npt == entry_pt:
                    continue
                if root_of.get(nring) == start:
                    return npt
                root_of[nring] = start
                stack.append((nring, npt))
    return None


def _nested_shell_point(inner: G.Geom, outer: G.Geom):
    """IndexedNestedPolygonTester::findNestedPoint: a point of
    ``inner``'s shell nested in ``outer`` (and not inside one of its
    holes), or None (IndexedNestedPolygonTester.cpp:84-196)."""
    shell = inner.data[0]
    ei = inner.envelope()
    eo = outer.envelope()
    if not (
        eo[0] <= ei[0] and eo[1] <= ei[1] and ei[2] <= eo[2]
        and ei[3] <= eo[3]
    ):
        return None
    for k in (0, 1):
        loc = _locate_in_polygon(tuple(shell[k]), outer)
        if loc == EXTERIOR:
            return None
        if loc == INTERIOR:
            return _pt(shell[k])
    # both probe points on the boundary: corner-sector topology
    if not _ring_nested(shell, outer.data[0]):
        return None
    for hole in outer.data[1:]:
        hx0, hy0 = hole[:, 0].min(), hole[:, 1].min()
        hx1, hy1 = hole[:, 0].max(), hole[:, 1].max()
        if (
            hx0 <= ei[0] and hy0 <= ei[1] and ei[2] <= hx1
            and ei[3] <= hy1
            and _ring_nested(shell, hole)
        ):
            return None
    return _pt(shell[0])


def _poly_valid_detail(p: G.Geom):
    """None if valid, else (message, point) per IsValidOp."""
    rings = [r for r in p.data if len(r) > 0]
    if not rings:
        return None  # empty polygon is valid
    for r in rings:
        if not np.array_equal(r[0], r[-1]):
            return ("Ring is not closed", _pt(r[0]))
        if len(r) < 4:
            return ("Too few points in geometry component", _pt(r[0]))
        if not np.isfinite(r).all():
            bad = r[~np.isfinite(r).all(axis=1)][0]
            return ("Invalid Coordinate", _pt(bad))
        info = _ring_self_intersection_info(r)
        if info is not None:
            return info
    shell = rings[0]
    holes = rings[1:]
    # single-point touches per ring pair; a second distinct point is
    # an immediate disconnection (PolygonRing::isOnlyTouch), a cycle
    # through distinct points is found by the touch-set scan
    pair_touches: dict = {}
    for hi, h in enumerate(holes):
        crosses, touches = _ring_pair_contacts(shell, h)
        if crosses:
            return ("Self-intersection", _pt(h[0]))
        xpt = _vertex_crossing_point(shell, h, touches)
        if xpt is not None:
            return ("Self-intersection", _pt(np.asarray(xpt)))
        if len(touches) > 1:
            return ("Interior is disconnected", _pt(touches[1]))
        if touches:
            pair_touches[(("s",), ("h", hi))] = touches[0]
        # hole inside shell: no vertex outside, some point strictly in
        locs = [_point_in_ring(v, shell) for v in h[:-1]]
        for v, loc in zip(h[:-1], locs):
            if loc == EXTERIOR:
                return ("Hole lies outside shell", _pt(v))
        if all(loc != INTERIOR for loc in locs):
            return ("Hole lies outside shell", _pt(h[0]))
    for i in range(len(holes)):
        for j in range(i + 1, len(holes)):
            crosses, touches = _ring_pair_contacts(holes[i], holes[j])
            if crosses:
                return ("Self-intersection", _pt(holes[j][0]))
            xpt = _vertex_crossing_point(holes[i], holes[j], touches)
            if xpt is not None:
                return ("Self-intersection", _pt(np.asarray(xpt)))
            if len(touches) > 1:
                return ("Interior is disconnected", _pt(touches[1]))
            if touches:
                pair_touches[(("h", i), ("h", j))] = touches[0]
            li = [_point_in_ring(v, holes[j]) for v in holes[i][:-1]]
            lj = [_point_in_ring(v, holes[i]) for v in holes[j][:-1]]
            if any(loc == INTERIOR for loc in li) or any(
                loc == INTERIOR for loc in lj
            ):
                return ("Holes are nested", _pt(holes[i][0]))
    cyc = _touch_cycle_point(pair_touches)
    if cyc is not None:
        return ("Interior is disconnected", _pt(np.asarray(cyc)))
    return None


def valid_detail(g: G.Geom):
    """IsValidOp with error reporting (TopologyValidationError):
    None if valid, else (message, (x, y))."""
    if g.is_empty:
        return None
    coords = g.all_coords()
    if not np.isfinite(coords).all():
        bad = coords[~np.isfinite(coords).all(axis=1)][0]
        return ("Invalid Coordinate", _pt(bad))
    if g.type_id in (G.POINT, G.MULTIPOINT):
        return None
    if g.type_id in (G.LINESTRING, G.MULTILINESTRING):
        for p in g.geoms():
            if p.type_id != G.LINESTRING or p.is_empty:
                continue
            if len(np.unique(p.data, axis=0)) < 2:
                return ("Too few points in geometry component",
                        _pt(p.data[0]))
            if p.is_ring:
                if len(p.data) < 4:
                    return ("Too few points in geometry component",
                            _pt(p.data[0]))
                if not np.array_equal(p.data[0], p.data[-1]):
                    return ("Ring is not closed", _pt(p.data[0]))
                info = _ring_self_intersection_info(p.data)
                if info is not None:
                    return info
        return None
    if g.type_id == G.POLYGON:
        return _poly_valid_detail(g)
    if g.type_id == G.MULTIPOLYGON:
        polys = [
            p for p in g.geoms() if p.type_id == G.POLYGON and not p.is_empty
        ]
        for p in polys:
            info = _poly_valid_detail(p)
            if info is not None:
                return info
        # element polygons: boundaries must not cross or share edges;
        # interiors must not nest or overlap (contain-in-hole is fine)
        for i in range(len(polys)):
            for j in range(i + 1, len(polys)):
                ei = polys[i].envelope()
                ej = polys[j].envelope()
                if (
                    ei[2] < ej[0] or ej[2] < ei[0]
                    or ei[3] < ej[1] or ej[3] < ei[1]
                ):
                    continue
                for ri in polys[i].data:
                    for rj in polys[j].data:
                        crosses, touches = _ring_pair_contacts(ri, rj)
                        if crosses:
                            return ("Self-intersection", _pt(rj[0]))
                        xpt = _vertex_crossing_point(ri, rj, touches)
                        if xpt is not None:
                            return (
                                "Self-intersection",
                                _pt(np.asarray(xpt)),
                            )
                for a, b in ((i, j), (j, i)):
                    info = _nested_shell_point(polys[a], polys[b])
                    if info is not None:
                        return ("Nested shells", info)
        return None
    # collection: all parts valid
    for p in g.data:
        info = valid_detail(p)
        if info is not None:
            return info
    return None


def is_valid(g: G.Geom) -> bool:
    return valid_detail(g) is None


def _fmt_coord(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def valid_reason(g: G.Geom) -> str:
    """GEOSisValidReason: "Valid Geometry" or "<message>[<x> <y>]"."""
    info = valid_detail(g)
    if info is None:
        return "Valid Geometry"
    msg, (x, y) = info
    return f"{msg}[{_fmt_coord(x)} {_fmt_coord(y)}]"
