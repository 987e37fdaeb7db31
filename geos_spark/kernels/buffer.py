"""Buffer (Minkowski dilation/erosion) kernel.

Faithful reimplementation of the reference buffer pipeline:

- offset curve generation: ``OffsetSegmentGenerator``
  (``src/operation/buffer/OffsetSegmentGenerator.cpp``) — fillet arcs
  quantised at pi/2/quadrantSegments, outside/inside turn and
  collinear rules, round/flat/square caps, round/mitre/bevel joins,
  curve-vertex snap distance ``distance * 1e-4``;
- input simplification: ``BufferInputLineSimplifier``
  (``BufferInputLineSimplifier.cpp``, tolerance ``distance/100``);
- curve-set construction: ``BufferCurveSetBuilder`` rules — ring
  orientation/side flips, fully-eroded-ring and inverted-ring-curve
  elimination (``BufferCurveSetBuilder.cpp:251-500``);
- result extraction: the reference labels noded raw curves by depth
  (``BufferBuilder``/``SubgraphDepthLocater``); here the same faces
  are classified by winding number over the noded arrangement
  (buffer region = winding != 0 — depth > 0 in the reference's
  terms), and rings are traced with the overlay kernel's minimal-ring
  machinery.

Correctness gate: the xmltester buffer cases are tolerance-matched
(``tests/xmltester/BufferResultMatcher.cpp``: relative symdiff area
< 1e-3, boundary Hausdorff < distance/100), mirrored in the pytest
suite.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.dd import (
    _point_to_segment,
    dd_intersection,
    segment_intersection_point,
)
from geos_spark.kernels.orientation import orientation_index
from geos_spark.kernels.scalars import ring_signed_area
from geos_spark.kernels.segments import intersect_pairs

_CW = -1
_CCW = 1
_LEFT = 1
_RIGHT = 2

_PI2 = math.pi / 2.0

CAP_ROUND = "round"
CAP_FLAT = "flat"
CAP_SQUARE = "square"
JOIN_ROUND = "round"
JOIN_MITRE = "mitre"
JOIN_BEVEL = "bevel"


def _orient(p0, p1, p2) -> int:
    return int(
        orientation_index(p0[0], p0[1], p1[0], p1[1], p2[0], p2[1])
    )


def _sin_cos_snap(ang):
    s, c = math.sin(ang), math.cos(ang)
    if abs(s) < 5e-16:
        s = 0.0
    if abs(c) < 5e-16:
        c = 0.0
    return s, c


def _dist(a, b) -> float:
    return math.hypot(a[0] - b[0], a[1] - b[1])


class _SegString:
    """OffsetSegmentString: min-vertex-distance filtered point list."""

    def __init__(self, min_dist: float):
        self.pts: list = []
        self.min_dist = min_dist

    def add(self, p) -> None:
        p = (float(p[0]), float(p[1]))
        if (
            self.min_dist > 0.0
            and self.pts
            and _dist(self.pts[-1], p) < self.min_dist
        ):
            return
        self.pts.append(p)

    def close_ring(self) -> None:
        if not self.pts:
            return
        if self.pts[-1] != self.pts[0]:
            self.pts.append(self.pts[0])


def _offset_seg(p0, p1, side, distance):
    side_sign = 1 if side == _LEFT else -1
    dx = p1[0] - p0[0]
    dy = p1[1] - p0[1]
    length = math.sqrt(dx * dx + dy * dy)
    ux = side_sign * distance * dx / length
    uy = side_sign * distance * dy / length
    return (
        (p0[0] - uy, p0[1] + ux),
        (p1[0] - uy, p1[1] + ux),
    )


def _seg_intersection(a0, a1, b0, b1):
    """LineIntersector point for two segments, or None."""
    A = np.array([[a0[0], a0[1], a1[0], a1[1]]])
    B = np.array([[b0[0], b0[1], b1[0], b1[1]]])
    cls = intersect_pairs(A, B)
    if cls[0] == 0:
        return None
    o1 = _orient(a0, a1, b0)
    o2 = _orient(a0, a1, b1)
    o3 = _orient(b0, b1, a0)
    o4 = _orient(b0, b1, a1)
    return segment_intersection_point(a0, a1, b0, b1, o1, o2, o3, o4)


def _intersection_line_segment(l1, l2, s1, s2):
    """Intersection::intersectionLineSegment
    (src/algorithm/Intersection.cpp:52-92)."""
    o1 = _orient(l1, l2, s1)
    if o1 == 0:
        return s1
    o2 = _orient(l1, l2, s2)
    if o2 == 0:
        return s2
    if (o1 > 0 and o2 > 0) or (o1 < 0 and o2 < 0):
        return None
    pt = dd_intersection(l1, l2, s1, s2)
    if pt is not None:
        return pt
    d1 = _point_to_segment(s1, l1, l2)  # perpendicular-ish fallback
    d2 = _point_to_segment(s2, l1, l2)
    return s1 if d1 < d2 else s2


class _Generator:
    """OffsetSegmentGenerator (positive distance)."""

    def __init__(self, distance, quad_segs=8, cap=CAP_ROUND,
                 join=JOIN_ROUND, mitre_limit=5.0):
        self.distance = distance
        self.cap = cap
        self.join = join
        self.mitre_limit = mitre_limit
        qs = max(int(quad_segs), 1)
        self.fillet_quantum = _PI2 / qs
        self.closing_factor = (
            80 if (quad_segs >= 8 and join == JOIN_ROUND) else 1
        )
        self.seglist = _SegString(distance * 1.0e-4)
        self.s0 = self.s1 = self.s2 = None
        self.off0 = self.off1 = None
        self.side = 0

    # -- state ----------------------------------------------------------
    def init_side(self, s1, s2, side):
        self.s1 = s1
        self.s2 = s2
        self.side = side
        self.off1 = _offset_seg(s1, s2, side, self.distance)

    def add_first_segment(self):
        self.seglist.add(self.off1[0])

    def add_last_segment(self):
        self.seglist.add(self.off1[1])

    def add_next_segment(self, p, add_start_point):
        if self.s2 == p:
            return
        self.s0, self.s1, self.s2 = self.s1, self.s2, p
        self.off0 = _offset_seg(self.s0, self.s1, self.side, self.distance)
        self.off1 = _offset_seg(self.s1, self.s2, self.side, self.distance)
        orientation = _orient(self.s0, self.s1, self.s2)
        outside = (orientation == _CW and self.side == _LEFT) or (
            orientation == _CCW and self.side == _RIGHT
        )
        if orientation == 0:
            self._add_collinear(add_start_point)
        elif outside:
            self._add_outside_turn(orientation, add_start_point)
        else:
            self._add_inside_turn()

    # -- joins ----------------------------------------------------------
    def _add_collinear(self, add_start_point):
        # doubling back iff the segments overlap (numInt == 2)
        dot = (self.s1[0] - self.s0[0]) * (self.s2[0] - self.s1[0]) + (
            self.s1[1] - self.s0[1]
        ) * (self.s2[1] - self.s1[1])
        if dot >= 0:
            return  # straight continuation: no join vertex needed
        if self.join in (JOIN_BEVEL, JOIN_MITRE):
            if add_start_point:
                self.seglist.add(self.off0[1])
            self.seglist.add(self.off1[0])
        else:
            self._add_directed_fillet_pts(
                self.s1, self.off0[1], self.off1[0], _CW, self.distance
            )

    def _add_outside_turn(self, orientation, add_start_point):
        if _dist(self.off0[1], self.off1[0]) < self.distance * 1.0e-3:
            self.seglist.add(self.off0[1])
            return
        if self.join == JOIN_MITRE:
            self._add_mitre_join()
        elif self.join == JOIN_BEVEL:
            self.seglist.add(self.off0[1])
            self.seglist.add(self.off1[0])
        else:
            if add_start_point:
                self.seglist.add(self.off0[1])
            self._add_directed_fillet_pts(
                self.s1, self.off0[1], self.off1[0], orientation,
                self.distance,
            )
            self.seglist.add(self.off1[0])

    def _add_inside_turn(self):
        pt = _seg_intersection(
            self.off0[0], self.off0[1], self.off1[0], self.off1[1]
        )
        if pt is not None:
            self.seglist.add(pt)
            return
        if _dist(self.off0[1], self.off1[0]) < self.distance * 1.0e-3:
            self.seglist.add(self.off0[1])
            return
        self.seglist.add(self.off0[1])
        k = self.closing_factor
        if k > 0:
            self.seglist.add(
                ((k * self.off0[1][0] + self.s1[0]) / (k + 1),
                 (k * self.off0[1][1] + self.s1[1]) / (k + 1))
            )
            self.seglist.add(
                ((k * self.off1[0][0] + self.s1[0]) / (k + 1),
                 (k * self.off1[0][1] + self.s1[1]) / (k + 1))
            )
        else:
            self.seglist.add(self.s1)
        self.seglist.add(self.off1[0])

    def _add_mitre_join(self):
        limit_dist = self.mitre_limit * self.distance
        pt = dd_intersection(
            self.off0[0], self.off0[1], self.off1[0], self.off1[1]
        )
        if pt is not None and _dist(pt, self.s1) <= limit_dist:
            self.seglist.add(pt)
            return
        bevel_dist = _point_to_segment(self.s1, self.off0[1], self.off1[0])
        if bevel_dist >= limit_dist:
            self.seglist.add(self.off0[1])
            self.seglist.add(self.off1[0])
            return
        self._add_limited_mitre_join(limit_dist)

    def _add_limited_mitre_join(self, limit_dist):
        corner = self.s1
        ang0 = math.atan2(self.s0[1] - corner[1], self.s0[0] - corner[0])
        ang2 = math.atan2(self.s2[1] - corner[1], self.s2[0] - corner[0])
        interior = ang2 - ang0
        while interior <= -math.pi:
            interior += 2 * math.pi
        while interior > math.pi:
            interior -= 2 * math.pi
        bisector = ang0 + interior / 2.0
        bisector_out = bisector + math.pi
        s, c = _sin_cos_snap(bisector_out)
        mid = (corner[0] + limit_dist * c, corner[1] + limit_dist * s)
        s2_, c2_ = _sin_cos_snap(bisector_out + _PI2)
        b0 = (mid[0] + self.distance * c2_, mid[1] + self.distance * s2_)
        b1 = (mid[0] - self.distance * c2_, mid[1] - self.distance * s2_)
        i0 = _intersection_line_segment(self.off0[0], self.off0[1], b0, b1)
        i1 = _intersection_line_segment(self.off1[0], self.off1[1], b0, b1)
        if i0 is not None and i1 is not None:
            self.seglist.add(i0)
            self.seglist.add(i1)
        else:
            self.seglist.add(self.off0[1])
            self.seglist.add(self.off1[0])

    # -- fillets / caps --------------------------------------------------
    def _add_directed_fillet_pts(self, p, p0, p1, direction, radius):
        start = math.atan2(p0[1] - p[1], p0[0] - p[0])
        end = math.atan2(p1[1] - p[1], p1[0] - p[0])
        if direction == _CW:
            if start <= end:
                start += 2 * math.pi
        else:
            if start >= end:
                start -= 2 * math.pi
        self.seglist.add(p0)
        self._add_directed_fillet(p, start, end, direction, radius)
        self.seglist.add(p1)

    def _add_directed_fillet(self, p, start, end, direction, radius):
        f = -1 if direction == _CW else 1
        total = abs(start - end)
        nsegs = int(total / self.fillet_quantum + 0.5)
        if nsegs < 1:
            return
        inc = total / nsegs
        for i in range(nsegs):
            s, c = _sin_cos_snap(start + f * i * inc)
            self.seglist.add((p[0] + radius * c, p[1] + radius * s))

    def add_line_end_cap(self, p0, p1):
        off_l = _offset_seg(p0, p1, _LEFT, self.distance)
        off_r = _offset_seg(p0, p1, _RIGHT, self.distance)
        angle = math.atan2(p1[1] - p0[1], p1[0] - p0[0])
        if self.cap == CAP_ROUND:
            self.seglist.add(off_l[1])
            self._add_directed_fillet(
                p1, angle + _PI2, angle - _PI2, _CW, self.distance
            )
            self.seglist.add(off_r[1])
        elif self.cap == CAP_FLAT:
            self.seglist.add(off_l[1])
            self.seglist.add(off_r[1])
        else:  # square
            s, c = _sin_cos_snap(angle)
            ox = abs(self.distance) * c
            oy = abs(self.distance) * s
            self.seglist.add((off_l[1][0] + ox, off_l[1][1] + oy))
            self.seglist.add((off_r[1][0] + ox, off_r[1][1] + oy))

    def create_circle(self, p, distance):
        self.seglist.add((p[0] + distance, p[1]))
        self._add_directed_fillet(p, 0.0, 2 * math.pi, -1, distance)
        self.seglist.close_ring()

    def create_square(self, p, d):
        self.seglist.add((p[0] + d, p[1] + d))
        self.seglist.add((p[0] + d, p[1] - d))
        self.seglist.add((p[0] - d, p[1] - d))
        self.seglist.add((p[0] - d, p[1] + d))
        self.seglist.close_ring()

    def close_ring(self):
        self.seglist.close_ring()

    def coordinates(self):
        return self.seglist.pts


# ----------------------------------------------------------------------
# input simplification (BufferInputLineSimplifier)
# ----------------------------------------------------------------------

_NUM_PTS_TO_CHECK = 10


def _simplify_input(pts: list, distance_tol: float) -> list:
    angle_orient = _CCW if distance_tol >= 0 else _CW
    tol = abs(distance_tol)
    n = len(pts)
    deleted = [False] * n

    def next_live(i):
        j = i + 1
        while j < n and deleted[j]:
            j += 1
        return j

    def is_shallow(p0, p1, p2):
        return _point_to_segment(p1, p0, p2) < tol

    def is_deletable(i0, i1, i2):
        p0, p1, p2 = pts[i0], pts[i1], pts[i2]
        if _orient(p0, p1, p2) != angle_orient:
            return False
        if not is_shallow(p0, p1, p2):
            return False
        inc = (i2 - i0) // _NUM_PTS_TO_CHECK
        if inc <= 0:
            inc = 1
        for i in range(i0, i2, inc):
            if not is_shallow(p0, p2, pts[i]):
                return False
        return True

    changed = True
    while changed:
        changed = False
        index = 1
        mid = next_live(index)
        last = next_live(mid)
        while last < n:
            if is_deletable(index, mid, last):
                deleted[mid] = True
                changed = True
                index = last
            else:
                index = mid
            mid = next_live(index)
            last = next_live(mid)
    return [pts[i] for i in range(n) if not deleted[i]]


# ----------------------------------------------------------------------
# curve builders (OffsetCurveBuilder)
# ----------------------------------------------------------------------


def _line_curve(pts, distance, **params) -> list:
    """Closed raw offset curve around a line (both sides + caps)."""
    gen = _Generator(abs(distance), **params)
    if len(pts) <= 1:
        if params.get("cap", CAP_ROUND) == CAP_SQUARE:
            gen.create_square(pts[0], distance)
        else:
            gen.create_circle(pts[0], distance)
        return gen.coordinates()
    tol = abs(distance) / 100.0
    simp1 = _simplify_input(pts, tol)
    n1 = len(simp1) - 1
    gen.init_side(simp1[0], simp1[1], _LEFT)
    for i in range(2, n1 + 1):
        gen.add_next_segment(simp1[i], True)
    gen.add_last_segment()
    gen.add_line_end_cap(simp1[n1 - 1], simp1[n1])
    simp2 = _simplify_input(pts, -tol)
    n2 = len(simp2) - 1
    gen.init_side(simp2[n2], simp2[n2 - 1], _LEFT)
    for i in range(n2 - 2, -1, -1):
        gen.add_next_segment(simp2[i], True)
    gen.add_last_segment()
    gen.add_line_end_cap(simp2[1], simp2[0])
    gen.close_ring()
    return gen.coordinates()


def _ring_curve(pts, side, distance, **params) -> list:
    """One-sided closed offset curve of a ring (no caps)."""
    if distance == 0.0:
        return list(pts)
    if len(pts) <= 2:
        return _line_curve(pts, distance, **params)
    tol = abs(distance) / 100.0
    if side == _RIGHT:
        tol = -tol
    simp = _simplify_input(pts, tol)
    n = len(simp) - 1
    gen = _Generator(abs(distance), **params)
    gen.init_side(simp[n - 1], simp[0], side)
    for i in range(1, n + 1):
        gen.add_next_segment(simp[i], i != 1)
    gen.close_ring()
    return gen.coordinates()


# ----------------------------------------------------------------------
# curve set construction (BufferCurveSetBuilder)
# ----------------------------------------------------------------------


def _dedupe_ring(r: np.ndarray) -> list:
    pts = [(float(x), float(y)) for x, y in r]
    out = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
    return out


def _ring_fully_eroded(pts, is_hole, distance) -> bool:
    if len(pts) < 4:
        return True
    if len(pts) == 4:
        return _triangle_eroded(pts, distance)
    erodable = (is_hole and distance > 0) or (not is_hole and distance < 0)
    if erodable:
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        env_min = min(max(xs) - min(xs), max(ys) - min(ys))
        if 2 * abs(distance) > env_min:
            return True
    return False


def _triangle_eroded(pts, distance) -> bool:
    a, b, c = pts[0], pts[1], pts[2]
    la = _dist(b, c)
    lb = _dist(a, c)
    lc = _dist(a, b)
    s = la + lb + lc
    if s == 0:
        return True
    inc = (
        (la * a[0] + lb * b[0] + lc * c[0]) / s,
        (la * a[1] + lb * b[1] + lc * c[1]) / s,
    )
    d = _point_to_segment(inc, a, b)
    return d < abs(distance)


def _ring_curve_inverted(ring_pts, dist, curve) -> bool:
    """BufferCurveSetBuilder::isRingCurveInverted."""
    if dist == 0.0 or len(ring_pts) <= 3:
        return False
    if len(ring_pts) >= 9:  # MAX_INVERTED_RING_SIZE
        return False
    if len(curve) > 4 * len(ring_pts):  # INVERTED_CURVE_VERTEX_FACTOR
        return False
    # hasPointOnBuffer
    tol = 0.99 * abs(dist)  # NEARNESS_FACTOR
    segs = list(zip(ring_pts[:-1], ring_pts[1:]))

    def dist_to_ring(p):
        return min(_point_to_segment(p, a, b) for a, b in segs)

    m = len(curve)
    for i in range(m):
        v = curve[i]
        if dist_to_ring(v) > tol:
            return False
        vn = curve[(i + 1) % m]
        mid = ((v[0] + vn[0]) / 2.0, (v[1] + vn[1]) / 2.0)
        if dist_to_ring(mid) > tol:
            return False
    return True


def _collect_curves(g: G.Geom, distance: float, **params) -> list:
    curves = []
    for part in g.geoms():
        if part.is_empty:
            continue
        if part.type_id == G.POINT:
            if distance > 0:
                curves.append(
                    _line_curve(
                        [(float(part.data[0, 0]), float(part.data[0, 1]))],
                        distance, **params,
                    )
                )
        elif part.type_id == G.LINESTRING:
            if distance <= 0:
                continue
            pts = _dedupe_ring(part.data)
            if len(pts) >= 4 and pts[0] == pts[-1]:
                # closed line: both ring sides, no caps (JTS #523)
                ccw = ring_signed_area(np.asarray(pts)) > 0
                hole_ok = not _ring_fully_eroded(pts, True, distance)
                if (not ccw) or hole_ok:
                    c = _ring_curve(pts, _LEFT, distance, **params)
                    if not _ring_curve_inverted(pts, distance, c):
                        curves.append(c)
                if ccw or hole_ok:
                    c = _ring_curve(pts, _RIGHT, distance, **params)
                    if not _ring_curve_inverted(pts, distance, c):
                        curves.append((c or [])[::-1])
            else:
                curves.append(_line_curve(pts, distance, **params))
        elif part.type_id == G.POLYGON and part.data:
            off_dist = distance
            off_side = _LEFT
            if distance < 0.0:
                off_dist = -distance
                off_side = _RIGHT
            shell = _dedupe_ring(part.data[0])
            if distance < 0.0 and _ring_fully_eroded(shell, False, distance):
                continue
            if distance <= 0.0 and len(shell) < 4:
                continue
            _add_poly_ring_side(
                curves, shell, off_dist, off_side, distance, False, **params
            )
            for hole_arr in part.data[1:]:
                hole = _dedupe_ring(hole_arr)
                if distance > 0.0 and _ring_fully_eroded(
                    hole, True, distance
                ):
                    continue
                _add_poly_ring_side(
                    curves, hole, off_dist,
                    _RIGHT if off_side == _LEFT else _LEFT,
                    distance, True, **params,
                )
    return [c for c in curves if c and len(c) >= 4]


def _add_poly_ring_side(
    curves, ring, off_dist, side, signed_dist, is_hole, **params
):
    """addPolygonRingSide (BufferCurveSetBuilder.cpp:317-349): flip
    the side for CCW rings; normalise every curve so the buffer
    interior is on its RIGHT (the reference tracks this with
    left/right location labels — shells carry EXTERIOR/INTERIOR,
    holes INTERIOR/EXTERIOR, both swapped for CCW rings)."""
    ccw = len(ring) >= 4 and ring_signed_area(np.asarray(ring)) > 0
    if ccw:
        side = _RIGHT if side == _LEFT else _LEFT
    curve = _ring_curve(ring, side, off_dist, **params)
    if _ring_curve_inverted(ring, off_dist, curve):
        return
    # interior ends up on the LEFT for CCW shells and CW holes;
    # reverse those so winding accumulates consistently
    interior_left = ccw if not is_hole else not ccw
    curves.append(curve[::-1] if interior_left else curve)


# ----------------------------------------------------------------------
# assembly: winding-number faces over the noded raw curves
# ----------------------------------------------------------------------


def _node_curves(curves: list):
    """Node all curve segments together at float precision (the
    reference's first-attempt noding)."""
    from geos_spark.kernels.overlay import _SrcSeg, _node_segments

    segs = []
    sizes = {}
    ringflag = {}
    for sid, c in enumerate(curves):
        k = 0
        for i in range(len(c) - 1):
            if c[i] != c[i + 1]:
                segs.append(_SrcSeg(c[i], c[i + 1], 0, True, False, sid, k))
                k += 1
        sizes[sid] = k
        ringflag[sid] = True
    _node_segments(segs, sizes, ringflag)
    pieces = []
    for s in segs:
        pts = [s.p]
        if s.splits:
            seen = {s.p, s.q}
            for _t, pt in sorted(s.splits, key=lambda e: e[0]):
                if pt not in seen:
                    pts.append(pt)
                    seen.add(pt)
        pts.append(s.q)
        for a, b in zip(pts[:-1], pts[1:]):
            if a != b:
                pieces.append((a, b))
    return pieces


def _node_curves_snapped(curves: list):
    """Fallback noding: snap-rounding at a ~12-significant-digit grid
    (the reference's reduced-precision retry,
    BufferOp::bufferReducedPrecision, BufferOp.cpp:112-177).  Vertex
    movement ~1e-12 relative — far below the buffer correctness
    tolerances (rel. area 1e-3, Hausdorff distance/100)."""
    from geos_spark.kernels.snapround import snap_round_strings

    max_mag = 1.0
    for c in curves:
        for x, y in c:
            m = max(abs(x), abs(y))
            if m > max_mag:
                max_mag = m
    digits = 12 - int(math.ceil(math.log10(max_mag)))
    scale = 10.0 ** digits
    chains, _nodes = snap_round_strings(curves, scale)
    pieces = []
    for chain in chains:
        for a, b in zip(chain[:-1], chain[1:]):
            if a != b:
                pieces.append((a, b))
    return pieces


def buffer_geom(
    g: G.Geom,
    distance: float,
    quad_segs: int = 8,
    cap: str = CAP_ROUND,
    join: str = JOIN_ROUND,
    mitre_limit: float = 5.0,
) -> G.Geom:
    """GEOSBufferWithStyle semantics; returns a polygonal geometry."""
    from geos_spark.kernels.overlay import (
        _assemble_polygons,
        _trace_rings,
    )

    params = dict(
        quad_segs=quad_segs, cap=cap, join=join, mitre_limit=mitre_limit
    )
    if g.is_empty or (distance == 0.0 and g.dimension() < 2):
        return G.Geom(G.POLYGON, [])
    if distance == 0.0:
        # zero-width buffer of areal input: the input noded/merged,
        # with dimensional collapses dropped — buffer output is always
        # areal, so a degenerate (zero-area) polygon yields POLYGON
        # EMPTY (BufferOp on collapsed rings)
        from geos_spark.kernels import overlay as OV
        from geos_spark.kernels.union import unary_union

        u = unary_union(g)
        u = OV.overlay_robust(u, G.Geom(G.POLYGON, []), OV.UNION)
        polys = [
            p for p in u.geoms() if p.type_id == G.POLYGON and p.data
        ]
        if not polys:
            return G.Geom(G.POLYGON, [])
        if len(polys) == 1:
            return polys[0]
        return G.Geom.collection(G.MULTIPOLYGON, polys)
    curves = _collect_curves(g, distance, **params)
    if not curves:
        return G.Geom(G.POLYGON, [])

    polys, ok = _extract_faces(_node_curves(curves))
    if not ok:
        # reference ladder: retry at reduced precision
        polys, _ = _extract_faces(_node_curves_snapped(curves))
    if not polys:
        return G.Geom(G.POLYGON, [])
    if len(polys) == 1:
        return polys[0]
    return G.Geom.collection(G.MULTIPOLYGON, polys)


def _extract_faces(pieces: list):
    """Classify edges by signed winding and trace result polygons.

    Returns (polys, consistent): ``consistent`` is False when the
    directed boundary set is not degree-balanced — the arrangement
    had near-coincident un-merged nodes (robustness failure), the
    caller retries with snap-rounding."""
    from geos_spark.kernels.overlay import (
        _assemble_polygons,
        _trace_rings,
    )

    edges: dict = {}
    eid_of: dict = {}
    piece_eid = np.empty(len(pieces), dtype=np.int64)
    for pi, (a, b) in enumerate(pieces):
        lo, hi = (a, b) if a < b else (b, a)
        k = edges.get((lo, hi), 0)
        edges[(lo, hi)] = k + (1 if a == lo else -1)
        eid = eid_of.setdefault((lo, hi), len(eid_of))
        piece_eid[pi] = eid

    arr = np.array(
        [[a[0], a[1], b[0], b[1]] for a, b in pieces], dtype=np.float64
    )
    x1, y1, x2, y2 = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]

    # interval bins: a winding query only needs segments whose y- (or
    # x-) range straddles the query ordinate. Offset-curve segments
    # are short, so binning them by interval turns the per-edge O(P)
    # scan (quadratic over the arrangement — 40+s on the external-
    # buffer corpus polygons) into O(P/K + span).
    def _build_bins(lo_v, hi_v, k_bins):
        vmin = float(lo_v.min())
        vmax = float(hi_v.max())
        h = (vmax - vmin) / k_bins or 1.0
        b0 = np.clip(((lo_v - vmin) / h).astype(np.int64), 0, k_bins - 1)
        b1 = np.clip(((hi_v - vmin) / h).astype(np.int64), 0, k_bins - 1)
        bins = [[] for _ in range(k_bins)]
        for i in range(len(lo_v)):
            for b in range(b0[i], b1[i] + 1):
                bins[b].append(i)
        return (
            [np.asarray(b, dtype=np.int64) for b in bins],
            vmin,
            h,
            k_bins,
        )

    K = max(16, min(1024, len(pieces) // 16 or 16))
    ybins, ymin0, yh, yk = _build_bins(
        np.minimum(y1, y2), np.maximum(y1, y2), K
    )
    xbins, xmin0, xh, xk = _build_bins(
        np.minimum(x1, x2), np.maximum(x1, x2), K
    )

    def winding_x(px, py, eid):
        bi = min(yk - 1, max(0, int((py - ymin0) / yh)))
        cand = ybins[bi]
        if len(cand) == 0:
            return 0
        straddle = (y1[cand] > py) != (y2[cand] > py)
        idx = cand[straddle]
        if len(idx) == 0:
            return 0
        xi = x1[idx] + (py - y1[idx]) * (x2[idx] - x1[idx]) / (
            y2[idx] - y1[idx]
        )
        sgn = np.where(y2[idx] > y1[idx], 1, -1)
        keep = (xi > px) & (piece_eid[idx] != eid)
        return int(np.sum(sgn[keep]))

    def winding_y(px, py, eid):
        bi = min(xk - 1, max(0, int((px - xmin0) / xh)))
        cand = xbins[bi]
        if len(cand) == 0:
            return 0
        straddle = (x1[cand] > px) != (x2[cand] > px)
        idx = cand[straddle]
        if len(idx) == 0:
            return 0
        yi = y1[idx] + (px - x1[idx]) * (y2[idx] - y1[idx]) / (
            x2[idx] - x1[idx]
        )
        sgn = np.where(x2[idx] < x1[idx], 1, -1)
        keep = (yi > py) & (piece_eid[idx] != eid)
        return int(np.sum(sgn[keep]))

    directed = []
    outd: dict = defaultdict(int)
    ind: dict = defaultdict(int)
    for (lo, hi), k in edges.items():
        eid = eid_of[(lo, hi)]
        mx = (lo[0] + hi[0]) / 2.0
        my = (lo[1] + hi[1]) / 2.0
        dx = hi[0] - lo[0]
        dy = hi[1] - lo[1]
        # use the ray most transverse to the edge, else near-parallel
        # rays pick up crossings clustered at the edge's own endpoints
        if abs(dy) >= abs(dx):
            w_ent = winding_x(mx, my, eid)
            entered_left = -dy > 0  # +x ray: cross(d, (1,0)) = -dy
        else:
            w_ent = winding_y(mx, my, eid)
            entered_left = dx > 0  # +y ray: cross(d, (0,1)) = dx
        if entered_left:
            w_left = w_ent
            w_right = w_left - k
        else:
            w_right = w_ent
            w_left = w_right + k
        # curves are normalised interior-on-right (CW traversal), so
        # buffer regions have NEGATIVE winding; inverted phantom loops
        # (deep negative buffers) wind positive and are excluded --
        # the reference's signed depth rule (SubgraphDepthLocater)
        in_l = w_left < 0
        in_r = w_right < 0
        if in_l != in_r:
            d = (lo, hi) if in_l else (hi, lo)
            directed.append(d)
            outd[d[0]] += 1
            ind[d[1]] += 1

    balanced = all(outd[n] == ind[n] for n in set(outd) | set(ind))
    # lenient tracing: the buffer ladder handles malformed
    # arrangements itself (retry at reduced precision via `balanced`)
    polys = (
        _assemble_polygons(_trace_rings(directed, strict=False))
        if directed
        else []
    )
    return polys, balanced and (bool(polys) or not directed)


# ----------------------------------------------------------------------
# single-sided buffer (BufferBuilder::bufferLineSingleSided,
# src/operation/buffer/BufferBuilder.cpp:131-352)
# ----------------------------------------------------------------------


def single_sided_curve(pts, distance, left, **params):
    """OffsetCurveBuilder::getSingleSidedLineCurve — one side's raw
    offset chain (open; no caps)."""
    gen = _Generator(abs(distance), **params)
    tol = abs(distance) / 100.0
    if left:
        simp = _simplify_input(pts, tol)
        n = len(simp) - 1
        gen.init_side(simp[0], simp[1], _LEFT)
        gen.add_first_segment()
        for i in range(2, n + 1):
            gen.add_next_segment(simp[i], True)
        gen.add_last_segment()
    else:
        simp = _simplify_input(pts, -tol)
        n = len(simp) - 1
        gen.init_side(simp[n], simp[n - 1], _LEFT)
        gen.add_first_segment()
        for i in range(n - 2, -1, -1):
            gen.add_next_segment(simp[i], True)
        gen.add_last_segment()
    return gen.coordinates()


def buffer_line_single_sided(
    g: G.Geom, distance: float, left: bool, quad_segs: int = 8,
    join: str = JOIN_ROUND, mitre_limit: float = 5.0,
) -> G.Geom:
    """Single-sided buffer LINE of a LineString: intersect the raw
    one-sided offset curve with the flat-cap buffer boundary, merge,
    and trim ends near the input endpoints."""
    from geos_spark.kernels import overlay as OV
    from geos_spark.kernels.linear import line_merge
    from geos_spark.kernels.scalars import geom_boundary, geom_length

    if g.type_id != G.LINESTRING:
        raise ValueError("single-sided buffer requires a LineString")
    if distance == 0.0:
        return g
    params = dict(
        quad_segs=quad_segs, join=join, mitre_limit=mitre_limit
    )
    buf = buffer_geom(g, distance, cap=CAP_FLAT, **params)
    bdy = geom_boundary(buf)
    pts = _dedupe_ring(g.data)
    curve = single_sided_curve(pts, distance, left, cap=CAP_FLAT, **params)
    if len(curve) < 2:
        return G.Geom.empty(G.LINESTRING)
    curve_geom = G.Geom.linestring(np.asarray(curve, dtype=np.float64))
    # the reference intersects with SnapOverlayOp (the raw curve and
    # the buffer boundary are collinear only up to rounding); a
    # 12-significant-digit snap-rounded overlay gives the same effect
    max_mag = max(
        1.0,
        max(abs(v) for p in curve for v in p),
    )
    scale = 10.0 ** (12 - int(math.ceil(math.log10(max_mag))))
    inter = OV.overlay(curve_geom, bdy, OV.INTERSECTION, scale)
    merged = line_merge(inter)
    lines = [
        p.data for p in merged.geoms()
        if p.type_id == G.LINESTRING and len(p.data) > 1
    ]
    start = (float(g.data[0, 0]), float(g.data[0, 1]))
    end = (float(g.data[-1, 0]), float(g.data[-1, 1]))
    in_len = geom_length(g)
    pt_allow = max(abs(distance) - in_len * 0.1, abs(distance) * 0.98)
    seg_allow = 1.02 * abs(distance)
    out = []
    for coords in lines:
        c = [(float(x), float(y)) for x, y in coords]
        front, back = 0, len(c) - 1
        sz = back - front + 1

        def seg_len(i, j):
            return _dist(c[i], c[j])

        for anchor in (start, end):
            while sz > 1 and _dist(c[front], anchor) < pt_allow:
                if seg_len(front, front + 1) > seg_allow:
                    break
                front += 1
                sz -= 1
        for anchor in (start, end):
            while sz > 1 and _dist(c[back], anchor) < pt_allow:
                if seg_len(back, back - 1) > seg_allow:
                    break
                back -= 1
                sz -= 1
        if sz > 1:
            out.append(
                G.Geom.linestring(
                    np.asarray(c[front:back + 1], dtype=np.float64)
                )
            )
    if not out:
        return G.Geom.empty(G.LINESTRING)
    if len(out) == 1:
        return out[0]
    return G.Geom.collection(G.MULTILINESTRING, out)
