"""Polygonal-coverage validation.

Reimplements the reference's coverage validator semantics:

- ``CoverageValidator`` (src/coverage/CoverageValidator.cpp:80-126):
  per-polygon validation against envelope-near neighbours, result =
  per-polygon invalid-boundary linework (None when valid).
- ``CoveragePolygonValidator``
  (src/coverage/CoveragePolygonValidator.cpp:92-114): mark matched
  segments first (normalized-segment map, opposite orientations
  match, same orientation = invalid duplicate), then check unmatched
  segments for invalid interactions and interior-side placement.
- ``InvalidSegmentDetector`` (src/coverage/InvalidSegmentDetector.cpp
  :84-196): collinear-non-matching, proper/interior crossings,
  corner-interior test via PolygonNodeTopology::isInteriorSegment,
  and the nearly-parallel gap test when a gap width is given.
- ``CoverageRing`` (src/coverage/CoverageRing.cpp:212-316): invalid
  segment chains -> LineStrings with wrap-around.

Pure python/numpy; the distributed operator feeds each polygon plus
its envelope-near neighbours through this kernel.
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.orientation import orientation_index
from geos_spark.kernels.pip import INTERIOR
from geos_spark.kernels.relate import _locate_in_polys


def _orient(ax, ay, bx, by, px, py) -> int:
    return int(
        orientation_index(
            np.array([ax]), np.array([ay]), np.array([bx]),
            np.array([by]), np.array([px]), np.array([py]),
        )[0]
    )


def _ring_signed_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(
        np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
    )


def _dedupe_closed(pts: np.ndarray) -> np.ndarray:
    """RepeatedPointRemover: drop consecutive duplicates, keep closure."""
    keep = [0]
    for i in range(1, len(pts)):
        if pts[i][0] != pts[keep[-1]][0] or pts[i][1] != pts[keep[-1]][1]:
            keep.append(i)
    out = pts[keep]
    if out[0][0] != out[-1][0] or out[0][1] != out[-1][1]:
        out = np.vstack([out, out[:1]])
    return out


class _CovRing:
    """CoverageRing: a ring's points + per-segment matched/invalid."""

    def __init__(self, pts: np.ndarray, is_shell: bool):
        self.pts = _dedupe_closed(np.asarray(pts, dtype=np.float64))
        self.nseg = len(self.pts) - 1
        is_ccw = _ring_signed_area(self.pts) > 0
        self.interior_on_right = (not is_ccw) if is_shell else is_ccw
        self.matched = np.zeros(self.nseg, dtype=bool)
        self.invalid = np.zeros(self.nseg, dtype=bool)

    def is_known(self, i: int) -> bool:
        return bool(self.matched[i] or self.invalid[i])

    def all_known(self) -> bool:
        return bool((self.matched | self.invalid).all())

    def mark_invalid(self, i: int) -> None:
        self.invalid[i] = True

    def mark_matched(self, i: int) -> None:
        self.matched[i] = True

    def coord(self, i: int):
        return self.pts[i]

    def _prev(self, i: int) -> int:
        return self.nseg - 1 if i == 0 else i - 1

    def _next_mark(self, i: int) -> int:
        return 0 if i >= self.nseg - 1 else i + 1

    def find_vertex_prev(self, index: int, pt) -> np.ndarray:
        i = index
        c = self.pts[i]
        while c[0] == pt[0] and c[1] == pt[1]:
            i = self._prev(i)
            c = self.pts[i]
        return c

    def find_vertex_next(self, index: int, pt) -> np.ndarray:
        i = index + 1
        c = self.pts[i]
        while c[0] == pt[0] and c[1] == pt[1]:
            i = 0 if i >= self.nseg - 1 else i + 1
            c = self.pts[i]
        return c

    def invalid_lines(self) -> list[np.ndarray]:
        """CoverageRing::createInvalidLines chains, with wraparound."""
        if not self.invalid.any():
            return []
        if self.invalid.all():
            return [self.pts.copy()]
        lines = []

        def find_start(i):
            while not self.invalid[i]:
                i = self._next_mark(i)
            return i

        def find_end(i):
            i = self._next_mark(i)
            while self.invalid[i]:
                i = self._next_mark(i)
            return i

        start = find_start(0)
        first_end = find_end(start)
        end = first_end
        while True:
            start = find_start(end)
            end = find_end(start)
            if end < start:  # wraparound section
                sz = end + (len(self.pts) - start)
                idx = start
                sect = []
                for _ in range(sz):
                    sect.append(self.pts[idx])
                    idx = self._next_mark(idx)
                lines.append(np.asarray(sect))
            else:
                lines.append(self.pts[start : end + 1].copy())
            if end == first_end:
                break
        return lines


def _polygon_parts(g: G.Geom) -> list:
    return [p for p in g.geoms() if p.type_id == G.POLYGON and p.data]


def _rings_of(geoms) -> list[_CovRing]:
    rings = []
    for g in geoms:
        for p in _polygon_parts(g):
            for ri, ring in enumerate(p.data):
                if len(ring) == 0:
                    continue
                rings.append(_CovRing(ring, ri == 0))
    return rings


def _env_of(g: G.Geom):
    xs, ys = [], []
    for p in _polygon_parts(g):
        for ring in p.data:
            r = np.asarray(ring)
            xs.append((r[:, 0].min(), r[:, 0].max()))
            ys.append((r[:, 1].min(), r[:, 1].max()))
    x0 = min(a for a, _ in xs)
    x1 = max(b for _, b in xs)
    y0 = min(a for a, _ in ys)
    y1 = max(b for _, b in ys)
    return x0, y0, x1, y1


class _CovSegment:
    """CoverageRingSegment: normalized, tracks forward/opposite slot."""

    __slots__ = ("key", "ring_fwd", "idx_fwd", "ring_opp", "idx_opp")

    def __init__(self, ring: _CovRing, index: int):
        p0 = ring.coord(index)
        p1 = ring.coord(index + 1)
        if not ring.interior_on_right:
            p0, p1 = p1, p0
        self.ring_fwd = self.ring_opp = None
        self.idx_fwd = self.idx_opp = 0
        # Coordinate::compareTo: x then y
        if (p1[0], p1[1]) < (p0[0], p0[1]):
            p0, p1 = p1, p0
            self.ring_opp, self.idx_opp = ring, index
        else:
            self.ring_fwd, self.idx_fwd = ring, index
        self.key = (p0[0], p0[1], p1[0], p1[1])

    def match(self, stored: "_CovSegment") -> None:
        if self._check_invalid(stored):
            return
        if self.ring_fwd is None:
            self.ring_fwd, self.idx_fwd = stored.ring_fwd, stored.idx_fwd
        else:
            self.ring_opp, self.idx_opp = stored.ring_opp, stored.idx_opp
        self.ring_fwd.mark_matched(self.idx_fwd)
        self.ring_opp.mark_matched(self.idx_opp)

    def _check_invalid(self, stored: "_CovSegment") -> bool:
        if self.ring_fwd is not None and stored.ring_fwd is not None:
            self.ring_fwd.mark_invalid(self.idx_fwd)
            stored.ring_fwd.mark_invalid(stored.idx_fwd)
            return True
        if self.ring_opp is not None and stored.ring_opp is not None:
            self.ring_opp.mark_invalid(self.idx_opp)
            stored.ring_opp.mark_invalid(stored.idx_opp)
            return True
        return False


def _mark_matched(rings, env, segmap) -> None:
    x0, y0, x1, y1 = env
    for ring in rings:
        p = ring.pts
        sxmin = np.minimum(p[:-1, 0], p[1:, 0])
        sxmax = np.maximum(p[:-1, 0], p[1:, 0])
        symin = np.minimum(p[:-1, 1], p[1:, 1])
        symax = np.maximum(p[:-1, 1], p[1:, 1])
        inenv = (sxmin <= x1) & (x0 <= sxmax) & (symin <= y1) & (y0 <= symax)
        for i in np.flatnonzero(inenv):
            seg = _CovSegment(ring, int(i))
            stored = segmap.get(seg.key)
            if stored is not None:
                seg.match(stored)
            else:
                segmap[seg.key] = seg


def _is_interior_segment(node, a0, a1, b) -> bool:
    """PolygonNodeTopology::isInteriorSegment (corner a0-node-a1 with
    interior on the right side; is node->b inside the corner)."""

    def quadrant(o, p):
        dx, dy = p[0] - o[0], p[1] - o[1]
        if dx >= 0:
            return 0 if dy >= 0 else 3
        return 1 if dy >= 0 else 2

    def angle_greater(o, p, q):
        qp, qq = quadrant(o, p), quadrant(o, q)
        if qp > qq:
            return True
        if qp < qq:
            return False
        return (
            _orient(o[0], o[1], q[0], q[1], p[0], p[1]) == 1
        )  # CCW

    a_lo, a_hi = a0, a1
    interior_between = True
    if angle_greater(node, a_lo, a_hi):
        a_lo, a_hi = a1, a0
        interior_between = False
    g0 = angle_greater(node, b, a_lo)
    between = g0 and not angle_greater(node, b, a_hi)
    return (between and interior_between) or (
        not between and not interior_between
    )


def _nearly_parallel(p00, p01, p10, p11, tol) -> bool:
    """LineSegment::project-based near-parallel gap test
    (InvalidSegmentDetector.cpp:166-196)."""

    def proj_factor(a0, a1, p):
        if p[0] == a0[0] and p[1] == a0[1]:
            return 0.0
        if p[0] == a1[0] and p[1] == a1[1]:
            return 1.0
        if a0[0] == a1[0] and a0[1] == a1[1]:
            return 0.0
        dx, dy = a1[0] - a0[0], a1[1] - a0[1]
        len2 = dx * dx + dy * dy
        return ((p[0] - a0[0]) * dx + (p[1] - a0[1]) * dy) / len2

    def project_seg(a0, a1, b0, b1):
        pf0 = proj_factor(a0, a1, b0)
        pf1 = proj_factor(a0, a1, b1)
        if pf0 >= 1.0 and pf1 >= 1.0:
            return None
        if pf0 <= 0.0 and pf1 <= 0.0:
            return None

        def interp(pf):
            if pf < 0.0:
                return np.array(a0, dtype=float)
            if pf > 1.0:
                return np.array(a1, dtype=float)
            return np.array(
                [a0[0] + pf * (a1[0] - a0[0]), a0[1] + pf * (a1[1] - a0[1])]
            )

        return interp(pf0), interp(pf1)

    pr0 = project_seg(p00, p01, p10, p11)
    if pr0 is None:
        return False
    pr1 = project_seg(p10, p11, p00, p01)
    if pr1 is None:
        return False

    def dist(a, b):
        return float(np.hypot(a[0] - b[0], a[1] - b[1]))

    def length(s):
        return dist(s[0], s[1])

    if length(pr0) <= tol or length(pr1) <= tol:
        return False
    q0, q1 = pr1
    if dist(pr0[0], q1) < dist(pr0[0], q0):
        q0, q1 = q1, q0
    return dist(pr0[0], q0) <= tol and dist(pr0[1], q1) <= tol


def _detect_invalid_segment(
    target: _CovRing, it: int, adj: _CovRing, ia: int, tol: float
) -> bool:
    """InvalidSegmentDetector::processIntersections for one pair."""
    t0, t1 = target.coord(it), target.coord(it + 1)
    a0, a1 = adj.coord(ia), adj.coord(ia + 1)
    if (t0 == t1).all() or (a0 == a1).all():
        return False
    same = ((t0 == a0).all() and (t1 == a1).all()) or (
        (t0 == a1).all() and (t1 == a0).all()
    )
    if same:
        return False

    o1 = _orient(t0[0], t0[1], t1[0], t1[1], a0[0], a0[1])
    o2 = _orient(t0[0], t0[1], t1[0], t1[1], a1[0], a1[1])
    o3 = _orient(a0[0], a0[1], a1[0], a1[1], t0[0], t0[1])
    o4 = _orient(a0[0], a0[1], a1[0], a1[1], t1[0], t1[1])

    def env_overlap():
        return (
            min(t0[0], t1[0]) <= max(a0[0], a1[0])
            and min(a0[0], a1[0]) <= max(t0[0], t1[0])
            and min(t0[1], t1[1]) <= max(a0[1], a1[1])
            and min(a0[1], a1[1]) <= max(t0[1], t1[1])
        )

    if _collinear_or_interior(
        t0, t1, a0, a1, o1, o2, o3, o4, env_overlap, adj, ia
    ):
        return True
    if tol > 0 and _nearly_parallel(t0, t1, a0, a1, tol):
        return True
    return False


def _collinear_or_interior(
    t0, t1, a0, a1, o1, o2, o3, o4, env_overlap, adj, ia
) -> bool:
    has_int = o1 * o2 <= 0 and o3 * o4 <= 0 and env_overlap()
    if has_int:
        if o1 == 0 and o2 == 0:
            # collinear with env overlap: 2-point overlap = invalid,
            # single-point touch falls through to the corner test
            ov_x = min(max(t0[0], t1[0]), max(a0[0], a1[0])) - max(
                min(t0[0], t1[0]), min(a0[0], a1[0])
            )
            ov_y = min(max(t0[1], t1[1]), max(a0[1], a1[1])) - max(
                min(t0[1], t1[1]), min(a0[1], a1[1])
            )
            if ov_x > 0 or ov_y > 0:
                return True
        # proper crossing (interior to both)
        if o1 != 0 and o2 != 0 and o3 != 0 and o4 != 0:
            return True
        # touch at a point interior to at least one segment: the
        # intersection is an endpoint of each segment only if one of
        # the endpoint pairs coincides
        shared = None
        for tp in (t0, t1):
            for ap in (a0, a1):
                if tp[0] == ap[0] and tp[1] == ap[1]:
                    shared = tp
                    break
            if shared is not None:
                break
        if shared is None:
            return True  # T-touch: endpoint interior to other segment
        # endpoint-endpoint touch: corner-interior test
        tgt_end = t1 if (shared[0] == t0[0] and shared[1] == t0[1]) else t0
        adj_prev = adj.find_vertex_prev(ia, shared)
        adj_next = adj.find_vertex_next(ia, shared)
        if (tgt_end[0] == adj_prev[0] and tgt_end[1] == adj_prev[1]) or (
            tgt_end[0] == adj_next[0] and tgt_end[1] == adj_next[1]
        ):
            return False
        if not adj.interior_on_right:
            adj_prev, adj_next = adj_next, adj_prev
        return _is_interior_segment(shared, adj_prev, adj_next, tgt_end)
    return False


def _mark_invalid_interacting(target_rings, adj_rings, tol) -> None:
    for tring in target_rings:
        tp = tring.pts
        te = np.stack(
            [
                np.minimum(tp[:-1, 0], tp[1:, 0]) - tol,
                np.minimum(tp[:-1, 1], tp[1:, 1]) - tol,
                np.maximum(tp[:-1, 0], tp[1:, 0]) + tol,
                np.maximum(tp[:-1, 1], tp[1:, 1]) + tol,
            ],
            axis=1,
        )
        for aring in adj_rings:
            ap = aring.pts
            ae = np.stack(
                [
                    np.minimum(ap[:-1, 0], ap[1:, 0]),
                    np.minimum(ap[:-1, 1], ap[1:, 1]),
                    np.maximum(ap[:-1, 0], ap[1:, 0]),
                    np.maximum(ap[:-1, 1], ap[1:, 1]),
                ],
                axis=1,
            )
            # blocked env-overlap pair discovery
            ov = (
                (te[:, None, 0] <= ae[None, :, 2])
                & (ae[None, :, 0] <= te[:, None, 2])
                & (te[:, None, 1] <= ae[None, :, 3])
                & (ae[None, :, 1] <= te[:, None, 3])
            )
            it_all, ia_all = np.nonzero(ov)
            if len(it_all) == 0:
                continue
            _detect_invalid_batch(tring, it_all, ia_all, aring, tol)


def _detect_invalid_batch(tring, IT, IA, aring, tol) -> None:
    """Vectorized InvalidSegmentDetector over env-overlapping pairs:
    the bulk classification (collinear / proper / T-touch) runs as
    four orientation_index calls; only endpoint-endpoint corner
    touches and the gap test fall back to the scalar path.  Marking
    is idempotent, so batch order matches the reference's sequential
    loop exactly (skip-if-known only filters matched segments, whose
    state is fixed during this phase)."""
    tp, ap = tring.pts, aring.pts
    known = tring.matched[IT] | tring.invalid[IT]
    IT, IA = IT[~known], IA[~known]
    if len(IT) == 0:
        return
    t0, t1 = tp[IT], tp[IT + 1]
    a0, a1 = ap[IA], ap[IA + 1]
    zero = ((t0 == t1).all(axis=1)) | ((a0 == a1).all(axis=1))
    same = ((t0 == a0).all(axis=1) & (t1 == a1).all(axis=1)) | (
        (t0 == a1).all(axis=1) & (t1 == a0).all(axis=1)
    )
    live = ~(zero | same)
    if not live.any():
        return
    o1 = orientation_index(
        t0[:, 0], t0[:, 1], t1[:, 0], t1[:, 1], a0[:, 0], a0[:, 1]
    ).astype(np.int8)
    o2 = orientation_index(
        t0[:, 0], t0[:, 1], t1[:, 0], t1[:, 1], a1[:, 0], a1[:, 1]
    ).astype(np.int8)
    o3 = orientation_index(
        a0[:, 0], a0[:, 1], a1[:, 0], a1[:, 1], t0[:, 0], t0[:, 1]
    ).astype(np.int8)
    o4 = orientation_index(
        a0[:, 0], a0[:, 1], a1[:, 0], a1[:, 1], t1[:, 0], t1[:, 1]
    ).astype(np.int8)
    env_ov = (
        (np.minimum(t0[:, 0], t1[:, 0]) <= np.maximum(a0[:, 0], a1[:, 0]))
        & (np.minimum(a0[:, 0], a1[:, 0]) <= np.maximum(t0[:, 0], t1[:, 0]))
        & (np.minimum(t0[:, 1], t1[:, 1]) <= np.maximum(a0[:, 1], a1[:, 1]))
        & (np.minimum(a0[:, 1], a1[:, 1]) <= np.maximum(t0[:, 1], t1[:, 1]))
    )
    has_int = live & (o1 * o2 <= 0) & (o3 * o4 <= 0) & env_ov

    invalid = np.zeros(len(IT), dtype=bool)
    # collinear 2-point overlap
    col = has_int & (o1 == 0) & (o2 == 0)
    if col.any():
        ov_x = np.minimum(
            np.maximum(t0[:, 0], t1[:, 0]), np.maximum(a0[:, 0], a1[:, 0])
        ) - np.maximum(
            np.minimum(t0[:, 0], t1[:, 0]), np.minimum(a0[:, 0], a1[:, 0])
        )
        ov_y = np.minimum(
            np.maximum(t0[:, 1], t1[:, 1]), np.maximum(a0[:, 1], a1[:, 1])
        ) - np.maximum(
            np.minimum(t0[:, 1], t1[:, 1]), np.minimum(a0[:, 1], a1[:, 1])
        )
        invalid |= col & ((ov_x > 0) | (ov_y > 0))
    # proper crossing
    invalid |= has_int & (o1 != 0) & (o2 != 0) & (o3 != 0) & (o4 != 0)
    # endpoint sharing classification for the rest
    shared00 = (t0 == a0).all(axis=1)
    shared01 = (t0 == a1).all(axis=1)
    shared10 = (t1 == a0).all(axis=1)
    shared11 = (t1 == a1).all(axis=1)
    any_shared = shared00 | shared01 | shared10 | shared11
    # T-touch: intersect but no endpoint pair coincides
    pending = has_int & ~invalid
    invalid |= pending & ~any_shared
    # endpoint-endpoint touches: scalar corner test
    for k in np.flatnonzero(pending & any_shared):
        if _detect_invalid_segment(
            tring, int(IT[k]), aring, int(IA[k]), 0.0
        ):
            invalid[k] = True
    # gap test for non-intersecting pairs
    if tol > 0:
        for k in np.flatnonzero(live & ~invalid):
            if _nearly_parallel(t0[k], t1[k], a0[k], a1[k], tol):
                invalid[k] = True
    if invalid.any():
        tring.invalid[IT[invalid]] = True


def _mark_invalid_interior(target_rings, adj_geoms) -> None:
    adj_parts = [
        (p, _env_of_part(p)) for g in adj_geoms for p in _polygon_parts(g)
    ]
    for ring in target_rings:
        verts = ring.pts[:-1]
        for p, env in adj_parts:
            # section env prefilter per reference (stride covers all)
            rx0, ry0 = verts.min(axis=0)
            rx1, ry1 = verts.max(axis=0)
            if not (
                rx0 <= env[2]
                and env[0] <= rx1
                and ry0 <= env[3]
                and env[1] <= ry1
            ):
                continue
            # batch the point-in-polygon locate over candidate
            # vertices; the sequential mark rule (skip known, mark i
            # and unmatched prev) replays in index order exactly
            cand = np.flatnonzero(
                (verts[:, 0] >= env[0])
                & (verts[:, 0] <= env[2])
                & (verts[:, 1] >= env[1])
                & (verts[:, 1] <= env[3])
            )
            if len(cand) == 0:
                continue
            locs = _locate_in_polys(verts[cand], [p])
            for i in cand[locs == INTERIOR]:
                i = int(i)
                if ring.is_known(i):
                    continue
                ring.mark_invalid(i)
                iprev = ring._prev(i)
                if not ring.is_known(iprev):
                    ring.mark_invalid(iprev)


def _env_of_part(p) -> tuple:
    r = np.asarray(p.data[0])
    return (
        float(r[:, 0].min()),
        float(r[:, 1].min()),
        float(r[:, 0].max()),
        float(r[:, 1].max()),
    )


def validate_coverage_polygon(
    target: G.Geom, adj_geoms: list, gap_width: float = 0.0
):
    """CoveragePolygonValidator::validate — returns the invalid
    boundary linework of ``target`` (LINESTRING / MULTILINESTRING
    Geom) or None when the polygon is coverage-valid against its
    neighbours."""
    target_rings = _rings_of([target])
    if not target_rings:
        return None  # empty polygon: trivially valid
    adj_rings = _rings_of(adj_geoms)

    x0, y0, x1, y1 = _env_of(target)
    env = (x0 - gap_width, y0 - gap_width, x1 + gap_width, y1 + gap_width)

    segmap: dict = {}
    _mark_matched(target_rings, env, segmap)
    _mark_matched(adj_rings, env, segmap)

    if not all(r.all_known() for r in target_rings):
        _mark_invalid_interacting(target_rings, adj_rings, gap_width)
        _mark_invalid_interior(target_rings, adj_geoms)

    lines = []
    for ring in target_rings:
        lines.extend(ring.invalid_lines())
    if not lines:
        return None
    if len(lines) == 1:
        return G.Geom.linestring(lines[0])
    return G.Geom.collection(
        G.MULTILINESTRING, [G.Geom.linestring(li) for li in lines]
    )


def validate_coverage(geoms: list, gap_width: float = 0.0) -> list:
    """CoverageValidator::validate over a full coverage list (the
    local/batch path; the distributed operator shards this by
    envelope-near neighbour groups)."""
    envs = [
        _env_of(g) if _polygon_parts(g) else None for g in geoms
    ]
    out = []
    for i, g in enumerate(geoms):
        if envs[i] is None:
            out.append(None)
            continue
        x0, y0, x1, y1 = envs[i]
        qx0, qy0 = x0 - gap_width, y0 - gap_width
        qx1, qy1 = x1 + gap_width, y1 + gap_width
        near = [
            geoms[j]
            for j in range(len(geoms))
            if j != i
            and envs[j] is not None
            and envs[j][0] <= qx1
            and qx0 <= envs[j][2]
            and envs[j][1] <= qy1
            and qy0 <= envs[j][3]
        ]
        out.append(validate_coverage_polygon(g, near, gap_width))
    return out


def _is_crossing(node, a0, a1, b0, b1) -> bool:
    """PolygonNodeTopology::isCrossing: do the b-corner arms separate
    the a-corner arms around the node (rings cross at the vertex)?"""

    def quadrant(o, p):
        dx, dy = p[0] - o[0], p[1] - o[1]
        if dx >= 0:
            return 0 if dy >= 0 else 3
        return 1 if dy >= 0 else 2

    def compare_angle(o, p, q):
        qp, qq = quadrant(o, p), quadrant(o, q)
        if qp > qq:
            return 1
        if qp < qq:
            return -1
        return _orient(o[0], o[1], q[0], q[1], p[0], p[1])

    def compare_between(o, p, e0, e1):
        c0 = compare_angle(o, p, e0)
        if c0 == 0:
            return 0
        c1 = compare_angle(o, p, e1)
        if c1 == 0:
            return 0
        return 1 if (c0 > 0 and c1 < 0) else -1

    a_lo, a_hi = a0, a1

    def angle_greater(o, p, q):
        qp, qq = quadrant(o, p), quadrant(o, q)
        if qp > qq:
            return True
        if qp < qq:
            return False
        return _orient(o[0], o[1], q[0], q[1], p[0], p[1]) == 1

    if angle_greater(node, a_lo, a_hi):
        a_lo, a_hi = a_hi, a_lo
    c0 = compare_between(node, b0, a_lo, a_hi)
    if c0 == 0:
        return False
    c1 = compare_between(node, b1, a_lo, a_hi)
    if c1 == 0:
        return False
    return c0 != c1
