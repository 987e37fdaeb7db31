"""TopologyPreservingSimplifier.

Port of the reference's tagged-line simplification
(``src/simplify/TopologyPreservingSimplifier.cpp``,
``TaggedLineStringSimplifier.cpp``, ``ComponentJumpChecker.cpp``):
Douglas-Peucker flattening constrained so no flattened section
crosses any input or already-simplified output segment
(robust interior-intersection tests) and no other component "jumps"
sides of a flattened section (ray-crossing parity check).  Rings keep
a minimum of 4 points and get the ring-endpoint merge pass.

Brute-force segment queries with envelope prefilters stand in for the
reference's quadtree LineSegmentIndex — identical results, simpler
kernel (corpus-size inputs; the distributed tier simplifies per
geometry inside a pandas-UDF batch anyway).
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.dd import _point_to_segment, segment_intersection_point
from geos_spark.kernels.orientation import orientation_index
from geos_spark.kernels.segments import intersect_pairs


class _Seg:
    __slots__ = ("p0", "p1", "owner", "index", "removed")

    def __init__(self, p0, p1, owner=None, index=0):
        self.p0 = p0
        self.p1 = p1
        self.owner = owner
        self.index = index
        self.removed = False

    def env(self):
        return (
            min(self.p0[0], self.p1[0]),
            min(self.p0[1], self.p1[1]),
            max(self.p0[0], self.p1[0]),
            max(self.p0[1], self.p1[1]),
        )


def _env_overlaps(e1, e2):
    return (
        e1[0] <= e2[2] and e2[0] <= e1[2]
        and e1[1] <= e2[3] and e2[1] <= e1[3]
    )


class _TaggedLine:
    def __init__(self, pts, min_size, is_ring, tag):
        self.pts = pts  # list of (x, y)
        self.min_size = min_size
        self.is_ring = is_ring
        self.tag = tag  # identity of the source component
        self.result: list[_Seg] = []
        self.input_segs: list[_Seg] = []

    def component_point(self):
        if self.result:
            return self.result[0].p0
        return self.pts[1] if len(self.pts) > 1 else self.pts[0]

    def result_coords(self):
        if not self.result:
            return []
        out = [s.p0 for s in self.result]
        out.append(self.result[-1].p1)
        return out


def _seg_dist(p, a, b):
    return _point_to_segment(p, a, b)


def _equals_topo(a0, a1, b0, b1):
    return (a0 == b0 and a1 == b1) or (a0 == b1 and a1 == b0)


def _is_interior_intersection(a0, a1, b0, b1) -> bool:
    A = np.array([[a0[0], a0[1], a1[0], a1[1]]])
    B = np.array([[b0[0], b0[1], b1[0], b1[1]]])
    cls = intersect_pairs(A, B)
    if cls[0] == 0:
        return False
    if cls[0] == 2:  # collinear overlap (non-equal handled by caller)
        return True
    o1 = int(orientation_index(a0[0], a0[1], a1[0], a1[1], b0[0], b0[1]))
    o2 = int(orientation_index(a0[0], a0[1], a1[0], a1[1], b1[0], b1[1]))
    o3 = int(orientation_index(b0[0], b0[1], b1[0], b1[1], a0[0], a0[1]))
    o4 = int(orientation_index(b0[0], b0[1], b1[0], b1[1], a1[0], a1[1]))
    pt = segment_intersection_point(a0, a1, b0, b1, o1, o2, o3, o4)
    return (pt != a0 and pt != a1) or (pt != b0 and pt != b1)


def _crossing_parity(pt, segs) -> int:
    """Ray-crossing count parity of +x ray from pt over segments."""
    cnt = 0
    px, py = pt
    for p0, p1 in segs:
        if (p0[1] > py) != (p1[1] > py):
            xi = p0[0] + (py - p0[1]) * (p1[0] - p0[0]) / (p1[1] - p0[1])
            if xi > px:
                cnt += 1
    return cnt % 2


class _Simplifier:
    def __init__(self, lines: list[_TaggedLine], tolerance: float):
        self.lines = lines
        self.tol = tolerance
        self.input_segs: list[_Seg] = []
        for ln in lines:
            for i in range(len(ln.pts) - 1):
                s = _Seg(ln.pts[i], ln.pts[i + 1], ln, i)
                ln.input_segs.append(s)
                self.input_segs.append(s)
        self.output_segs: list[_Seg] = []

    # -- index queries -------------------------------------------------
    def _query(self, segs, p0, p1):
        env = (
            min(p0[0], p1[0]), min(p0[1], p1[1]),
            max(p0[0], p1[0]), max(p0[1], p1[1]),
        )
        return [
            s for s in segs if not s.removed and _env_overlaps(env, s.env())
        ]

    def has_output_intersection(self, p0, p1) -> bool:
        for s in self._query(self.output_segs, p0, p1):
            if _equals_topo(s.p0, s.p1, p0, p1) or _is_interior_intersection(
                s.p0, s.p1, p0, p1
            ):
                return True
        return False

    def has_input_intersection(self, line, sec_start, sec_end, p0, p1) -> bool:
        for s in self._query(self.input_segs, p0, p1):
            if _equals_topo(s.p0, s.p1, p0, p1) or _is_interior_intersection(
                s.p0, s.p1, p0, p1
            ):
                if (
                    line is not None
                    and s.owner is line
                    and sec_start <= s.index < sec_end
                ):
                    continue
                return True
        return False

    def has_jump(self, line, sec_segs, flat) -> bool:
        """ComponentJumpChecker: another component's point changes
        ray-crossing parity between the section and its flattening."""
        env = None
        for p0, p1 in sec_segs:
            e = (
                min(p0[0], p1[0]), min(p0[1], p1[1]),
                max(p0[0], p1[0]), max(p0[1], p1[1]),
            )
            env = e if env is None else (
                min(env[0], e[0]), min(env[1], e[1]),
                max(env[2], e[2]), max(env[3], e[3]),
            )
        for comp in self.lines:
            if comp is line:
                continue
            cp = comp.component_point()
            if not (env[0] <= cp[0] <= env[2] and env[1] <= cp[1] <= env[3]):
                continue
            if _crossing_parity(cp, sec_segs) != _crossing_parity(
                cp, [flat]
            ):
                return True
        return False

    # -- core ----------------------------------------------------------
    def simplify(self):
        for ln in self.lines:
            if not ln.pts:
                continue
            self._simplify_section(ln, 0, len(ln.pts) - 1, 0)
            if ln.is_ring and len(ln.pts) > 3 and ln.pts[0] == ln.pts[-1]:
                self._simplify_ring_endpoint(ln)

    def _add_result(self, ln, p0, p1, to_output=True):
        s = _Seg(p0, p1, ln)
        ln.result.append(s)
        if to_output:
            self.output_segs.append(s)
        return s

    def _simplify_section(self, ln, i, j, depth):
        depth += 1
        if i + 1 == j:
            self._add_result(ln, ln.pts[i], ln.pts[i + 1], to_output=False)
            return
        valid = True
        # getResultSize is in COORDINATES (segments + 1)
        result_size = 0 if not ln.result else len(ln.result) + 1
        if result_size < ln.min_size:
            if depth + 1 < ln.min_size:
                valid = False
        # furthest point
        a, b = ln.pts[i], ln.pts[j]
        max_dist = -1.0
        max_idx = i
        for k in range(i + 1, j):
            d = _seg_dist(ln.pts[k], a, b)
            if d > max_dist:
                max_dist = d
                max_idx = k
        if max_dist < 0:
            for k in range(i, j):
                self._add_result(
                    ln, ln.pts[k], ln.pts[k + 1], to_output=False
                )
            return
        if max_dist > self.tol:
            valid = False
        if valid:
            valid = not (
                self.has_output_intersection(a, b)
                or self.has_input_intersection(ln, i, j, a, b)
                or self.has_jump(
                    ln,
                    [(ln.pts[k], ln.pts[k + 1]) for k in range(i, j)],
                    (a, b),
                )
            )
        if valid:
            self._add_result(ln, a, b)
            for s in ln.input_segs[i:j]:
                s.removed = True
            return
        self._simplify_section(ln, i, max_idx, depth)
        self._simplify_section(ln, max_idx, j, depth)

    def _simplify_ring_endpoint(self, ln):
        result_size = 0 if not ln.result else len(ln.result) + 1
        if result_size <= ln.min_size:
            return
        first = ln.result[0]
        last = ln.result[-1]
        p0, p1 = last.p0, first.p1
        end_pt = first.p0
        if _seg_dist(end_pt, p0, p1) > self.tol:
            return
        # isTopologyValid(seg variant): collinear fast accept
        if int(
            orientation_index(p0[0], p0[1], p1[0], p1[1], end_pt[0], end_pt[1])
        ) != 0:
            first.removed = True
            last.removed = True
            if self.has_output_intersection(p0, p1) or (
                self.has_input_intersection(None, 0, 0, p0, p1)
            ) or self.has_jump(
                ln, [(last.p0, last.p1), (first.p0, first.p1)], (p0, p1)
            ):
                first.removed = False
                last.removed = False
                return
            first.removed = False
            last.removed = False
        # merge: first.p0 = last.p0, drop last
        last.removed = True
        first.p0 = last.p0
        ln.result.pop()
        if first not in self.output_segs:
            self.output_segs.append(first)


def simplify_tp(g: G.Geom, tolerance: float) -> G.Geom:
    """TopologyPreservingSimplifier::simplify."""
    if g.is_empty:
        return g
    lines: list[_TaggedLine] = []

    def tag_of(part, ring_idx=None):
        return (id(part), ring_idx)

    def collect(part):
        if part.type_id == G.LINESTRING and len(part.data):
            pts = [(float(x), float(y)) for x, y in part.data]
            closed = pts[0] == pts[-1] and len(pts) >= 4
            lines.append(
                _TaggedLine(pts, 4 if closed else 2, part.is_ring or closed,
                            tag_of(part))
            )
        elif part.type_id == G.POLYGON:
            for ri, r in enumerate(part.data):
                pts = [(float(x), float(y)) for x, y in r]
                lines.append(_TaggedLine(pts, 4, True, tag_of(part, ri)))

    for part in g.geoms():
        collect(part)
    sim = _Simplifier(lines, tolerance)
    sim.simplify()
    by_tag = {ln.tag: ln for ln in lines}

    def rebuild(part):
        if part.type_id == G.LINESTRING and len(part.data):
            coords = by_tag[tag_of(part)].result_coords()
            return G.Geom.linestring(np.asarray(coords, dtype=np.float64))
        if part.type_id == G.POLYGON:
            rings = []
            for ri, _r in enumerate(part.data):
                coords = by_tag[tag_of(part, ri)].result_coords()
                if coords and coords[0] != coords[-1]:
                    coords.append(coords[0])
                if len(coords) >= 4:
                    rings.append(np.asarray(coords, dtype=np.float64))
                elif ri == 0:
                    return G.Geom(G.POLYGON, [])
            return G.Geom(G.POLYGON, rings)
        return part

    if not g.is_collection:
        return rebuild(g)
    parts = [rebuild(p) for p in g.data]
    parts = [p for p in parts if not p.is_empty]
    return G.Geom(g.type_id, parts)
