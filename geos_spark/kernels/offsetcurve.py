"""Offset curve of a lineal geometry.

Re-derivation of ``src/operation/buffer/OffsetCurve.cpp`` (+
OffsetCurveSection.cpp): the raw one-sided offset chain is matched
against the buffer boundary rings (match distance |d|/10000) and the
matched ring sections, ordered by their position along the raw curve,
form the result. Polygon inputs take the buffer boundary directly
(computePolygonCurve). Negative distances offset to the right.
"""

from __future__ import annotations

import math

import numpy as np

from geos_spark.kernels import geom as G

NOT_IN_CURVE = -1.0
MATCH_DISTANCE_FACTOR = 10000.0


def _seg_dist(p, a, b) -> float:
    from geos_spark.kernels.dd import _point_to_segment

    return _point_to_segment(p, a, b)


def _seg_frac(p, a, b) -> float:
    dx, dy = b[0] - a[0], b[1] - a[1]
    l2 = dx * dx + dy * dy
    if l2 == 0.0:
        return 0.0
    t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / l2
    return min(max(t, 0.0), 1.0)


def _next(i, n):
    return 0 if i >= n - 1 else i + 1


def _prev(i, n):
    return n - 1 if i == 0 else i - 1


class _Section:
    __slots__ = ("pts", "loc", "loc_last")

    def __init__(self, pts, loc, loc_last):
        self.pts = pts
        self.loc = loc
        self.loc_last = loc_last

    def end_in_same_segment(self, next_loc: float) -> bool:
        return math.floor(self.loc_last) == math.floor(next_loc)


def _raw_offset(line_pts: np.ndarray, dist: float, params: dict):
    """OffsetCurveBuilder::getOffsetCurve — the one-sided raw chain,
    reversed back to input direction for the right side."""
    from geos_spark.kernels.buffer import _dedupe_ring, single_sided_curve

    pts = _dedupe_ring(line_pts)
    curve = single_sided_curve(pts, abs(dist), left=dist > 0, **params)
    if dist < 0:
        curve = list(reversed(curve))
    return curve


def _match_sections(ring: np.ndarray, raw: list, match_dist: float, joined: bool):
    """computeCurveSections over one buffer ring."""
    nseg = len(ring) - 1
    if nseg <= 0:
        return []
    loc = [NOT_IN_CURVE] * nseg
    rxmin = np.minimum(ring[:-1, 0], ring[1:, 0]) - match_dist
    rxmax = np.maximum(ring[:-1, 0], ring[1:, 0]) + match_dist
    rymin = np.minimum(ring[:-1, 1], ring[1:, 1]) - match_dist
    rymax = np.maximum(ring[:-1, 1], ring[1:, 1]) + match_dist
    first_index = None
    min_raw_pos = -1.0
    for i in range(len(raw) - 1):
        r0, r1 = raw[i], raw[i + 1]
        ex0, ex1 = min(r0[0], r1[0]), max(r0[0], r1[0])
        ey0, ey1 = min(r0[1], r1[1]), max(r0[1], r1[1])
        cand = np.flatnonzero(
            (rxmin <= ex1) & (ex0 <= rxmax)
            & (rymin <= ey1) & (ey0 <= rymax)
        )
        seg_min_idx = None
        seg_min_loc = -1.0
        for j in cand:
            p0 = (float(ring[j, 0]), float(ring[j, 1]))
            p1 = (float(ring[j + 1, 0]), float(ring[j + 1, 1]))
            if _seg_dist(p0, r0, r1) > match_dist:
                continue
            if _seg_dist(p1, r0, r1) > match_dist:
                continue
            frac = _seg_frac(p0, r0, r1)
            location = i + frac
            loc[int(j)] = location
            if seg_min_idx is None or location < seg_min_loc:
                seg_min_loc = location
                seg_min_idx = int(j)
        if seg_min_idx is not None and (
            first_index is None or seg_min_loc < min_raw_pos
        ):
            min_raw_pos = seg_min_loc
            first_index = seg_min_idx
    if first_index is None:
        return []
    return _extract_sections(ring, loc, first_index, joined)


def _extract_sections(ring, loc, start_index, joined):
    n = len(loc)

    def find_end(start):
        end = start
        while True:
            nxt = _next(end, n)
            if loc[nxt] == NOT_IN_CURVE:
                return nxt
            if joined and abs(loc[nxt] - loc[end]) > 1.0:
                return nxt
            end = nxt
            if end == start or end == start_index:
                return end

    def find_start(end):
        start = end
        while True:
            nxt = _next(start, n)
            if loc[start] == NOT_IN_CURVE:
                start = nxt
            else:
                prv = _prev(start, n)
                if loc[prv] == NOT_IN_CURVE:
                    return start
                if joined and abs(loc[start] - loc[prv]) > 1.0:
                    return start
                start = nxt
            if start == end:
                return start

    sections = []
    sec_start = start_index
    count = 0
    while True:
        sec_end = find_end(sec_start)
        location = loc[sec_start]
        last_index = _prev(sec_end, n)
        last_loc = loc[last_index]
        # length counts ring POINTS (srcPts->size() = n+1 for a closed
        # ring with n segments — OffsetCurveSection::create)
        length = (
            (n + 1) - sec_start + sec_end if sec_end <= sec_start
            else sec_end - sec_start + 1
        )
        pts = [
            (
                float(ring[(sec_start + k) % n, 0]),
                float(ring[(sec_start + k) % n, 1]),
            )
            for k in range(length)
        ]
        sections.append(_Section(pts, location, last_loc))
        sec_start = find_start(sec_end)
        count += 1
        if count > n + 1:
            break
        if sec_start == start_index or sec_end == start_index:
            break
    return sections


def _sections_to_geometry(sections, joined: bool) -> G.Geom:
    if not sections:
        return G.Geom.empty(G.LINESTRING)
    sections.sort(key=lambda s: s.loc)
    if len(sections) == 1:
        return G.Geom.linestring(
            np.asarray(sections[0].pts, dtype=np.float64)
        )
    if not joined:
        lines = [
            G.Geom.linestring(np.asarray(s.pts, dtype=np.float64))
            for s in sections
        ]
        return G.Geom(G.MULTILINESTRING, lines)
    out = []
    remove_start = False
    for i, s in enumerate(sections):
        remove_end = (
            i < len(sections) - 1
            and s.end_in_same_segment(sections[i + 1].loc)
        )
        for j, p in enumerate(s.pts):
            if (remove_start and j == 0) or (
                remove_end and j == len(s.pts) - 1
            ):
                continue
            if not out or out[-1] != p:
                out.append(p)
        remove_start = remove_end
    return G.Geom.linestring(np.asarray(out, dtype=np.float64))


def _compute_line_curve(line: G.Geom, dist: float, params, joined) -> G.Geom:
    from geos_spark.kernels.buffer import CAP_ROUND, _offset_seg, buffer_geom
    from geos_spark.kernels.scalars import geom_area, geom_length

    pts = line.data
    if len(pts) < 2 or geom_length(line) == 0.0:
        return G.Geom.empty(G.LINESTRING)
    if dist == 0.0:
        return G.Geom.linestring(np.array(pts, dtype=np.float64))
    if len(pts) == 2:
        from geos_spark.kernels.buffer import _LEFT, _RIGHT

        side = _LEFT if dist > 0 else _RIGHT
        q0, q1 = _offset_seg(
            tuple(pts[0]), tuple(pts[1]), side, abs(dist)
        )
        return G.Geom.linestring(np.array([q0, q1], dtype=np.float64))

    raw = _raw_offset(pts, dist, params)
    if len(raw) < 2:
        return G.Geom.empty(G.LINESTRING)

    buf = buffer_geom(line, abs(dist), cap=CAP_ROUND, **params)
    polys = [
        p for p in buf.geoms() if p.type_id == G.POLYGON and p.data
    ]
    if not polys:
        return G.Geom.empty(G.LINESTRING)
    best = max(polys, key=geom_area)
    rings = [np.asarray(r, dtype=np.float64) for r in best.data]
    # the reference's buffer shells are CW, so it reverses rings only
    # for the right side; this engine's shells are CCW, so the flip is
    # inverted: ring traversal must parallel the raw curve direction
    if dist > 0:
        rings = [r[::-1].copy() for r in rings]

    match_dist = abs(dist) / MATCH_DISTANCE_FACTOR
    sections = []
    for r in rings:
        sections.extend(_match_sections(r, raw, match_dist, joined))
    return _sections_to_geometry(sections, joined)


def offset_curve(
    g: G.Geom,
    distance: float,
    quad_segs: int = 8,
    join: str = "round",
    mitre_limit: float = 5.0,
    joined: bool = False,
) -> G.Geom:
    """GEOSOffsetCurve (capi geos_c.h.in): the curve at a signed
    perpendicular offset from the input linework (left positive)."""
    from geos_spark.kernels.buffer import buffer_geom
    from geos_spark.kernels.scalars import geom_boundary

    params = dict(quad_segs=quad_segs, join=join, mitre_limit=mitre_limit)
    parts = []
    for comp in g.geoms():
        if comp.type_id == G.POLYGON and comp.data:
            buf = buffer_geom(comp, distance, **params)
            bdy = geom_boundary(buf)
            parts.extend(
                p for p in bdy.geoms() if p.type_id == G.LINESTRING
            )
        elif comp.type_id == G.LINESTRING and len(comp.data):
            res = _compute_line_curve(comp, distance, params, joined)
            parts.extend(
                p for p in res.geoms()
                if p.type_id == G.LINESTRING and len(p.data)
            )
    if not parts:
        return G.Geom.empty(G.LINESTRING)
    if len(parts) == 1:
        return parts[0]
    return G.Geom(G.MULTILINESTRING, parts)
