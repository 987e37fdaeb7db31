"""Overlay (intersection / union / difference / symDifference) kernel.

Reimplements the reference's OverlayNG pipeline
(``src/operation/overlayng/OverlayNG.cpp:207-280``) over a flat
noded-segment arrangement instead of the OverlayGraph half-edge
machinery; the *semantics* follow the reference with citations:

- op truth table over locations      ``OverlayNG.cpp:72-91``
  (BOUNDARY counts as INTERIOR)
- result dimension per op            ``OverlayUtil.cpp:200-224``
- empty-operand short-circuits       ``OverlayUtil.cpp:116-137``
- empty result typing                ``OverlayUtil.cpp:176-196``
- line-edge inclusion rules          ``LineBuilder.cpp:67-150``
- boundary-touch lines in result     ``OverlayLabel.h:229-233``
- collapse handling                  ``OverlayLabel.cpp:128-141``,
  ``OverlayLabel.h:312-320``
- intersection-node result points    ``IntersectionPointBuilder.cpp:44-88``
- point-operand overlays             ``OverlayPoints.cpp``,
  ``OverlayMixedPoints.cpp:109-250``
- result assembly, A/L/P order,
  most-specific type                 ``OverlayUtil.cpp:281-302``
- noded intersection coordinates     DD homogeneous form +
  nearest-endpoint fallback (see ``kernels/dd.py``) — this is what
  makes output vertices bit-identical to the reference

Precision handling: this module's entry points run the FLOATING
model; the full robustness ladder of the reference
(``OverlayNGRobust.cpp:100-295``: plain float, then snapping at
geometry-derived tolerances, then snap-rounding on a fixed grid) is
implemented by ``overlay_robust`` at the bottom of this file, with the
fixed-precision snap-round overlay itself in ``kernels/snapround.py``.
The robust/overlay xmltester corpus (xt_robust) and the
fixed-precision corpus (xt_overlay_prec) score those paths.

Scalar kernel over ``Geom`` values: in the engine this runs inside a
pandas-UDF batch loop per Arrow batch (one overlay per row pair); the
distributed tiling fast path (clip-by-rect) stays in ``clip.py``.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.dd import segment_intersection_point
from geos_spark.kernels.orientation import orientation_index
from geos_spark.kernels.pip import BOUNDARY, EXTERIOR, INTERIOR
from geos_spark.kernels.relate import (
    _line_parts,
    _locate_in_polys,
    _locate_on_lines,
    _point_parts,
    _poly_parts,
)
from geos_spark.kernels.scalars import ring_signed_area
from geos_spark.kernels.segments import (
    COLLINEAR_INTERSECTION,
    POINT_INTERSECTION,
    intersect_pairs,
)

INTERSECTION = 1
UNION = 2
DIFFERENCE = 3
SYMDIFFERENCE = 4

# label kinds per input (OverlayLabel dims)
_NOT_PART = 0
_BOUNDARY = 1
_COLLAPSE = 2
_LINE = 3

_INT = int(INTERIOR)
_BND = int(BOUNDARY)
_EXT = int(EXTERIOR)


def _is_result_of_op(op: int, loc0: int, loc1: int) -> bool:
    """OverlayNG::isResultOfOp (OverlayNG.cpp:72-91)."""
    if loc0 == _BND:
        loc0 = _INT
    if loc1 == _BND:
        loc1 = _INT
    if op == INTERSECTION:
        return loc0 == _INT and loc1 == _INT
    if op == UNION:
        return loc0 == _INT or loc1 == _INT
    if op == DIFFERENCE:
        return loc0 == _INT and loc1 != _INT
    if op == SYMDIFFERENCE:
        return (loc0 == _INT) != (loc1 == _INT)
    return False


def _result_dimension(op: int, dim0: int, dim1: int) -> int:
    """OverlayUtil::resultDimension (OverlayUtil.cpp:200-224)."""
    if op == INTERSECTION:
        return min(dim0, dim1)
    if op == UNION:
        return max(dim0, dim1)
    if op == DIFFERENCE:
        return dim0
    return max(dim0, dim1)  # SYMDIFFERENCE


def _empty_result(dim: int) -> G.Geom:
    """OverlayUtil::createEmptyResult (OverlayUtil.cpp:176-196)."""
    if dim == 0:
        return G.Geom.empty(G.POINT)
    if dim == 1:
        return G.Geom.empty(G.LINESTRING)
    if dim == 2:
        return G.Geom(G.POLYGON, [])
    return G.Geom(G.GEOMETRYCOLLECTION, [])


def _env_disjoint(a: G.Geom, b: G.Geom, scale: float | None = None) -> bool:
    """OverlayUtil::isEnvDisjoint — with a FIXED precision model the
    envelopes are rounded first (OverlayUtil.cpp:146-166)."""
    ax0, ay0, ax1, ay1 = a.envelope()
    bx0, by0, bx1, by1 = b.envelope()
    if scale is not None:
        from geos_spark.kernels.snapround import PrecisionGrid

        mp = PrecisionGrid(scale).make_precise
        ax0, ay0, ax1, ay1 = mp(ax0), mp(ay0), mp(ax1), mp(ay1)
        bx0, by0, bx1, by1 = mp(bx0), mp(by0), mp(bx1), mp(by1)
    return ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0


def _build_result(polys, lines, points, rdim) -> G.Geom:
    """OverlayUtil::createResultGeometry: order A,L,P; most-specific
    type via GeometryFactory::buildGeometry conventions."""
    items: list[G.Geom] = []
    items.extend(polys)
    items.extend(lines)
    items.extend(points)
    if not items:
        return _empty_result(rdim)
    if len(items) == 1:
        return items[0]
    tids = {g.type_id for g in items}
    if tids == {G.POLYGON}:
        return G.Geom.collection(G.MULTIPOLYGON, items)
    if tids == {G.LINESTRING}:
        return G.Geom.collection(G.MULTILINESTRING, items)
    if tids == {G.POINT}:
        return G.Geom.collection(G.MULTIPOINT, items)
    return G.Geom.collection(G.GEOMETRYCOLLECTION, items)


# ----------------------------------------------------------------------
# point-operand overlays
# ----------------------------------------------------------------------


def _unique_pts(arr: np.ndarray) -> list[tuple[float, float]]:
    seen: set = set()
    out = []
    for x, y in arr:
        k = (float(x), float(y))
        if k not in seen:
            seen.add(k)
            out.append(k)
    return out


def _round_pts(pts: list, scale: float | None) -> list:
    if scale is None:
        return pts
    from geos_spark.kernels.snapround import PrecisionGrid

    grid = PrecisionGrid(scale)
    out = []
    seen = set()
    for p in pts:
        rp = grid.round_pt(p)
        if rp not in seen:
            seen.add(rp)
            out.append(rp)
    return out


def _overlay_points(
    a: G.Geom, b: G.Geom, op: int, scale: float | None = None
) -> G.Geom:
    """OverlayPoints: P/P overlay by coordinate equality after
    precision-model rounding (no-op for FLOATING)."""
    pa = _round_pts(_unique_pts(_point_parts(a)), scale)
    pb = _round_pts(_unique_pts(_point_parts(b)), scale)
    sb = set(pb)
    sa = set(pa)
    if op == INTERSECTION:
        keep = [p for p in pa if p in sb]
    elif op == UNION:
        keep = pa + [p for p in pb if p not in sa]
    elif op == DIFFERENCE:
        keep = [p for p in pa if p not in sb]
    else:
        keep = [p for p in pa if p not in sb] + [p for p in pb if p not in sa]
    pts = [G.Geom.point(x, y) for x, y in sorted(keep)]
    return _build_result([], [], pts, 0)


def _covered_mask(coords: list, other: G.Geom, other_dim: int) -> list[bool]:
    pts = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    if other_dim == 2:
        loc = _locate_in_polys(pts, _poly_parts(other))
    else:
        loc = _locate_on_lines(pts, _line_parts(other))
    return [int(v) != _EXT for v in loc]


def _self_union(g: G.Geom, scale: float | None = None) -> G.Geom:
    """OverlayNG::geomunion on a single edge geometry: node + merge
    (used by OverlayMixedPoints::prepareNonPoint)."""
    return overlay(g, G.Geom.empty(G.LINESTRING), UNION, scale)


def _overlay_mixed_points(
    a: G.Geom, b: G.Geom, op: int, rdim: int, scale: float | None = None
) -> G.Geom:
    """OverlayMixedPoints (OverlayMixedPoints.cpp:109-250)."""
    point_is_a = a.dimension() == 0
    pt_geom, other = (a, b) if point_is_a else (b, a)
    if rdim != 0:
        # node the non-point operand for output (prepareNonPoint,
        # OverlayMixedPoints.cpp:153-163)
        other = _self_union(other, scale)
    other_dim = other.dimension()
    coords = _round_pts(_unique_pts(_point_parts(pt_geom)), scale)
    covered = (
        _covered_mask(coords, other, other_dim) if coords else []
    )

    def pt_result(keep: list) -> G.Geom:
        pts = [G.Geom.point(x, y) for x, y in sorted(keep)]
        if not pts:
            return _empty_result(0)
        return _build_result([], [], pts, 0)

    if op == INTERSECTION:
        return pt_result([c for c, cv in zip(coords, covered) if cv])
    if op == DIFFERENCE:
        if not point_is_a:  # A - P = A unchanged
            return other
        return pt_result([c for c, cv in zip(coords, covered) if not cv])
    # UNION / SYMDIFFERENCE: non-point geometry + uncovered points
    free = [c for c, cv in zip(coords, covered) if not cv]
    pts = [G.Geom.point(x, y) for x, y in sorted(free)]
    polys = [g for g in other.geoms() if g.type_id == G.POLYGON and g.data]
    lines = [
        g for g in other.geoms() if g.type_id == G.LINESTRING and len(g.data)
    ]
    return _build_result(polys, lines, pts, rdim)


# ----------------------------------------------------------------------
# edge overlay: noding
# ----------------------------------------------------------------------


class _SrcSeg:
    __slots__ = ("p", "q", "inp", "is_ring", "int_left", "splits",
                 "sid", "idx")

    def __init__(self, p, q, inp, is_ring, int_left, sid, idx):
        self.p = p
        self.q = q
        self.inp = inp
        self.is_ring = is_ring
        self.int_left = int_left  # interior of parent area left of p->q
        self.sid = sid  # source segment-string (ring / line part)
        self.idx = idx  # position within the string
        self.splits: list[tuple[float, tuple[float, float]]] = []


def _collect_segments(g: G.Geom, inp: int, sid0: int):
    """Segments tagged with their source segment-string, mirroring
    EdgeNodingBuilder's one-SegmentString-per-ring/line model."""
    out: list[_SrcSeg] = []
    sizes: dict[int, int] = {}
    ringflag: dict[int, bool] = {}
    sid = sid0
    for poly in _poly_parts(g):
        for ri, r in enumerate(poly.data):
            if len(r) < 4:
                continue
            ccw = ring_signed_area(r) > 0
            is_hole = ri > 0
            int_left = ccw != is_hole
            k = 0
            for i in range(len(r) - 1):
                p = (float(r[i, 0]), float(r[i, 1]))
                q = (float(r[i + 1, 0]), float(r[i + 1, 1]))
                if p != q:
                    out.append(_SrcSeg(p, q, inp, True, int_left, sid, k))
                    k += 1
            if k:
                sizes[sid] = k
                ringflag[sid] = True
                sid += 1
    for line in _line_parts(g):
        k = 0
        for i in range(len(line) - 1):
            p = (float(line[i, 0]), float(line[i, 1]))
            q = (float(line[i + 1, 0]), float(line[i + 1, 1]))
            if p != q:
                out.append(_SrcSeg(p, q, inp, False, False, sid, k))
                k += 1
        if k:
            sizes[sid] = k
            ringflag[sid] = False
            sid += 1
    return out, sizes, ringflag, sid


def _param_of(p, q, pt) -> float:
    dx = q[0] - p[0]
    dy = q[1] - p[1]
    if abs(dx) >= abs(dy):
        return (pt[0] - p[0]) / dx if dx != 0.0 else 0.0
    return (pt[1] - p[1]) / dy


def _add_split(seg: _SrcSeg, pt) -> None:
    if pt == seg.p or pt == seg.q:
        return
    t = _param_of(seg.p, seg.q, pt)
    seg.splits.append((t, pt))


class _SnapIndex:
    """SnappingPointIndex (src/noding/snap/SnappingPointIndex.cpp) on
    a cell hash: inserting a point snaps it to the nearest existing
    point within tolerance (ties -> lesser coordinate, the KdTree
    BestMatchVisitor rule, src/index/kdtree/KdTree.cpp:318-333), else
    registers it as a new canonical point."""

    __slots__ = ("tol", "cells")

    def __init__(self, tol: float):
        self.tol = tol
        self.cells: dict = {}

    def snap(self, pt):
        import math

        x, y = float(pt[0]), float(pt[1])
        tol = self.tol
        cx = int(math.floor(x / tol))
        cy = int(math.floor(y / tol))
        best = None
        bd = tol
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for q in self.cells.get((cx + dx, cy + dy), ()):
                    d = math.hypot(q[0] - x, q[1] - y)
                    if d <= bd and (
                        best is None or d < bd or q < best
                    ):
                        bd = d
                        best = q
        if best is not None:
            return best
        self.cells.setdefault((cx, cy), []).append((x, y))
        return (x, y)


def _snap_coords(c: np.ndarray, snap: "_SnapIndex", is_ring: bool):
    """Snap a coordinate chain through the index, dropping repeats
    (SnappingNoder::snap)."""
    out = []
    for x, y in c:
        p = snap.snap((float(x), float(y)))
        if not out or out[-1] != p:
            out.append(p)
    if is_ring and len(out) > 1 and out[0] != out[-1]:
        out.append(out[0])
    return out


def _snap_operand(g: G.Geom, snap: "_SnapIndex") -> G.Geom:
    """Vertex-snapped copy of an edge operand (rings/lines)."""
    polys = []
    for poly in _poly_parts(g):
        rings = []
        for r in poly.data:
            sc = _snap_coords(r, snap, is_ring=True)
            rings.append(np.array(sc, dtype=np.float64).reshape(-1, 2))
        polys.append(G.Geom(G.POLYGON, rings))
    lines = [
        G.Geom(
            G.LINESTRING,
            np.array(
                _snap_coords(ln, snap, is_ring=False), dtype=np.float64
            ).reshape(-1, 2),
        )
        for ln in _line_parts(g)
    ]
    parts = polys + lines
    if not parts:
        return g
    if len(parts) == 1:
        return parts[0]
    tids = {p.type_id for p in parts}
    if tids == {G.POLYGON}:
        return G.Geom.collection(G.MULTIPOLYGON, parts)
    if tids == {G.LINESTRING}:
        return G.Geom.collection(G.MULTILINESTRING, parts)
    return G.Geom.collection(G.GEOMETRYCOLLECTION, parts)


def _seed_snap_index(geoms, snap: "_SnapIndex") -> None:
    """SnappingNoder::seedSnapIndex — load a quasi-random 1% sample of
    each string's vertices first, so snapping is order-insensitive on
    large inputs (additive-recurrence golden-ratio sequence)."""
    import math

    phi_inv = (math.sqrt(5.0) - 1.0) / 2.0
    for g in geoms:
        chains = [p for poly in _poly_parts(g) for p in poly.data]
        chains += list(_line_parts(g))
        for c in chains:
            npts = len(c)
            rand = 0.0
            for _ in range(npts // 100):
                rand += phi_inv
                if rand > 1.0:
                    rand -= math.floor(rand)
                idx = int(npts * rand)
                snap.snap((float(c[idx, 0]), float(c[idx, 1])))


def _proj_param(p, q, pt) -> float:
    """Clamped projection parameter of pt on segment p->q (the order
    key NodedSegmentString uses for nodes beside the segment)."""
    dx = q[0] - p[0]
    dy = q[1] - p[1]
    l2 = dx * dx + dy * dy
    if l2 == 0.0:
        return 0.0
    t = ((pt[0] - p[0]) * dx + (pt[1] - p[1]) * dy) / l2
    return min(max(t, 0.0), 1.0)


def _node_segments_snapping(
    segs: list[_SrcSeg], sizes: dict, ringflag: dict, snap: "_SnapIndex"
) -> set:
    """SnappingNoder::snapIntersections via SnappingIntersectionAdder
    (src/noding/snap/SnappingIntersectionAdder.cpp):

    - single-point intersections of non-adjacent segments are snapped
      through the shared point index and added as nodes to both;
    - collinear (two-point) intersections are NOT handled here — the
      near-vertex rule covers them;
    - near-vertex: a segment endpoint within tol of another segment's
      interior (but not of its endpoints) becomes a node on both.

    Pair candidates use envelopes expanded by 2*tol (the MCIndexNoder
    overlap tolerance)."""
    from geos_spark.kernels.dd import _point_to_segment

    tol = snap.tol
    nodes: set = set()
    n = len(segs)
    if n < 2:
        return nodes
    arr = np.array(
        [[s.p[0], s.p[1], s.q[0], s.q[1]] for s in segs], dtype=np.float64
    )
    ii, jj = _overlap_pairs(arr, margin=2.0 * tol)
    if len(ii) == 0:
        return nodes

    def adjacent(si: _SrcSeg, sj: _SrcSeg) -> bool:
        if si.sid != sj.sid:
            return False
        return abs(si.idx - sj.idx) == 1 or (
            ringflag.get(si.sid, False)
            and {si.idx, sj.idx} == {0, sizes[si.sid] - 1}
        )

    # --- snapped single-point intersections --------------------------
    A, B = arr[ii], arr[jj]
    cls = intersect_pairs(A, B)
    hit = np.flatnonzero(cls == POINT_INTERSECTION)
    if len(hit):
        Ah, Bh = A[hit], B[hit]
        o1 = orientation_index(Ah[:, 0], Ah[:, 1], Ah[:, 2], Ah[:, 3], Bh[:, 0], Bh[:, 1])
        o2 = orientation_index(Ah[:, 0], Ah[:, 1], Ah[:, 2], Ah[:, 3], Bh[:, 2], Bh[:, 3])
        o3 = orientation_index(Bh[:, 0], Bh[:, 1], Bh[:, 2], Bh[:, 3], Ah[:, 0], Ah[:, 1])
        o4 = orientation_index(Bh[:, 0], Bh[:, 1], Bh[:, 2], Bh[:, 3], Ah[:, 2], Ah[:, 3])
        for k, h in enumerate(hit):
            si = segs[int(ii[h])]
            sj = segs[int(jj[h])]
            if adjacent(si, sj):
                continue
            pt = segment_intersection_point(
                si.p, si.q, sj.p, sj.q,
                int(o1[k]), int(o2[k]), int(o3[k]), int(o4[k]),
            )
            pt = snap.snap(pt)
            nodes.add(pt)
            _add_split_proj(si, pt)
            _add_split_proj(sj, pt)

    # --- near-vertex snaps (vectorized distance screen) --------------
    # endpoints of each pair member vs the other segment
    combos = []  # (P array, segment array, owner idx arr, target idx arr)
    for P, S, own, tgt in (
        (arr[ii][:, 0:2], arr[jj], ii, jj),
        (arr[ii][:, 2:4], arr[jj], ii, jj),
        (arr[jj][:, 0:2], arr[ii], jj, ii),
        (arr[jj][:, 2:4], arr[ii], jj, ii),
    ):
        de0 = np.hypot(P[:, 0] - S[:, 0], P[:, 1] - S[:, 1])
        de1 = np.hypot(P[:, 0] - S[:, 2], P[:, 1] - S[:, 3])
        d2 = _seg_point_dist2_sn(S, P)
        cand = np.flatnonzero(
            (de0 >= tol) & (de1 >= tol) & (d2 < tol * tol)
        )
        for c in cand:
            p = (float(P[c, 0]), float(P[c, 1]))
            target = segs[int(tgt[c])]
            _add_split_proj(target, p)
            nodes.add(p)
    return nodes


def _seg_point_dist2_sn(S: np.ndarray, P: np.ndarray) -> np.ndarray:
    """Squared point-to-segment distance, rowwise (P[i] vs S[i])."""
    dx = S[:, 2] - S[:, 0]
    dy = S[:, 3] - S[:, 1]
    l2 = dx * dx + dy * dy
    t = np.zeros(len(S))
    nz = l2 > 0
    t[nz] = (
        (P[nz, 0] - S[nz, 0]) * dx[nz] + (P[nz, 1] - S[nz, 1]) * dy[nz]
    ) / l2[nz]
    t = np.clip(t, 0.0, 1.0)
    qx = S[:, 0] + t * dx
    qy = S[:, 1] + t * dy
    return (P[:, 0] - qx) ** 2 + (P[:, 1] - qy) ** 2


def _add_split_proj(seg: _SrcSeg, pt) -> None:
    """Split at a point possibly beside the segment (snapped/near
    vertex): order key is the clamped projection parameter."""
    if pt == seg.p or pt == seg.q:
        return
    seg.splits.append((_proj_param(seg.p, seg.q, pt), pt))


def _validate_noding(segs: list[_SrcSeg]) -> None:
    """FastNodingValidator (src/noding/FastNodingValidator.cpp via
    NodingIntersectionFinder): after splitting, no two noded pieces
    may properly cross, touch interior-to-endpoint, or partially
    overlap — they may only share endpoints (exact duplicates are
    fine, they dissolve in the edge merge). Raises on violation so the
    robust ladder escalates to the snapping tier — float noding can
    produce degree-balanced but wrongly-crossed arrangements on
    near-coincident linework, which this is the only reliable way to
    catch (the reference validates its float noder by default,
    OverlayNGRobust.cpp:105-121)."""
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
        for u, v in zip(pts[:-1], pts[1:]):
            if u != v:
                pieces.append((u[0], u[1], v[0], v[1]))
    m = len(pieces)
    if m < 2:
        return
    arr = np.asarray(pieces, dtype=np.float64)
    # x-sweep candidate generation (the MCIndexNoder role): triu over
    # m pieces materializes O(m^2) index arrays — 11+s and GBs on the
    # 10^4-segment external-buffer corpus polygons
    ii, jj = _overlap_pairs(arr)
    if len(ii) == 0:
        return
    A, B = arr[ii], arr[jj]
    cls = intersect_pairs(A, B)
    hit = np.flatnonzero(cls)
    if len(hit) == 0:
        return
    # shared-endpoint touches are valid; exact duplicates are valid
    Ah, Bh = A[hit], B[hit]
    a_p = Ah[:, 0:2]
    a_q = Ah[:, 2:4]
    b_p = Bh[:, 0:2]
    b_q = Bh[:, 2:4]
    eq = lambda u, v: (u[:, 0] == v[:, 0]) & (u[:, 1] == v[:, 1])
    shares_end = eq(a_p, b_p) | eq(a_p, b_q) | eq(a_q, b_p) | eq(a_q, b_q)
    dup = (eq(a_p, b_p) & eq(a_q, b_q)) | (eq(a_p, b_q) & eq(a_q, b_p))
    is_pt = cls[hit] == POINT_INTERSECTION
    bad = (is_pt & ~shares_end) | (~is_pt & ~dup)
    if bad.any():
        raise ValueError("invalid noding (interior intersection)")


def _overlap_pairs(arr: np.ndarray, margin: float = 0.0):
    """Envelope-overlapping segment pairs (i < j) via an x-sweep —
    the MCIndexNoder's candidate-generation role.  triu_indices over
    n segments materializes O(n^2) index arrays (1.6 GB at 10k
    segments); the sweep is O(n log n + k).  Worst case (everything
    x-overlapping) degrades to the same all-pairs set."""
    n = len(arr)
    x0 = np.minimum(arr[:, 0], arr[:, 2]) - margin
    x1 = np.maximum(arr[:, 0], arr[:, 2]) + margin
    y0 = np.minimum(arr[:, 1], arr[:, 3]) - margin
    y1 = np.maximum(arr[:, 1], arr[:, 3]) + margin
    order = np.argsort(x0, kind="mergesort")
    X0 = x0[order]
    X1 = x1[order]
    # for sorted position i, candidates are positions i+1..hi_i-1
    # with X0 <= X1[i]
    hi = np.searchsorted(X0, X1, side="right")
    starts = np.arange(n) + 1
    counts = np.maximum(hi - starts, 0)
    total = int(counts.sum())
    if total == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
        )
    si = np.repeat(np.arange(n), counts)
    offs = np.arange(total) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    sj = np.repeat(starts, counts) + offs
    ii = order[si]
    jj = order[sj]
    keep = (y0[ii] <= y1[jj]) & (y0[jj] <= y1[ii])
    ii, jj = ii[keep], jj[keep]
    swap = ii > jj
    ii2 = np.where(swap, jj, ii)
    jj2 = np.where(swap, ii, jj)
    return ii2, jj2


def _node_segments(segs: list[_SrcSeg], sizes: dict, ringflag: dict) -> set:
    """Split every segment at its intersections with every other
    segment (both inputs together — the reference nodes all edges in
    one pass, EdgeNodingBuilder).  O(n^2) pair generation with a
    vectorized envelope prefilter; exact split coordinates.

    Returns the set of node points — where noded chains (GEOS Edges)
    break.  Trivial intersections (adjacent segments of one string
    touching at their shared vertex, IntersectionAdder semantics) add
    no node."""
    nodes: set = set()
    n = len(segs)
    if n < 2:
        return nodes
    arr = np.array(
        [[s.p[0], s.p[1], s.q[0], s.q[1]] for s in segs], dtype=np.float64
    )
    ii, jj = _overlap_pairs(arr)
    if len(ii) == 0:
        return nodes
    cls = intersect_pairs(arr[ii], arr[jj])
    hit = np.flatnonzero(cls)
    if len(hit) == 0:
        return nodes
    A = arr[ii[hit]]
    B = arr[jj[hit]]
    o1 = orientation_index(A[:, 0], A[:, 1], A[:, 2], A[:, 3], B[:, 0], B[:, 1])
    o2 = orientation_index(A[:, 0], A[:, 1], A[:, 2], A[:, 3], B[:, 2], B[:, 3])
    o3 = orientation_index(B[:, 0], B[:, 1], B[:, 2], B[:, 3], A[:, 0], A[:, 1])
    o4 = orientation_index(B[:, 0], B[:, 1], B[:, 2], B[:, 3], A[:, 2], A[:, 3])
    for k, h in enumerate(hit):
        si = segs[int(ii[h])]
        sj = segs[int(jj[h])]
        if cls[h] == POINT_INTERSECTION:
            same = si.sid == sj.sid
            adjacent = same and (
                abs(si.idx - sj.idx) == 1
                or (
                    ringflag.get(si.sid, False)
                    and {si.idx, sj.idx} == {0, sizes[si.sid] - 1}
                )
            )
            pt = segment_intersection_point(
                si.p, si.q, sj.p, sj.q,
                int(o1[k]), int(o2[k]), int(o3[k]), int(o4[k]),
            )
            if not adjacent:
                nodes.add(pt)
            _add_split(si, pt)
            _add_split(sj, pt)
        elif cls[h] == COLLINEAR_INTERSECTION:
            # collinear overlap: node each at the other's endpoints
            for ep in (sj.p, sj.q):
                t = _param_of(si.p, si.q, ep)
                if 0.0 <= t <= 1.0:
                    nodes.add(ep)
                if 0.0 < t < 1.0:
                    _add_split(si, ep)
            for ep in (si.p, si.q):
                t = _param_of(sj.p, sj.q, ep)
                if 0.0 <= t <= 1.0:
                    nodes.add(ep)
                if 0.0 < t < 1.0:
                    _add_split(sj, ep)
    return nodes


# ----------------------------------------------------------------------
# edge overlay: labelled arrangement
# ----------------------------------------------------------------------


class _Edge:
    __slots__ = (
        "p", "q", "area_cnt", "net_side", "is_line",
        "kind", "int_left", "line_loc", "in_area_result", "in_line_result",
    )

    def __init__(self, p, q):
        self.p = p  # canonical: p < q
        self.q = q
        self.area_cnt = [0, 0]
        self.net_side = [0, 0]  # +1 per piece w/ interior left (canonical)
        self.is_line = [False, False]
        self.kind = [_NOT_PART, _NOT_PART]
        self.int_left = [False, False]
        self.line_loc = [_EXT, _EXT]
        self.in_area_result = False
        self.in_line_result = False

    @property
    def mid(self) -> tuple[float, float]:
        return ((self.p[0] + self.q[0]) / 2.0, (self.p[1] + self.q[1]) / 2.0)


def _build_edges(segs: list[_SrcSeg]):
    """Build the merged labelled edge map plus, per source string, the
    ordered piece walk (used to re-emit result lines with the
    reference's noded-chain granularity)."""
    edges: dict[tuple, _Edge] = {}
    walks: dict[int, list] = defaultdict(list)  # sid -> [(a, b, edge)]
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
            if a == b:
                continue
            lo, hi = (a, b) if a < b else (b, a)
            e = edges.get((lo, hi))
            if e is None:
                e = edges[(lo, hi)] = _Edge(lo, hi)
            if s.is_ring:
                e.area_cnt[s.inp] += 1
                int_left = s.int_left if a == lo else not s.int_left
                e.net_side[s.inp] += 1 if int_left else -1
            else:
                e.is_line[s.inp] = True
            walks[s.sid].append((a, b, e))
    return edges, walks


def _parity_locate(pt, rings_segs: np.ndarray) -> int:
    """Mod-2 ray-crossing location ignoring segments that contain the
    point — resolves the region *surrounding* a collapsed edge (the
    role of the labeller's collapse propagation)."""
    px, py = pt
    if len(rings_segs) == 0:
        return _EXT
    x1, y1, x2, y2 = (
        rings_segs[:, 0], rings_segs[:, 1], rings_segs[:, 2], rings_segs[:, 3]
    )
    straddle = (y1 > py) != (y2 > py)
    idx = np.flatnonzero(straddle)
    cnt = 0
    for i in idx:
        xi = x1[i] + (py - y1[i]) * (x2[i] - x1[i]) / (y2[i] - y1[i])
        if xi > px:
            cnt += 1
    return _INT if cnt % 2 == 1 else _EXT


def _resolve_labels(edges: dict, inputs: list[G.Geom], dims: list[int]) -> None:
    polys = [_poly_parts(g) if dims[i] == 2 else [] for i, g in enumerate(inputs)]
    ring_segs = []
    for i in range(2):
        segs = []
        for p in polys[i]:
            for r in p.data:
                s = np.hstack([r[:-1], r[1:]])
                segs.append(s)
        ring_segs.append(
            np.concatenate(segs) if segs else np.zeros((0, 4))
        )

    # batch the off-edge locates per input
    need_loc: list[list[_Edge]] = [[], []]
    for e in edges.values():
        for i in range(2):
            if e.area_cnt[i] % 2 == 1:
                e.kind[i] = _BOUNDARY
                e.int_left[i] = e.net_side[i] > 0
                e.line_loc[i] = _INT  # OverlayLabel::initBoundary
            elif e.area_cnt[i] > 0:
                e.kind[i] = _COLLAPSE
                e.line_loc[i] = _parity_locate(e.mid, ring_segs[i])
            elif e.is_line[i]:
                e.kind[i] = _LINE
                e.line_loc[i] = _INT
            else:
                e.kind[i] = _NOT_PART
                if dims[i] == 2:
                    need_loc[i].append(e)
                else:
                    e.line_loc[i] = _EXT
    ambiguous: list[list[_Edge]] = [[], []]
    for i in range(2):
        if not need_loc[i]:
            continue
        pts = np.array([e.mid for e in need_loc[i]], dtype=np.float64)
        loc = _locate_in_polys(pts, polys[i])
        for e, lv in zip(need_loc[i], loc):
            if int(lv) == int(BOUNDARY):
                # midpoint reads back ON input i's boundary: the edge
                # hugs coincident linework and cannot be located
                # pointwise — resolve topologically below (provisional
                # INTERIOR kept as the last-resort fallback)
                e.line_loc[i] = _INT
                ambiguous[i].append(e)
            else:
                e.line_loc[i] = _INT if int(lv) != _EXT else _EXT
    for i in range(2):
        if ambiguous[i]:
            _propagate_area_locations(edges, i, ambiguous[i])


def _propagate_area_locations(
    edges: dict, i: int, ambiguous: list[_Edge]
) -> None:
    """Topological fallback for NOT_PART edges whose midpoint reads
    back ON input i's boundary (near-coincident linework) — the role
    of OverlayLabeller::propagateAreaLocations
    (src/operation/overlayng/OverlayLabeller.cpp): walking CCW around
    a node, the i-location flips exactly at i-boundary edge-ends, so
    one confidently-labelled end at a node determines every wedge,
    and each resolved edge seeds its far endpoint in turn."""
    import math
    from collections import deque

    unresolved = {id(e): e for e in ambiguous}
    star: dict = defaultdict(list)
    for e in edges.values():
        dx, dy = e.q[0] - e.p[0], e.q[1] - e.p[1]
        star[e.p].append((math.atan2(dy, dx), e, True))
        star[e.q].append((math.atan2(-dy, -dx), e, False))
    for lst in star.values():
        lst.sort(key=lambda t: t[0])

    def left_is_interior(e: _Edge, away: bool) -> bool:
        # int_left is stored for the canonical p->q direction; the
        # outgoing end at q runs the edge backwards
        return e.int_left[i] if away else (not e.int_left[i])

    queue = deque()
    seen: set = set()
    for e in ambiguous:
        for node in (e.p, e.q):
            if node not in seen:
                seen.add(node)
                queue.append(node)
    while queue:
        node = queue.popleft()
        seen.discard(node)
        ends = star.get(node)
        if not ends:
            continue
        m = len(ends)
        start = -1
        loc = _EXT
        for k, (_ang, e, away) in enumerate(ends):
            if e.kind[i] == _BOUNDARY:
                start = k
                # wedge CCW-after an outgoing ray is its left side
                loc = _INT if left_is_interior(e, away) else _EXT
                break
            if id(e) not in unresolved:
                start = k
                loc = e.line_loc[i]
                break
        if start < 0:
            continue  # fully ambiguous node; revisit when seeded
        for step in range(1, m + 1):
            k = (start + step) % m
            _ang, e, _away = ends[k]
            if e.kind[i] == _BOUNDARY:
                loc = _EXT if loc == _INT else _INT
            elif id(e) in unresolved:
                # non-boundary edge: same location on both sides
                e.line_loc[i] = loc
                del unresolved[id(e)]
                other = e.q if node == e.p else e.p
                if other not in seen:
                    seen.add(other)
                    queue.append(other)
        if not unresolved:
            break


def _side_area_loc(e: _Edge, i: int, left: bool, dims: list[int]) -> int:
    if e.kind[i] == _BOUNDARY:
        return _INT if (left == e.int_left[i]) else _EXT
    if dims[i] == 2:
        return e.line_loc[i]  # NOT_PART / COLLAPSE: same both sides
    return _EXT  # lineal input has no 2-D interior


# ----------------------------------------------------------------------
# edge overlay: polygon extraction
# ----------------------------------------------------------------------


def _quadrant(dx: float, dy: float) -> int:
    """geom::Quadrant::quadrant — CCW from the +x axis."""
    if dx >= 0.0:
        return 0 if dy >= 0.0 else 3
    return 1 if dy >= 0.0 else 2


def _ccw_end_cmp(node):
    """Exact CCW angular comparator for edge-ends at ``node``
    (EdgeEnd::compareDirection: quadrant, then robust orientation) —
    float atan2 comparisons coin-flip on near-parallel ends, which is
    precisely the geometry of robustness-corpus slivers."""
    from geos_spark.kernels.orientation import orientation_index

    nx, ny = node

    def cmp(d1, d2):
        q1 = _quadrant(d1[0] - nx, d1[1] - ny)
        q2 = _quadrant(d2[0] - nx, d2[1] - ny)
        if q1 != q2:
            return -1 if q1 < q2 else 1
        o = int(orientation_index(nx, ny, d1[0], d1[1], d2[0], d2[1]))
        # d2 left of node->d1  =>  d1 is CCW-earlier
        return -o

    return cmp


def _trace_rings(
    directed: list[tuple], strict: bool = True
) -> list[np.ndarray]:
    """Assemble rings from directed result edges (interior on the
    left) with the reference's per-node linking state machine
    (MaximalEdgeRing::linkResultAreaMaxRingAtNode,
    src/operation/overlayng/MaximalEdgeRing.cpp:36-85): sweep the
    node star CW from just after an out-edge, pairing each in-result
    edge with the next out-result edge encountered; convert the
    linked maximal rings to minimal rings by re-pairing at shared
    nodes (MaximalEdgeRing::linkMinimalRings); walk the cycles.
    ``strict`` raises on an unpairable node or unclosed ring (the
    reference's TopologyException) so the overlay robust ladder
    escalates; the buffer path passes ``strict=False`` (it has its
    own degree-balance retry) and malformed walks are dropped."""
    import functools

    # node -> direction point -> [out_idx, in_idx]
    pos: dict = defaultdict(dict)
    for k, (a, b) in enumerate(directed):
        pos[a].setdefault(b, [None, None])[0] = k
        pos[b].setdefault(a, [None, None])[1] = k
    nxt: list = [None] * len(directed)
    sorted_ends: dict = {}
    for node, dd in pos.items():
        # CW star order: an in-result edge links to the out-result
        # edge next CW of it — the wedge between them is the face on
        # the in-edge's left (interior-left result convention)
        ends = sorted(
            dd.items(),
            key=functools.cmp_to_key(
                lambda e1, e2, _c=_ccw_end_cmp(node): _c(e1[0], e2[0])
            ),
        )[::-1]
        sorted_ends[node] = ends
        m = len(ends)
        start = next(
            (i for i, (_dp, oi) in enumerate(ends) if oi[0] is not None),
            None,
        )
        if start is None:
            if strict:
                raise ValueError(
                    "no outgoing result edge at node"
                )  # in-edges present but no outs: malformed
            continue  # lenient: leave these in-edges unlinked
        pending_in = None
        for step in range(1, m + 1):
            i = (start + step) % m
            _dp, (out_k, in_k) = ends[i]
            if pending_in is None:
                if in_k is not None and nxt[in_k] is None:
                    pending_in = in_k
            elif out_k is not None:
                nxt[pending_in] = out_k
                pending_in = None
        if pending_in is not None and strict:
            raise ValueError("no outgoing edge found (unpaired in-edge)")

    # label maximal rings (cycles of the max links)
    ring_of = [-1] * len(directed)
    n_rings = 0
    for k0 in range(len(directed)):
        if ring_of[k0] >= 0:
            continue
        k = k0
        broken = False
        while ring_of[k] < 0:
            ring_of[k] = n_rings
            k = nxt[k]
            if k is None:
                if strict:
                    raise ValueError("ring edge missing (unlinked)")
                broken = True
                break
        if not broken and k != k0 and ring_of[k] != n_rings:
            if strict:
                raise ValueError("max ring merged into another")
            broken = True
        if broken:
            # lenient: poison the walk so its edges emit no rings
            k = k0
            while 0 <= (ring_of[k] if k is not None else -1):
                if ring_of[k] != n_rings:
                    break
                ring_of[k] = -2
                k = nxt[k]
                if k is None:
                    break
        n_rings += 1

    # convert to minimal rings: re-link at every node each ring
    # passes, pairing each ring in-edge with the ring out-edge next
    # CW of it (MaximalEdgeRing::linkMinRingEdgesAtNode — sweep CCW
    # from a ring out-edge, each ring in-edge consumes the pending
    # ring out-edge)
    nxt_min = list(nxt)
    done: set = set()
    for k0 in range(len(directed)):
        rid = ring_of[k0]
        if rid < 0:
            continue  # lenient: poisoned walk
        node = directed[k0][0]  # k0 is an out-edge at its origin
        key = (rid, node)
        if key in done:
            continue
        done.add(key)
        ends = sorted_ends[node]
        m = len(ends)
        start = next(
            i
            for i, (_dp, oi) in enumerate(ends)
            if oi[0] is not None and ring_of[oi[0]] == rid
        )
        pending_out = ends[start][1][0]
        # sweep excludes the start position: it is pre-consumed as the
        # initial pending out (linkMinRingEdgesAtNode: endOut =
        # nodeEdge, loop runs oNext..endOut exclusive)
        for step in range(1, m):
            i = (start + step) % m
            _dp, (out_k, in_k) = ends[i]
            if pending_out is None:
                if out_k is not None and ring_of[out_k] == rid:
                    pending_out = out_k
            elif in_k is not None and ring_of[in_k] == rid:
                nxt_min[in_k] = pending_out
                pending_out = None
        if pending_out is not None and strict:
            raise ValueError("unmatched edge during min-ring linking")

    rings = []
    visited = [False] * len(directed)
    for k0 in range(len(directed)):
        if visited[k0] or ring_of[k0] < 0:
            continue
        ring = [directed[k0][0]]
        k = k0
        closed = True
        while True:
            visited[k] = True
            ring.append(directed[k][1])
            k = nxt_min[k]
            if k is None or (k != k0 and visited[k]):
                if strict:
                    raise ValueError(
                        "ring edge missing or visited twice"
                    )
                closed = False
                break
            if k == k0:
                break
        if closed and ring[0] == ring[-1] and len(ring) >= 4:
            rings.append(np.asarray(ring, dtype=np.float64))
    return rings


def _point_in_ring_parity(pt, ring: np.ndarray) -> bool:
    segs = np.hstack([ring[:-1], ring[1:]])
    return _parity_locate(pt, segs) == _INT


def _assemble_polygons(rings: list[np.ndarray]) -> list[G.Geom]:
    shells = []
    holes = []
    for r in rings:
        a = ring_signed_area(r)
        if a > 0:
            shells.append(r)
        elif a < 0:
            holes.append(r)
    if not shells:
        return []
    shell_area = [abs(ring_signed_area(s)) for s in shells]
    assigned: list[list[np.ndarray]] = [[] for _ in shells]
    # EdgeRing::findEdgeRingContaining semantics (PolygonBuilder):
    # the test point is a hole VERTEX not present in the candidate
    # shell (ptNotInList) — an exact input coordinate, unlike an edge
    # midpoint whose float averaging can land an ulp across a
    # near-coincident shell edge — located with the exact
    # RayCrossingCounter, boundary-inclusive (isInRing)
    shell_polys = [G.Geom(G.POLYGON, [s]) for s in shells]
    shell_sets = [
        {(float(x), float(y)) for x, y in s} for s in shells
    ]
    for h in holes:
        best = -1
        best_area = math.inf
        for si, s in enumerate(shells):
            if shell_area[si] >= best_area:
                continue
            pt = None
            for x, y in h[:-1]:
                if (float(x), float(y)) not in shell_sets[si]:
                    pt = (float(x), float(y))
                    break
            if pt is None:
                continue  # coincident rings: not a hole of this shell
            loc = _locate_in_polys(
                np.array([pt], dtype=np.float64), [shell_polys[si]]
            )[0]
            if int(loc) != int(EXTERIOR):
                best = si
                best_area = shell_area[si]
        if best >= 0:
            assigned[best].append(h)
    return [
        G.Geom(G.POLYGON, [s] + assigned[i]) for i, s in enumerate(shells)
    ]


# ----------------------------------------------------------------------
# edge overlay: line + point extraction
# ----------------------------------------------------------------------


def _is_result_line(e: _Edge, op: int, dims: list[int],
                    has_result_area: bool, area_idx: int) -> bool:
    """LineBuilder::isResultLine (LineBuilder.cpp:67-136), with the
    default flags isAllowCollapseLines = isAllowMixedResult = True
    (STRICT_MODE_DEFAULT = false, OverlayNG.h:173)."""
    kA, kB = e.kind
    # boundary of a single geometry only -> area edge, not a line
    if (kA == _BOUNDARY and kB == _NOT_PART) or (
        kB == _BOUNDARY and kA == _NOT_PART
    ):
        return False
    # collapse interior to its own parent area
    if (kA == _COLLAPSE and e.line_loc[0] == _INT) or (
        kB == _COLLAPSE and e.line_loc[1] == _INT
    ):
        return False
    if op != INTERSECTION:
        # boundary edges only ever appear in results as area
        # boundaries outside INTERSECTION (corpus-verified: union of
        # edge-adjacent polygons has no line for the shared edge)
        if kA == _BOUNDARY or kB == _BOUNDARY:
            return False
        # collapse located in the other geometry's interior
        if (kA == _COLLAPSE and kB == _NOT_PART and e.line_loc[1] == _INT) or (
            kB == _COLLAPSE and kA == _NOT_PART and e.line_loc[0] == _INT
        ):
            return False
        # line edge inside the (single) input area
        if has_result_area and area_idx >= 0:
            li = 1 - area_idx
            if e.kind[li] == _LINE and e.line_loc[area_idx] == _INT:
                return False
    if op == INTERSECTION and kA == _BOUNDARY and kB == _BOUNDARY:
        # boundary touch: areas meet along the edge from opposite sides
        if e.int_left[0] != e.int_left[1]:
            return True
    # effective locations (LineBuilder::effectiveLocation)
    eff = []
    for i in range(2):
        if e.kind[i] in (_COLLAPSE, _LINE):
            eff.append(_INT)
        else:
            eff.append(e.line_loc[i])
    return _is_result_of_op(op, eff[0], eff[1])


def _emit_result_lines(walks: dict, nodes: set) -> list[G.Geom]:
    """Emit one LineString per noded chain (GEOS Edge) marked as a
    result line — the reference's LineBuilder::addResultLines output
    granularity: chains break at node points and string ends, keep
    original interior vertices, and each merged edge is emitted once."""
    emitted: set = set()
    lines = []
    for sid in sorted(walks):
        chain: list = []
        for a, b, e in walks[sid]:
            if not e.in_line_result or id(e) in emitted:
                if len(chain) >= 2:
                    lines.append(chain)
                chain = []
                continue
            if chain and chain[-1] != a:
                if len(chain) >= 2:
                    lines.append(chain)
                chain = []
            if not chain:
                chain = [a]
            chain.append(b)
            emitted.add(id(e))
            if b in nodes:
                lines.append(chain)
                chain = []
        if len(chain) >= 2:
            lines.append(chain)
    return [G.Geom.linestring(np.asarray(c, dtype=np.float64)) for c in lines]


def _result_points(edges: dict, op: int) -> list[G.Geom]:
    """IntersectionPointBuilder (IntersectionPointBuilder.cpp:44-88):
    nodes where both inputs have boundary/line edges and no incident
    edge is already in the result."""
    if op != INTERSECTION:
        return []
    at_node: dict = defaultdict(list)
    for e in edges.values():
        at_node[e.p].append(e)
        at_node[e.q].append(e)
    pts = []
    for node, elist in at_node.items():
        in_a = in_b = False
        blocked = False
        for e in elist:
            if e.in_area_result or e.in_line_result:
                blocked = True
                break
            if e.kind[0] in (_BOUNDARY, _LINE):
                in_a = True
            if e.kind[1] in (_BOUNDARY, _LINE):
                in_b = True
        if not blocked and in_a and in_b:
            pts.append(node)
    return [G.Geom.point(x, y) for x, y in sorted(pts)]


# ----------------------------------------------------------------------
# public entry
# ----------------------------------------------------------------------


def _geom_dim(g: G.Geom) -> int:
    """Typed dimension (Geometry::getDimension): empty POINT is still
    dim 0, empty GEOMETRYCOLLECTION is -1."""
    t = g.type_id
    if t in (G.POINT, G.MULTIPOINT):
        return 0
    if t in (G.LINESTRING, G.MULTILINESTRING):
        return 1
    if t in (G.POLYGON, G.MULTIPOLYGON):
        return 2
    if not g.data:
        return -1
    return max(_geom_dim(p) for p in g.data)


def _flatten_operand(g: G.Geom) -> G.Geom:
    """Reduce a GeometryCollection operand to its effective content:
    strip empty components, flatten nesting, rebuild as the most
    specific homogeneous type (matches the reference's handling of GC
    operands whose non-empty parts share one dimension — the corpus's
    only GC-operand shape)."""
    if g.type_id != G.GEOMETRYCOLLECTION:
        return g
    parts: list[G.Geom] = []

    def rec(x: G.Geom) -> None:
        if x.type_id == G.GEOMETRYCOLLECTION:
            for p in x.data:
                rec(p)
        elif not x.is_empty:
            if x.is_collection:
                parts.extend(x.data)
            else:
                parts.append(x)

    rec(g)
    if not parts:
        return g
    dims = {_geom_dim(p) for p in parts}
    if len(dims) > 1:
        raise ValueError("mixed-dimension GeometryCollection operand")
    if len(parts) == 1:
        return parts[0]
    tid = {0: G.MULTIPOINT, 1: G.MULTILINESTRING, 2: G.MULTIPOLYGON}[
        dims.pop()
    ]
    return G.Geom.collection(tid, parts)


def _collect_strings(g: G.Geom, inp: int):
    """Per-ring / per-line vertex chains with labelling metadata
    (the EdgeNodingBuilder SegmentString granularity)."""
    out = []
    for poly in _poly_parts(g):
        for ri, r in enumerate(poly.data):
            if len(r) < 4:
                continue
            ccw = ring_signed_area(r) > 0
            int_left = ccw != (ri > 0)
            pts = [(float(x), float(y)) for x, y in r]
            out.append((pts, inp, True, int_left))
    for line in _line_parts(g):
        pts = [(float(x), float(y)) for x, y in line]
        out.append((pts, inp, False, False))
    return out


def _edges_from_chains(chains, metas):
    """Accumulate labelled edges + per-string walks from final noded
    chains (shared by the snap-rounding path)."""
    edges: dict[tuple, _Edge] = {}
    walks: dict[int, list] = defaultdict(list)
    ring_pieces: list[list] = [[], []]
    for sid, (chain, (inp, is_ring, int_left)) in enumerate(
        zip(chains, metas)
    ):
        for a, b in zip(chain[:-1], chain[1:]):
            if a == b:
                continue
            lo, hi = (a, b) if a < b else (b, a)
            e = edges.get((lo, hi))
            if e is None:
                e = edges[(lo, hi)] = _Edge(lo, hi)
            if is_ring:
                e.area_cnt[inp] += 1
                il = int_left if a == lo else not int_left
                e.net_side[inp] += 1 if il else -1
                ring_pieces[inp].append([a[0], a[1], b[0], b[1]])
            else:
                e.is_line[inp] = True
            walks[sid].append((a, b, e))
    return edges, walks, ring_pieces


def _parity_locate_vec(pt, segs: np.ndarray) -> int:
    """Mod-2 crossing parity of the snapped arrangement, skipping
    segments that contain the query point (collapsed copies cancel)."""
    if len(segs) == 0:
        return _EXT
    px, py = pt
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    straddle = (y1 > py) != (y2 > py)
    if not straddle.any():
        return _EXT
    i = np.flatnonzero(straddle)
    xi = x1[i] + (py - y1[i]) * (x2[i] - x1[i]) / (y2[i] - y1[i])
    cnt = int(np.count_nonzero(xi > px))
    return _INT if cnt % 2 == 1 else _EXT


def _resolve_labels_arrangement(edges: dict, ring_pieces, dims) -> None:
    """Label resolution against the *snapped* arrangement (fixed
    precision): off-edge and collapse locations use mod-2 parity over
    the noded ring pieces — the role of OverlayLabeller propagation on
    the snapped graph."""
    segs = [
        np.asarray(ring_pieces[i], dtype=np.float64).reshape(-1, 4)
        for i in range(2)
    ]
    for e in edges.values():
        for i in range(2):
            if e.area_cnt[i] % 2 == 1:
                e.kind[i] = _BOUNDARY
                e.int_left[i] = e.net_side[i] > 0
                e.line_loc[i] = _INT
            elif e.area_cnt[i] > 0:
                e.kind[i] = _COLLAPSE
                e.line_loc[i] = _parity_locate_vec(e.mid, segs[i])
            elif e.is_line[i]:
                e.kind[i] = _LINE
                e.line_loc[i] = _INT
            else:
                e.kind[i] = _NOT_PART
                e.line_loc[i] = (
                    _parity_locate_vec(e.mid, segs[i])
                    if dims[i] == 2
                    else _EXT
                )


def overlay(
    a: G.Geom,
    b: G.Geom,
    op: int,
    scale: float | None = None,
    snap_tol: float | None = None,
) -> G.Geom:
    """OverlayNG::overlay; FLOATING precision by default, a FIXED
    PrecisionModel(scale) using the snap-rounding noder, or (middle
    robustness tier) a SnappingNoder with tolerance ``snap_tol``."""
    if a.has_curves or b.has_curves:
        # OverlayNG has no curve support; GEOSIntersection on curved
        # input raises UnsupportedOperationException -> NULL row here
        raise ValueError("overlay: curved geometries unsupported")
    a = _flatten_operand(a)
    b = _flatten_operand(b)
    dim_a = _geom_dim(a)
    dim_b = _geom_dim(b)
    rdim = _result_dimension(op, dim_a, dim_b)

    # empty short-circuits (OverlayUtil::isEmptyResult)
    if op == INTERSECTION and (
        a.is_empty or b.is_empty or _env_disjoint(a, b, scale)
    ):
        return _empty_result(rdim)
    if op == DIFFERENCE and a.is_empty:
        return _empty_result(rdim)
    if op in (UNION, SYMDIFFERENCE) and a.is_empty and b.is_empty:
        return _empty_result(rdim)

    if dim_a == 0 and dim_b == 0:
        return _overlay_points(a, b, op, scale)
    if dim_a == 0 or dim_b == 0:
        return _overlay_mixed_points(a, b, op, rdim, scale)

    inputs = [a, b]
    dims = [dim_a, dim_b]
    if scale is not None:
        from geos_spark.kernels.snapround import snap_round_strings

        strs = _collect_strings(a, 0) + _collect_strings(b, 1)
        chains, nodes = snap_round_strings([s[0] for s in strs], scale)
        edges, walks, ring_pieces = _edges_from_chains(
            chains, [s[1:] for s in strs]
        )
        _resolve_labels_arrangement(edges, ring_pieces, dims)
    else:
        if snap_tol is not None:
            # SnappingNoder phase 1: vertex snapping through one
            # shared index (SnappingNoder::snapVertices) — inputs are
            # rebuilt from the snapped chains before edge collection
            snap = _SnapIndex(snap_tol)
            _seed_snap_index((a, b), snap)
            a = _flatten_operand(_snap_operand(a, snap))
            b = _flatten_operand(_snap_operand(b, snap))
            inputs = [a, b]
        segs_a, sz_a, rf_a, sid = _collect_segments(a, 0, 0)
        segs_b, sz_b, rf_b, _ = _collect_segments(b, 1, sid)
        segs = segs_a + segs_b
        sizes = {**sz_a, **sz_b}
        ringflag = {**rf_a, **rf_b}
        if snap_tol is not None:
            nodes = _node_segments_snapping(segs, sizes, ringflag, snap)
        else:
            nodes = _node_segments(segs, sizes, ringflag)
            _validate_noding(segs)
        edges, walks = _build_edges(segs)
        ring_pieces = [[], []]
        for s in segs:
            if s.is_ring:
                pts = [s.p]
                for _t, pt in sorted(s.splits, key=lambda e: e[0]):
                    if pt not in (s.p, s.q) and pt not in pts:
                        pts.append(pt)
                pts.append(s.q)
                for u, v in zip(pts[:-1], pts[1:]):
                    if u != v:
                        ring_pieces[s.inp].append([u[0], u[1], v[0], v[1]])
        _resolve_labels_arrangement(edges, ring_pieces, dims)

    # --- area stage ---------------------------------------------------
    directed = []
    d_edges = []
    for e in edges.values():
        lA = _side_area_loc(e, 0, True, dims)
        lB = _side_area_loc(e, 1, True, dims)
        rA = _side_area_loc(e, 0, False, dims)
        rB = _side_area_loc(e, 1, False, dims)
        reg_left = _is_result_of_op(op, lA, lB)
        reg_right = _is_result_of_op(op, rA, rB)
        if reg_left != reg_right:
            e.in_area_result = True
            if reg_left:
                directed.append((e.p, e.q))
            else:
                directed.append((e.q, e.p))
            d_edges.append(e)
    if directed:
        # noding-validity check: result boundary must be degree
        # balanced at every node; near-coincident un-merged nodes
        # (robustness failures) break this — raise so the robust
        # ladder retries with snap-rounding (the role of the
        # reference's noding validator + TopologyException)
        deg: dict = defaultdict(int)
        for u, v in directed:
            deg[u] += 1
            deg[v] -= 1
        if any(d != 0 for d in deg.values()):
            raise ValueError("inconsistent noding in overlay result")
    polys = _assemble_polygons(_trace_rings(directed)) if directed else []
    has_result_area = bool(polys)

    # index of the (single) areal input for the line-in-area rule
    area_idx = -1
    if dims[0] == 2 and dims[1] != 2:
        area_idx = 0
    elif dims[1] == 2 and dims[0] != 2:
        area_idx = 1

    # --- line stage ---------------------------------------------------
    any_line = False
    for e in edges.values():
        if e.in_area_result:
            continue
        if _is_result_line(e, op, dims, has_result_area, area_idx):
            e.in_line_result = True
            any_line = True
    lines = _emit_result_lines(walks, nodes) if any_line else []

    # --- point stage --------------------------------------------------
    points = _result_points(edges, op)

    return _build_result(polys, lines, points, rdim)


def intersection(a: G.Geom, b: G.Geom) -> G.Geom:
    return overlay(a, b, INTERSECTION)


def union(a: G.Geom, b: G.Geom) -> G.Geom:
    return overlay(a, b, UNION)


def difference(a: G.Geom, b: G.Geom) -> G.Geom:
    return overlay(a, b, DIFFERENCE)


def sym_difference(a: G.Geom, b: G.Geom) -> G.Geom:
    return overlay(a, b, SYMDIFFERENCE)


def _area_consistent(a, b, op, result, tol) -> bool:
    """OverlayUtil::isResultAreaConsistent (OverlayUtil.cpp:245-276)
    with a configurable relative tolerance (the reference uses 0.1 to
    catch inversions; the robust ladder here also retries on
    sliver-scale inconsistencies)."""
    from geos_spark.kernels.scalars import geom_area

    area_r = geom_area(result)
    area_a = geom_area(a)
    area_b = geom_area(b)
    le = lambda v1, v2: v1 <= v2 * (1 + tol) + 1e-300
    ge = lambda v1, v2: v1 >= v2 * (1 - tol) - 1e-300
    if op == INTERSECTION:
        return le(area_r, area_a) and le(area_r, area_b)
    if op == DIFFERENCE:
        return le(area_r, area_a) and ge(area_r, area_a - area_b)
    if op == SYMDIFFERENCE:
        # lower bound: SD = A + B - 2I and I <= min(A, B), so
        # area(SD) >= |A - B|. A snapping tier that collapses a strip
        # of the larger operand (geos-737) violates this and must fall
        # through to the snap-round tier.
        return le(area_r, area_a + area_b) and ge(
            area_r, abs(area_a - area_b)
        )
    if op == UNION:
        return (
            le(area_a, area_r) and le(area_b, area_r)
            and ge(area_r, area_a - area_b)
        )
    return True


def _snap_self(g: G.Geom, tol: float) -> G.Geom:
    """OverlayNGRobust::snapSelf — clean one input by unioning it with
    an empty operand under the snapping noder. The reference runs this
    with setStrictMode(true) (OverlayNGRobust.cpp:228-244): the result
    must not be mixed-dimension, since it feeds further overlay —
    keep only the input-dimension components (or, if snapping
    collapsed everything, the highest dimension that survived)."""
    other = (
        G.Geom(G.POLYGON, [])
        if _geom_dim(g) == 2
        else G.Geom.empty(G.LINESTRING)
    )
    r = overlay(g, other, UNION, snap_tol=tol)
    if not r.is_collection:
        return r
    parts = [p for p in r.geoms() if not p.is_empty]
    if not parts:
        return r
    target = _geom_dim(g)
    keep = [p for p in parts if p.dimension() == target]
    if not keep:
        maxd = max(p.dimension() for p in parts)
        keep = [p for p in parts if p.dimension() == maxd]
    if len(keep) == len(parts):
        return r
    polys = [p for p in keep if p.type_id == G.POLYGON]
    lines = [p for p in keep if p.type_id == G.LINESTRING]
    pts = [p for p in keep if p.type_id == G.POINT]
    return _build_result(polys, lines, pts, keep[0].dimension())


def _ordinate_magnitude(g: G.Geom) -> float:
    import math as _math

    if g is None or g.is_empty:
        return 0.0
    x0, y0, x1, y1 = g.envelope()
    vals = [abs(v) for v in (x0, y0, x1, y1) if not _math.isnan(v)]
    return max(vals) if vals else 0.0


def overlay_robust(a: G.Geom, b: G.Geom, op: int) -> G.Geom:
    """OverlayNGRobust::Overlay (OverlayNGRobust.cpp:100-295): float
    noding first (validated with the noding degree check + area
    consistency heuristic); on failure, SnappingNoder tries at
    tol = magnitude/1e12 escalating x10 (NUM_SNAP_TRIES=5, each try
    also attempting per-input snapSelf cleaning); finally snap-round
    at the heuristic safe scale (PrecisionUtil tier)."""
    import math as _math

    def ok(res: G.Geom) -> bool:
        return (
            _geom_dim(a) != 2
            or _geom_dim(b) != 2
            or _area_consistent(a, b, op, res, 1e-9)
        )

    res = None
    try:
        res = overlay(a, b, op)
        if ok(res):
            return res
    except Exception:
        pass

    # middle tier: snapping noder (OverlayNGRobust::overlaySnapTries)
    snap_tol = (
        max(_ordinate_magnitude(a), _ordinate_magnitude(b)) / 1e12
    )
    if snap_tol > 0:
        for _ in range(5):
            try:
                r = overlay(a, b, op, snap_tol=snap_tol)
                if ok(r):
                    return r
            except Exception:
                pass
            try:
                r = overlay(
                    _snap_self(a, snap_tol),
                    _snap_self(b, snap_tol),
                    op,
                    snap_tol=snap_tol,
                )
                if ok(r):
                    return r
            except Exception:
                pass
            snap_tol *= 10.0

    # final tier: snap-rounding at the heuristic safe scale
    max_mag = max(
        1.0, _ordinate_magnitude(a), _ordinate_magnitude(b)
    )
    scale = 10.0 ** (12 - int(_math.ceil(_math.log10(max_mag))))
    try:
        return overlay(a, b, op, scale)
    except Exception:
        if res is not None:
            return res
        raise
