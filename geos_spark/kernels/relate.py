"""DE-9IM intersection-matrix computation (RelateNG semantics).

Computes the full 9-cell matrix for pairs of simple non-curved
geometries across all dimension combinations (P/P, P/L, P/A, L/L,
L/A, A/A, incl. multi-part and empty inputs).

Semantics re-derived from the reference:
- matrix cells / pattern language: ``src/geom/IntersectionMatrix.cpp``
  (pattern chars T/F/0/1/2/* at :89-105)
- predicate definitions over the matrix: ``IntersectionMatrix.cpp``
  :200-352
- OGC Mod-2 boundary rule for lines
  (``include/geos/algorithm/BoundaryNodeRule.h:52-129``)
- evaluation strategy: point location + mutual segment arrangement
  (the same topology facts RelateNG derives from its NodeSections,
  ``src/operation/relateng/RelateNG.cpp:318-366``), computed here by
  splitting each geometry's linework at every intersection with the
  other's and classifying the resulting pieces and nodes.

This is the *general/oracle* path (small geometries, python objects).
The distributed join path uses specialized vectorized kernels and only
falls back to this for exotic type pairs.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.pip import (
    BOUNDARY,
    EXTERIOR,
    INTERIOR,
    PolygonPack,
    locate_points,
)
from geos_spark.kernels.scalars import ring_signed_area
from geos_spark.kernels.segments import (
    COLLINEAR_INTERSECTION,
    POINT_INTERSECTION,
    intersect_pairs,
)

F_DIM = -1  # matrix "F"

_EPS_KEY = 1e-9


def _key(x: float, y: float) -> tuple[int, int]:
    return (round(x / _EPS_KEY), round(y / _EPS_KEY))


# ----------------------------------------------------------------------
# geometry decomposition helpers
# ----------------------------------------------------------------------


def _line_parts(g: G.Geom) -> list[np.ndarray]:
    return [
        p.data
        for p in g.geoms()
        if p.type_id == G.LINESTRING and len(p.data) > 1
    ]


def _point_parts(g: G.Geom) -> np.ndarray:
    pts = [p.data for p in g.geoms() if p.type_id == G.POINT and len(p.data)]
    return np.concatenate(pts) if pts else np.zeros((0, 2))


def _poly_parts(g: G.Geom) -> list[G.Geom]:
    return [p for p in g.geoms() if p.type_id == G.POLYGON and p.data]


def _segments_of_lines(lines: list[np.ndarray]):
    """-> (segs (n,4), seg_line (n,)) from line coord arrays."""
    segs = []
    owner = []
    for li, c in enumerate(lines):
        s = np.hstack([c[:-1], c[1:]])
        keep = ~((s[:, 0] == s[:, 2]) & (s[:, 1] == s[:, 3]))
        segs.append(s[keep])
        owner.extend([li] * int(keep.sum()))
    if not segs:
        return np.zeros((0, 4)), np.zeros(0, dtype=int)
    return np.concatenate(segs), np.asarray(owner, dtype=int)


def _rings_of_polys(polys: list[G.Geom]):
    """-> list of (ring coords, poly_idx, is_hole, is_ccw)."""
    out = []
    for pi, p in enumerate(polys):
        for ri, r in enumerate(p.data):
            out.append((r, pi, ri > 0, ring_signed_area(r) > 0))
    return out


def _segments_of_rings(rings):
    segs = []
    meta = []  # (ring_idx)
    for qi, (r, _pi, _hole, _ccw) in enumerate(rings):
        s = np.hstack([r[:-1], r[1:]])
        keep = ~((s[:, 0] == s[:, 2]) & (s[:, 1] == s[:, 3]))
        s = s[keep]
        segs.append(s)
        meta.extend([qi] * len(s))
    if not segs:
        return np.zeros((0, 4)), np.zeros(0, dtype=int)
    return np.concatenate(segs), np.asarray(meta, dtype=int)


# Boundary node rules (include/geos/algorithm/BoundaryNodeRule.h:52-129;
# numbering matches the CAPI GEOSRelateBoundaryNodeRules enum,
# capi/geos_c.h.in). The rule decides which line endpoints are boundary
# from their valence (number of incident line-ends); everything else in
# the relate algebra is unchanged.
BNR_MOD2 = 1  # OGC SFS: odd valence (the default)
BNR_ENDPOINT = 2  # any endpoint
BNR_MULTIVALENT = 3  # valence > 1 (closed rings included)
BNR_MONOVALENT = 4  # valence == 1

# active rule for the current relate() call tree; kernels run
# single-threaded per python worker, so a module scalar (set/reset in
# relate()/relate_pattern() with try/finally) is race-free
_BNR = BNR_MOD2


def _in_boundary(valence: int) -> bool:
    if _BNR == BNR_MOD2:
        return valence % 2 == 1
    if _BNR == BNR_ENDPOINT:
        return valence > 0
    if _BNR == BNR_MULTIVALENT:
        return valence > 1
    return valence == 1  # BNR_MONOVALENT


def _line_boundary_points(lines: list[np.ndarray]) -> np.ndarray:
    """Endpoints whose valence the active boundary node rule puts in
    the boundary (Mod-2 / odd valence by default)."""
    cnt: Counter = Counter()
    pts: dict[tuple, tuple[float, float]] = {}
    for c in lines:
        for p in (c[0], c[-1]):
            k = _key(p[0], p[1])
            cnt[k] += 1
            pts[k] = (float(p[0]), float(p[1]))
    b = [pts[k] for k, n in cnt.items() if _in_boundary(n)]
    return np.asarray(b, dtype=np.float64).reshape(-1, 2)


def _locate_in_polys(pts: np.ndarray, polys: list[G.Geom]) -> np.ndarray:
    """Locate points vs a polygonal geometry (min over parts)."""
    if len(pts) == 0:
        return np.zeros(0, dtype=np.uint8)
    if not polys:
        return np.full(len(pts), EXTERIOR, dtype=np.uint8)
    pack = PolygonPack.from_rings([p.data for p in polys])
    n, m = len(pts), len(polys)
    loc = locate_points(
        pts,
        pack,
        np.repeat(np.arange(n), m),
        np.tile(np.arange(m), n),
    ).reshape(n, m)
    return loc.min(axis=1).astype(np.uint8)


def _edge_adjacent_interior(p: np.ndarray, polys: list[G.Geom]) -> bool:
    """True if ``p`` lies strictly inside boundary edges of >= 2 rings
    whose polygon-interior sides together cover BOTH sides of the
    common line (and ``p`` is not a ring vertex — that is the angular
    case, conservatively left as boundary).

    The mod-2 edge-absorption rule for 1-dim boundary pieces doubled
    across elements of an (invalid) element-adjacent MultiPolygon:
    the reference labels those pieces interior while keeping 0-dim
    NODE contacts on the same edge as boundary
    (misc/InvalidRelates.xml:2 encodes exactly that asymmetry), so
    this refinement is applied only to piece midpoints in the
    line/area and area/area walks, never to point or line-endpoint
    location."""
    from geos_spark.kernels.orientation import orientation_index
    from geos_spark.kernels.scalars import ring_signed_area

    px, py = float(p[0]), float(p[1])
    left = right = False
    for part in polys:
        for ri, ring in enumerate(part.data):
            v = ring
            # vertex hit -> angular-sector case, bail conservative
            if ((v[:, 0] == px) & (v[:, 1] == py)).any():
                return False
            is_shell = ri == 0
            ccw = ring_signed_area(v) > 0
            interior_left = is_shell == ccw
            for k in range(len(v) - 1):
                x0, y0 = v[k]
                x1, y1 = v[k + 1]
                if x0 == x1 and y0 == y1:
                    continue
                o = orientation_index(x0, y0, x1, y1, px, py)
                if o != 0:
                    continue
                # collinear: strictly between endpoints?
                dot = (px - x0) * (x1 - x0) + (py - y0) * (y1 - y0)
                ln2 = (x1 - x0) ** 2 + (y1 - y0) ** 2
                if not (0.0 < dot < ln2):
                    continue
                # canonical line direction so sides from opposite-
                # direction edges compare consistently
                flipped = (x1, y1) < (x0, y0)
                if interior_left != flipped:
                    left = True
                else:
                    right = True
                if left and right:
                    return True
    return False


def _locate_on_lines(pts: np.ndarray, lines: list[np.ndarray]) -> np.ndarray:
    """Locate points vs a lineal geometry: INTERIOR if on a segment
    (and not a mod2-boundary node), BOUNDARY at mod2 endpoints,
    EXTERIOR otherwise."""
    n = len(pts)
    out = np.full(n, EXTERIOR, dtype=np.uint8)
    if n == 0:
        return out
    segs, _ = _segments_of_lines(lines)
    if len(segs):
        for i in range(n):
            if _point_on_any_segment(pts[i], segs):
                out[i] = INTERIOR
    bpts = _line_boundary_points(lines)
    if len(bpts):
        bkeys = {_key(x, y) for x, y in bpts}
        for i in range(n):
            if _key(pts[i, 0], pts[i, 1]) in bkeys:
                out[i] = BOUNDARY
    return out


def _point_on_any_segment(
    p: np.ndarray, segs: np.ndarray, eps: float = 0.0
) -> bool:
    """Exact (eps=0) or tolerant point-on-linework test.

    The tolerant form is used only for points *derived from the
    arrangement itself* (piece midpoints, crossing nodes), whose true
    location is exactly-on but whose float coordinates sit within an
    ulp of the line.
    """
    x, y = p[0], p[1]
    if eps > 0.0:
        from geos_spark.kernels.scalars import _seg_point_dist2

        # tolerance scaled to the POINT's own magnitude (ulp-scale of
        # the arrangement arithmetic) — a global-extent scale would
        # swallow slivers thinner than the largest coordinate * 1e-9
        eps_local = eps * max(1.0, abs(x), abs(y))
        d2 = _seg_point_dist2(
            segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3], x, y
        )
        return bool((d2 <= eps_local * eps_local).any())
    inx = (np.minimum(segs[:, 0], segs[:, 2]) <= x) & (
        x <= np.maximum(segs[:, 0], segs[:, 2])
    )
    iny = (np.minimum(segs[:, 1], segs[:, 3]) <= y) & (
        y <= np.maximum(segs[:, 1], segs[:, 3])
    )
    cand = np.flatnonzero(inx & iny)
    if len(cand) == 0:
        return False
    from geos_spark.kernels.orientation import orientation_index

    s = segs[cand]
    o = orientation_index(s[:, 0], s[:, 1], s[:, 2], s[:, 3], x, y)
    return bool((o == 0).any())


def _arr_eps(*seg_arrays) -> float:
    """Relative snap tolerance for arrangement-derived points (scaled
    per-point inside _point_on_any_segment). Intersection points carry
    only a few ulp of error (~1e-16 relative), so 1e-13 keeps true
    on-boundary midpoints snapping while leaving even extreme slivers
    (TestRelateAA-big) distinct."""
    return 1e-13


# ----------------------------------------------------------------------
# mutual segment arrangement: split each side's segments at all
# intersections with the other side, producing classified "pieces"
# ----------------------------------------------------------------------


def _split_params(segs_a: np.ndarray, segs_b: np.ndarray):
    """For each segment of a: sorted split parameters t in (0,1) from
    intersections with segs_b. Returns (params, nodes, coverage):
    coverage[i] is the list of (t0, t1) param intervals of a-seg i
    covered by collinear overlap with some b-segment — the *structural*
    on-boundary tag (no distance snapping, robust at any coordinate
    magnitude)."""
    na, nb = len(segs_a), len(segs_b)
    params: list[list[float]] = [[] for _ in range(na)]
    coverage: list[list[tuple[float, float]]] = [[] for _ in range(na)]
    nodes: list[tuple[float, float]] = []
    if na == 0 or nb == 0:
        return params, nodes, coverage
    ia = np.repeat(np.arange(na), nb)
    ib = np.tile(np.arange(nb), na)
    cls = intersect_pairs(segs_a[ia], segs_b[ib])
    hit = cls != 0
    for k in np.flatnonzero(hit):
        i, j = int(ia[k]), int(ib[k])
        A = segs_a[i]
        Bs = segs_b[j]
        if cls[k] == POINT_INTERSECTION:
            pt = _seg_seg_point(A, Bs)
            if pt is not None:
                t = _param_on_seg(A, pt)
                if 0.0 < t < 1.0:
                    params[i].append(t)
                nodes.append((pt[0], pt[1]))
        elif cls[k] == COLLINEAR_INTERSECTION:
            # project b endpoints onto a
            ts = []
            for q in (Bs[:2], Bs[2:]):
                t = _param_on_seg(A, q)
                ts.append(t)
                if 0.0 < t < 1.0:
                    params[i].append(t)
                if 0.0 <= t <= 1.0:
                    nodes.append((float(q[0]), float(q[1])))
            t0, t1 = sorted(ts)
            lo, hi = max(t0, 0.0), min(t1, 1.0)
            if hi > lo:
                coverage[i].append((lo, hi))
            for q in (A[:2], A[2:]):
                tb = _param_on_seg(Bs, q)
                if 0.0 <= tb <= 1.0:
                    nodes.append((float(q[0]), float(q[1])))
    return params, nodes, coverage


def _seg_seg_point(A: np.ndarray, B: np.ndarray):
    x1, y1, x2, y2 = A
    x3, y3, x4, y4 = B
    denom = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
    if denom == 0:
        # touching collinear-endpoint case: shared endpoint
        for p in ((x1, y1), (x2, y2)):
            if (p == (x3, y3)) or (p == (x4, y4)):
                return np.array(p)
        # collinear single-point overlap handled via COLLINEAR class
        return None
    t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / denom
    p = np.array([x1 + t * (x2 - x1), y1 + t * (y2 - y1)])
    # snap to endpoints when coincident (reference endpoint snapping)
    for q in ((x1, y1), (x2, y2), (x3, y3), (x4, y4)):
        if abs(p[0] - q[0]) < 1e-12 and abs(p[1] - q[1]) < 1e-12:
            return np.array(q, dtype=np.float64)
    return p


def _param_on_seg(A: np.ndarray, p) -> float:
    dx = A[2] - A[0]
    dy = A[3] - A[1]
    if abs(dx) >= abs(dy):
        return float((p[0] - A[0]) / dx) if dx != 0 else 0.0
    return float((p[1] - A[1]) / dy)


def _pieces(segs: np.ndarray, params: list[list[float]]) -> np.ndarray:
    """Split segments at params -> piece array (m,4)."""
    if len(segs) == 0:
        return np.zeros((0, 4))
    out = []
    for i, seg in enumerate(segs):
        ts = sorted({0.0, 1.0, *[t for t in params[i]]})
        p0 = np.array([seg[0], seg[1]])
        d = np.array([seg[2] - seg[0], seg[3] - seg[1]])
        for a, b in zip(ts[:-1], ts[1:]):
            pa = p0 + a * d
            pb = p0 + b * d
            if not np.array_equal(pa, pb):
                out.append([pa[0], pa[1], pb[0], pb[1]])
    return np.asarray(out, dtype=np.float64).reshape(-1, 4)


def _midpoints(pieces: np.ndarray) -> np.ndarray:
    return np.column_stack(
        [(pieces[:, 0] + pieces[:, 2]) / 2.0, (pieces[:, 1] + pieces[:, 3]) / 2.0]
    )


# ----------------------------------------------------------------------
# IntersectionMatrix assembly
# ----------------------------------------------------------------------


class IM:
    def __init__(self):
        self.m = [[F_DIM] * 3 for _ in range(3)]

    def set(self, i: int, j: int, dim: int) -> None:
        if dim > self.m[i][j]:
            self.m[i][j] = dim

    def __str__(self) -> str:
        return "".join(
            "F" if v < 0 else str(v) for row in self.m for v in row
        )


I, B, E = 0, 1, 2


def _collapse_degenerate_lines(g: G.Geom) -> G.Geom:
    """Zero-length linestrings relate as points (their interior is the
    single coordinate, their Mod-2 boundary is empty) — matches the
    reference for e.g. LINESTRING(p, p)."""
    if g.type_id == G.LINESTRING and len(g.data) >= 2:
        if (g.data == g.data[0]).all():
            return G.Geom(G.POINT, g.data[:1])
        return g
    if g.is_collection:
        return G.Geom(
            g.type_id, [_collapse_degenerate_lines(p) for p in g.data]
        )
    return g


def _dim_classes(g: G.Geom) -> dict:
    """Dimension classes of a GC operand (RelateNG GeometryCollection
    semantics: a GC relates as the union of its elements, located with
    areal > lineal > puntal precedence —
    src/operation/relateng/RelatePointLocator.cpp:195-214). The areal
    and puntal classes are dissolved (overlapping polygons union,
    covered points drop); the lineal class keeps the ORIGINAL
    linestrings, because the Mod-2 boundary rule applies to the
    original element endpoints, not to dissolved chains. Returns
    {2: areal, 1: lineal, 0: puntal} with empty classes absent."""
    pls = [p for p in g.geoms() if p.type_id == G.POLYGON and p.data]
    lns = [
        p for p in g.geoms() if p.type_id == G.LINESTRING and len(p.data)
    ]
    pts = [p for p in g.geoms() if p.type_id == G.POINT and len(p.data)]
    if g.type_id == G.GEOMETRYCOLLECTION:
        from geos_spark.kernels.union import (
            cascaded_polygon_union,
            union_points,
        )

        if len(pls) > 1:
            u = cascaded_polygon_union(pls)
            pls = [p for p in u.geoms() if p.type_id == G.POLYGON and p.data]
        if pts:
            up = union_points(G.Geom(G.MULTIPOINT, pts))
            cov = _point_parts(up)
            keep = np.ones(len(cov), dtype=bool)
            if pls:
                keep &= _locate_in_polys(cov, pls) == EXTERIOR
            if lns:
                keep &= (
                    _locate_on_lines(cov, [ln.data for ln in lns])
                    == EXTERIOR
                )
            pts = [
                G.Geom.point(float(x), float(y))
                for (x, y), k in zip(cov, keep)
                if k
            ]
    out = {}
    if pls:
        out[2] = pls[0] if len(pls) == 1 else G.Geom.collection(
            G.MULTIPOLYGON, pls
        )
    if lns:
        out[1] = lns[0] if len(lns) == 1 else G.Geom.collection(
            G.MULTILINESTRING, lns
        )
    if pts:
        out[0] = pts[0] if len(pts) == 1 else G.Geom.collection(
            G.MULTIPOINT, pts
        )
    return out


def _ext_cells(im: IM, ca: dict, cb: dict, transposed: bool) -> None:
    """Fill the I/B-row x E-column cells for union-normalized mixed
    classes: dim of (region of A) outside the closure of B. The union
    normalization guarantees classes are mutually dissolved, so the
    union's interior/boundary decompose class-wise."""
    from geos_spark.kernels import overlay as OV
    from geos_spark.kernels.scalars import geom_area, geom_boundary, geom_length

    def setcell(r: int, d: int) -> None:
        if transposed:
            im.set(E, r, d)
        else:
            im.set(r, E, d)

    def line_outside(line_g: G.Geom) -> float:
        rem = line_g
        if 2 in cb:
            rem = OV.overlay_robust(rem, cb[2], OV.DIFFERENCE)
        if not rem.is_empty and 1 in cb:
            rem = OV.overlay_robust(rem, cb[1], OV.DIFFERENCE)
        return 0.0 if rem.is_empty else geom_length(rem)

    def pts_outside(pts_g: G.Geom) -> bool:
        pts = _point_parts(pts_g)
        if not len(pts):
            return False
        outside = np.ones(len(pts), dtype=bool)
        if 2 in cb:
            outside &= (
                _locate_in_polys(pts, _poly_parts(cb[2])) == EXTERIOR
            )
        if 1 in cb:
            outside &= (
                _locate_on_lines(pts, _line_parts(cb[1])) == EXTERIOR
            )
        if 0 in cb:
            bset = {_key(x, y) for x, y in _point_parts(cb[0])}
            outside &= np.array(
                [_key(x, y) not in bset for x, y in pts]
            )
        return bool(outside.any())

    # interior row
    if 2 in ca:
        rem_area = (
            geom_area(OV.overlay_robust(ca[2], cb[2], OV.DIFFERENCE))
            if 2 in cb
            else geom_area(ca[2])
        )
        if rem_area > 0.0:
            setcell(I, 2)
    if 1 in ca and line_outside(ca[1]) > 0.0:
        setcell(I, 1)
    if 0 in ca and pts_outside(ca[0]):
        setcell(I, 0)
    # boundary row
    if 2 in ca and line_outside(geom_boundary(ca[2])) > 0.0:
        setcell(B, 1)
    if 1 in ca:
        bpts = _line_boundary_points(_line_parts(ca[1]))
        if len(bpts):
            bp = G.Geom(
                G.MULTIPOINT, [G.Geom.point(x, y) for x, y in bpts]
            )
            if pts_outside(bp):
                setcell(B, 0)


def _mask_lines_by_own_area(c: dict) -> dict:
    """Areal > lineal precedence within one operand: line parts inside
    the closure of the operand's own polygons take the polygon's
    location (RelatePointLocator precedence), so the effective lineal
    class is the difference. Clip endpoints land on the polygon
    boundary, where their contribution coincides with the areal
    boundary's — Mod-2 parity of surviving original endpoints is
    unchanged."""
    if 1 not in c or 2 not in c:
        return c
    from geos_spark.kernels import overlay as OV

    rem = OV.overlay_robust(c[1], c[2], OV.DIFFERENCE)
    lns = [
        p for p in rem.geoms() if p.type_id == G.LINESTRING and len(p.data)
    ]
    out = dict(c)
    if lns:
        out[1] = lns[0] if len(lns) == 1 else G.Geom.collection(
            G.MULTILINESTRING, lns
        )
    else:
        del out[1]
    return out


def _relate_mixed(ca: dict, cb: dict) -> str:
    """DE-9IM for mixed-dimension (GC) operands via class
    decomposition: I/B x I/B cells are the element-wise max over the
    pairwise class IMs (regions of the dissolved union decompose
    class-wise); exterior cells are computed against the union of the
    other side's closure."""
    ca = _mask_lines_by_own_area(ca)
    cb = _mask_lines_by_own_area(cb)
    im = IM()
    im.set(E, E, 2)
    for ga in ca.values():
        for gb in cb.values():
            s = relate(ga, gb)
            for i in (I, B):
                for j in (I, B):
                    d = s[i * 3 + j]
                    if d != "F":
                        im.set(i, j, int(d))
    _ext_cells(im, ca, cb, transposed=False)
    _ext_cells(im, cb, ca, transposed=True)
    return str(im)


def relate(a: G.Geom, b: G.Geom, bnr: int | None = None) -> str:
    """Full DE-9IM matrix string for (a, b).

    ``bnr`` selects the boundary node rule (``BNR_MOD2`` default,
    ``BNR_ENDPOINT`` / ``BNR_MULTIVALENT`` / ``BNR_MONOVALENT`` —
    RelateNG::relate(g1, g2, bnRule) semantics). ``None`` inherits the
    caller's active rule, so internal recursion (GC class
    decomposition) stays under the rule of the public call."""
    if a.type_id in G.CURVED_TYPES or b.type_id in G.CURVED_TYPES:
        # RelateNG rejects curved operands
        # (src/operation/relateng/RelateNG.cpp:325-326); the engine
        # contract surfaces this as a per-row NULL
        raise ValueError("relate: curved geometries unsupported")
    global _BNR
    if bnr is not None and bnr != _BNR:
        prev = _BNR
        _BNR = bnr
        try:
            return relate(a, b)
        finally:
            _BNR = prev
    a = _collapse_degenerate_lines(a)
    b = _collapse_degenerate_lines(b)

    # GeometryCollection operands: union semantics (RelateNG)
    if (
        a.type_id == G.GEOMETRYCOLLECTION
        or b.type_id == G.GEOMETRYCOLLECTION
    ) and not (a.is_empty or b.is_empty):
        ca = _dim_classes(a)
        cb = _dim_classes(b)
        if len(ca) > 1 or len(cb) > 1:
            return _relate_mixed(ca, cb)
        if len(ca) == 1 and len(cb) == 1:
            return relate(next(iter(ca.values())), next(iter(cb.values())))

    im = IM()
    dim_a = a.dimension()
    dim_b = b.dimension()
    # EE is always 2 (geometries are bounded)
    im.set(E, E, 2)

    if a.is_empty and b.is_empty:
        return str(im)
    if a.is_empty:
        _empty_vs(im, b, transposed=True)
        return str(im)
    if b.is_empty:
        _empty_vs(im, a, transposed=False)
        return str(im)

    if dim_a == 0 and dim_b == 0:
        _relate_pp(im, a, b)
    elif dim_a == 0 and dim_b == 1:
        _relate_pl(im, a, b, False)
    elif dim_a == 1 and dim_b == 0:
        _relate_pl(im, b, a, True)
    elif dim_a == 0 and dim_b == 2:
        _relate_pa(im, a, b, False)
    elif dim_a == 2 and dim_b == 0:
        _relate_pa(im, b, a, True)
    elif dim_a == 1 and dim_b == 1:
        _relate_ll(im, a, b)
    elif dim_a == 1 and dim_b == 2:
        _relate_la(im, a, b, False)
    elif dim_a == 2 and dim_b == 1:
        _relate_la(im, b, a, True)
    else:
        _relate_aa(im, a, b)
    return str(im)


def _empty_vs(im: IM, g: G.Geom, transposed: bool) -> None:
    """Non-empty g against an empty operand: only g's exterior row/col."""
    d = g.dimension()
    bd = _boundary_dim(g)
    if transposed:
        im.set(E, I, d)
        if bd >= 0:
            im.set(E, B, bd)
    else:
        im.set(I, E, d)
        if bd >= 0:
            im.set(B, E, bd)


def _boundary_dim(g: G.Geom) -> int:
    d = g.dimension()
    if d == 0:
        return F_DIM
    if d == 1:
        return 0 if len(_line_boundary_points(_line_parts(g))) else F_DIM
    return 1


def _set_transposed(im: IM, i: int, j: int, dim: int, t: bool) -> None:
    if t:
        im.set(j, i, dim)
    else:
        im.set(i, j, dim)


def _relate_pp(im: IM, a: G.Geom, b: G.Geom) -> None:
    pa = _point_parts(a)
    pb = _point_parts(b)
    ka = {_key(x, y) for x, y in pa}
    kb = {_key(x, y) for x, y in pb}
    if ka & kb:
        im.set(I, I, 0)
    if ka - kb:
        im.set(I, E, 0)
    if kb - ka:
        im.set(E, I, 0)


def _relate_pl(im: IM, pts_g: G.Geom, line_g: G.Geom, t: bool) -> None:
    pts = _point_parts(pts_g)
    lines = _line_parts(line_g)
    loc = _locate_on_lines(pts, lines)
    if (loc == INTERIOR).any():
        _set_transposed(im, I, I, 0, t)
    if (loc == BOUNDARY).any():
        _set_transposed(im, I, B, 0, t)
    if (loc == EXTERIOR).any():
        _set_transposed(im, I, E, 0, t)
    # line interior always extends beyond the finite point set
    _set_transposed(im, E, I, 1, t)
    bpts = _line_boundary_points(lines)
    if len(bpts):
        pkeys = {_key(x, y) for x, y in pts}
        uncovered = any(_key(x, y) not in pkeys for x, y in bpts)
        if uncovered:
            _set_transposed(im, E, B, 0, t)


def _relate_pa(im: IM, pts_g: G.Geom, poly_g: G.Geom, t: bool) -> None:
    pts = _point_parts(pts_g)
    polys = _poly_parts(poly_g)
    loc = _locate_in_polys(pts, polys)
    if (loc == INTERIOR).any():
        _set_transposed(im, I, I, 0, t)
    if (loc == BOUNDARY).any():
        _set_transposed(im, I, B, 0, t)
    if (loc == EXTERIOR).any():
        _set_transposed(im, I, E, 0, t)
    _set_transposed(im, E, I, 2, t)
    _set_transposed(im, E, B, 1, t)


def _relate_ll(im: IM, a: G.Geom, b: G.Geom) -> None:
    la = _line_parts(a)
    lb = _line_parts(b)
    sa, _ = _segments_of_lines(la)
    sb, _ = _segments_of_lines(lb)
    params_a, nodes, cov_a = _split_params(sa, sb)
    params_b, _, cov_b = _split_params(sb, sa)
    pieces_a, own_a, tr_a = _pieces_with_owner(sa, params_a)
    pieces_b, own_b, tr_b = _pieces_with_owner(sb, params_b)
    ba = _line_boundary_points(la)
    bb = _line_boundary_points(lb)
    ba_keys = {_key(x, y) for x, y in ba}
    bb_keys = {_key(x, y) for x, y in bb}

    # pieces on the other line = structurally covered by collinear
    # overlap (exact at any coordinate magnitude)
    on_b = _piece_covered(own_a, tr_a, cov_a)
    on_a = _piece_covered(own_b, tr_b, cov_b)
    if on_b.any():
        im.set(I, I, 1)  # collinear overlap
    if (~on_b).any():
        im.set(I, E, 1)
    if (~on_a).any():
        im.set(E, I, 1)

    # node classification for 0-dim entries: every node lies on both
    # geometries by construction, so location is boundary-vs-interior
    for nx, ny in nodes:
        k = _key(nx, ny)
        loc_a = BOUNDARY if k in ba_keys else INTERIOR
        loc_b = BOUNDARY if k in bb_keys else INTERIOR
        if loc_a == INTERIOR and loc_b == INTERIOR:
            im.set(I, I, 0)
        if loc_a == INTERIOR and loc_b == BOUNDARY:
            im.set(I, B, 0)
        if loc_a == BOUNDARY and loc_b == INTERIOR:
            im.set(B, I, 0)
        if loc_a == BOUNDARY and loc_b == BOUNDARY:
            im.set(B, B, 0)
    # boundary points vs the other line as a whole
    if len(ba):
        loc = _locate_on_lines(ba, lb)
        if (loc == INTERIOR).any():
            im.set(B, I, 0)
        if (loc == BOUNDARY).any():
            im.set(B, B, 0)
        if (loc == EXTERIOR).any():
            im.set(B, E, 0)
    if len(bb):
        loc = _locate_on_lines(bb, la)
        if (loc == INTERIOR).any():
            im.set(I, B, 0)
        if (loc == BOUNDARY).any():
            im.set(B, B, 0)
        if (loc == EXTERIOR).any():
            im.set(E, B, 0)


def _relate_la(im: IM, line_g: G.Geom, poly_g: G.Geom, t: bool) -> None:
    lines = _line_parts(line_g)
    polys = _poly_parts(poly_g)
    sa, _ = _segments_of_lines(lines)
    rings = _rings_of_polys(polys)
    sb, _ = _segments_of_rings(rings)
    params_a, nodes, cov_a = _split_params(sa, sb)
    pieces_a, own_a, tr_a = _pieces_with_owner(sa, params_a)
    mids_a = _midpoints(pieces_a)
    loc_mid = _locate_in_polys(mids_a, polys)
    # pieces collinear-covered by the boundary are ON it (structural)
    # — unless incident element edges cover both sides, in which case
    # the areal UNION's interior absorbs the doubled edge (RelateNG
    # AdjacentEdgeLocator; arises for element-adjacent MultiPolygons)
    covered_a = _piece_covered(own_a, tr_a, cov_a)
    for _i in np.nonzero(covered_a)[0]:
        loc_mid[_i] = (
            INTERIOR
            if _edge_adjacent_interior(mids_a[_i], polys)
            else BOUNDARY
        )

    if (loc_mid == INTERIOR).any():
        _set_transposed(im, I, I, 1, t)
    if (loc_mid == BOUNDARY).any():
        _set_transposed(im, I, B, 1, t)
    if (loc_mid == EXTERIOR).any():
        _set_transposed(im, I, E, 1, t)

    ba = _line_boundary_points(lines)
    ba_keys = {_key(x, y) for x, y in ba}
    # 0-dim contacts of line interior with ring (crossing/touch points)
    for nx, ny in nodes:
        if _key(nx, ny) not in ba_keys:
            _set_transposed(im, I, B, 0, t)
    # line boundary points located in the area
    if len(ba):
        loc = _locate_in_polys(ba, polys)
        if (loc == INTERIOR).any():
            _set_transposed(im, B, I, 0, t)
        if (loc == BOUNDARY).any():
            _set_transposed(im, B, B, 0, t)
        if (loc == EXTERIOR).any():
            _set_transposed(im, B, E, 0, t)

    # exterior of the line vs the area
    _set_transposed(im, E, I, 2, t)
    # is the full polygon boundary covered by the line? (rare)
    params_b, _, cov_b = _split_params(sb, sa)
    pieces_b, own_b, tr_b = _pieces_with_owner(sb, params_b)
    covered = _piece_covered(own_b, tr_b, cov_b)
    if (~covered).any():
        _set_transposed(im, E, B, 1, t)


def _interior_side(is_hole: bool, is_ccw: bool) -> int:
    """+1 if the polygon interior is to the LEFT of ring traversal."""
    if not is_hole:
        return 1 if is_ccw else -1
    return -1 if is_ccw else 1


def _relate_aa(im: IM, a: G.Geom, b: G.Geom) -> None:
    pa = _poly_parts(a)
    pb = _poly_parts(b)
    rings_a = _rings_of_polys(pa)
    rings_b = _rings_of_polys(pb)
    sa, ring_of_a = _segments_of_rings(rings_a)
    sb, ring_of_b = _segments_of_rings(rings_b)

    params_a, nodes, cov_a = _split_params(sa, sb)
    params_b, _, cov_b = _split_params(sb, sa)
    # piece -> owning segment (to recover ring metadata)
    pieces_a, own_a, tr_a = _pieces_with_owner(sa, params_a)
    pieces_b, own_b, tr_b = _pieces_with_owner(sb, params_b)
    mids_a = _midpoints(pieces_a)
    mids_b = _midpoints(pieces_b)
    loc_a = _locate_in_polys(mids_a, pb)  # A-boundary pieces in B
    loc_b = _locate_in_polys(mids_b, pa)  # B-boundary pieces in A
    # structural on-boundary tags from collinear coverage (exact),
    # with the same union-absorption refinement as _relate_la for
    # edges doubled across the OTHER geometry's elements
    for _i in np.nonzero(_piece_covered(own_a, tr_a, cov_a))[0]:
        loc_a[_i] = (
            INTERIOR
            if _edge_adjacent_interior(mids_a[_i], pb)
            else BOUNDARY
        )
    for _i in np.nonzero(_piece_covered(own_b, tr_b, cov_b))[0]:
        loc_b[_i] = (
            INTERIOR
            if _edge_adjacent_interior(mids_b[_i], pa)
            else BOUNDARY
        )

    a_int = (loc_a == INTERIOR).any()
    a_bnd = (loc_a == BOUNDARY).any()
    a_ext = (loc_a == EXTERIOR).any()
    b_int = (loc_b == INTERIOR).any()
    b_bnd = (loc_b == BOUNDARY).any()
    b_ext = (loc_b == EXTERIOR).any()

    # boundary row/col
    if a_int:
        im.set(B, I, 1)
    if a_bnd:
        im.set(B, B, 1)
    if a_ext:
        im.set(B, E, 1)
    if b_int:
        im.set(I, B, 1)
    if b_ext:
        im.set(E, B, 1)
    if not a_bnd and nodes:
        # isolated boundary-boundary contact points
        im.set(B, B, 0)

    # interior-interior + boundary-only side analysis: for each shared
    # (collinear) boundary piece, interiors on the same side -> II=2
    # near it; opposite sides -> int(A) meets ext(B) (and vice versa)
    any_same = any_opp = False
    if a_bnd:
        any_same, any_opp = _shared_piece_sides(
            pieces_a, own_a, ring_of_a, rings_a,
            pieces_b, own_b, ring_of_b, rings_b,
            loc_a, loc_b,
        )
    if a_int or b_int or any_same:
        im.set(I, I, 2)

    # int(A) vs ext(B) and vice versa
    if a_ext or b_int or any_opp:
        im.set(I, E, 2)
    if b_ext or a_int or any_opp:
        im.set(E, I, 2)


def _pieces_with_owner(segs: np.ndarray, params: list[list[float]]):
    """Split segments at params -> (pieces (m,4), owner (m,),
    tranges (m,2))."""
    if len(segs) == 0:
        return (
            np.zeros((0, 4)),
            np.zeros(0, dtype=int),
            np.zeros((0, 2)),
        )
    out = []
    owner = []
    tranges = []
    for i, seg in enumerate(segs):
        ts = sorted({0.0, 1.0, *params[i]})
        p0 = np.array([seg[0], seg[1]])
        d = np.array([seg[2] - seg[0], seg[3] - seg[1]])
        for t0, t1 in zip(ts[:-1], ts[1:]):
            pa_ = p0 + t0 * d
            pb_ = p0 + t1 * d
            if not np.array_equal(pa_, pb_):
                out.append([pa_[0], pa_[1], pb_[0], pb_[1]])
                owner.append(i)
                tranges.append((t0, t1))
    return (
        np.asarray(out, dtype=np.float64).reshape(-1, 4),
        np.asarray(owner, dtype=int),
        np.asarray(tranges, dtype=np.float64).reshape(-1, 2),
    )


_COV_TOL = 1e-12


def _piece_covered(owner, tranges, coverage) -> np.ndarray:
    """Boolean per piece: its param interval lies inside a collinear-
    coverage interval of its segment (=> the piece is ON the other
    geometry's linework, decided structurally)."""
    n = len(owner)
    out = np.zeros(n, dtype=bool)
    for k in range(n):
        t0, t1 = tranges[k]
        for c0, c1 in coverage[owner[k]]:
            if t0 >= c0 - _COV_TOL and t1 <= c1 + _COV_TOL:
                out[k] = True
                break
    return out


def _shared_piece_sides(
    pieces_a, own_a, ring_of_a, rings_a,
    pieces_b, own_b, ring_of_b, rings_b,
    loc_a, loc_b,
) -> tuple[bool, bool]:
    """For collinear shared boundary pieces: (any_same_side,
    any_opposite_side) of the two interiors (decides II and IE/EI for
    boundary-only contact, e.g. polygon == other's hole)."""
    any_same = any_opp = False
    # index B's boundary-located pieces by midpoint key
    b_by_mid: dict[tuple, list[int]] = {}
    for j in np.flatnonzero(loc_b == BOUNDARY):
        m = (
            (pieces_b[j, 0] + pieces_b[j, 2]) / 2.0,
            (pieces_b[j, 1] + pieces_b[j, 3]) / 2.0,
        )
        b_by_mid.setdefault(_key(*m), []).append(j)
    for i in np.flatnonzero(loc_a == BOUNDARY):
        ma = (
            (pieces_a[i, 0] + pieces_a[i, 2]) / 2.0,
            (pieces_a[i, 1] + pieces_a[i, 3]) / 2.0,
        )
        ra = rings_a[ring_of_a[own_a[i]]]
        side_a = _interior_side(ra[2], ra[3])
        da = (
            pieces_a[i, 2] - pieces_a[i, 0],
            pieces_a[i, 3] - pieces_a[i, 1],
        )
        for j in b_by_mid.get(_key(*ma), []):
            rb = rings_b[ring_of_b[own_b[j]]]
            side_b = _interior_side(rb[2], rb[3])
            db = (
                pieces_b[j, 2] - pieces_b[j, 0],
                pieces_b[j, 3] - pieces_b[j, 1],
            )
            # flip B's side into A's direction frame if reversed
            same_dir = (da[0] * db[0] + da[1] * db[1]) > 0
            eff_b = side_b if same_dir else -side_b
            if side_a == eff_b:
                any_same = True
            else:
                any_opp = True
    return any_same, any_opp


# ----------------------------------------------------------------------
# pattern matching + named predicates (IntersectionMatrix semantics)
# ----------------------------------------------------------------------


def matches(im: str, pattern: str) -> bool:
    """DE-9IM pattern match: T (dim>=0), F, 0, 1, 2, * per cell."""
    for c, p in zip(im, pattern):
        if p == "*":
            continue
        if p == "T":
            if c == "F":
                return False
        elif p != c:
            return False
    return True


def relate_pattern(
    a: G.Geom, b: G.Geom, pattern: str, bnr: int | None = None
) -> bool:
    return matches(relate(a, b, bnr), pattern)


def intersects(a, b) -> bool:
    return not disjoint(a, b)


def disjoint(a, b) -> bool:
    return matches(relate(a, b), "FF*FF****")


def contains(a, b) -> bool:
    return matches(relate(a, b), "T*****FF*")


def within(a, b) -> bool:
    return matches(relate(a, b), "T*F**F***")


def contains_properly(a, b) -> bool:
    """PreparedGeometry::containsProperly: b lies in a's INTERIOR
    (no boundary contact) — IM pattern T**FF*FF*
    (include/geos/geom/prep/PreparedGeometry.h:117-145)."""
    return matches(relate(a, b), "T**FF*FF*")


def covers(a, b) -> bool:
    im = relate(a, b)
    return any(
        matches(im, p)
        for p in ("T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*")
    )


def coveredby(a, b) -> bool:
    im = relate(a, b)
    return any(
        matches(im, p)
        for p in ("T*F**F***", "*TF**F***", "**FT*F***", "**F*TF***")
    )


def touches(a, b) -> bool:
    im = relate(a, b)
    return any(
        matches(im, p) for p in ("FT*******", "F**T*****", "F***T****")
    )


def crosses(a, b) -> bool:
    im = relate(a, b)
    da, db = a.dimension(), b.dimension()
    if da < db:
        return matches(im, "T*T******")
    if da > db:
        return matches(im, "T*****T**")
    if da == 1 and db == 1:
        return matches(im, "0********")
    return False


def overlaps(a, b) -> bool:
    im = relate(a, b)
    da, db = a.dimension(), b.dimension()
    if da != db:
        return False
    if da == 1:
        return matches(im, "1*T***T**")
    return matches(im, "T*T***T**")


def equals_topo(a, b) -> bool:
    # two empty geometries are topologically equal regardless of type
    # (Geometry.cpp:514-519)
    if a.is_empty or b.is_empty:
        return a.is_empty and b.is_empty
    return matches(relate(a, b), "T*F**FFF*")
