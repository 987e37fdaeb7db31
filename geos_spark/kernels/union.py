"""unaryUnion for puntal and lineal inputs (UnaryUnionOp semantics).

- points: the union of a point set is its distinct coordinate set
  (``src/operation/union/UnaryUnionOp.cpp`` point path).
- lines: full noding union — every line is split at every intersection
  with any other line (and itself), duplicate collinear pieces
  dissolve, and the resulting edge soup is re-merged into maximal
  chains through degree-2 nodes (the node + dissolve + LineMerger
  pipeline, ``src/operation/linemerge/LineMerger.cpp``).
- polygons: cascaded binary union merge tree over the overlay engine
  (``CascadedPolygonUnion.cpp:89-122``), robust-ladder merges.
- mixed collections: per-dimension unions combined per
  ``UnaryUnionOp::Union`` (lines+polys overlay union, uncovered
  points merged in).
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G


def _key(x: float, y: float) -> tuple:
    return (round(float(x), 9), round(float(y), 9))


def union_points(g: G.Geom) -> G.Geom:
    pts = g.all_coords()
    if len(pts) == 0:
        return G.Geom.empty(G.MULTIPOINT)
    uniq = sorted({(float(x), float(y)) for x, y in pts})
    if len(uniq) == 1:
        return G.Geom.point(*uniq[0])
    return G.Geom(
        G.MULTIPOINT, [G.Geom.point(x, y) for x, y in uniq]
    )


def union_lines(g: G.Geom) -> G.Geom:
    """Noding union of lineal inputs: each original chain is split at
    every intersection node with any line (including itself); original
    vertices between nodes are preserved; duplicate (collinear-
    dissolved) pieces collapse. No chain re-merging — the reference
    output keeps noded pieces as-is (TestUnaryUnion.xml cases 3-6).

    The fast dissolve shares the float noder's blind spot on
    near-degenerate crossings; validate its noding like the overlay
    float tier does and, on failure, route through the overlay robust
    ladder (union with an empty operand — UnaryUnionOp::unionNoOpt),
    whose snapping tiers collapse near-duplicate linework the way the
    reference's historical-bug corpus expects (e.g. geos#600).

    Above ~2,000 segments the per-chain dissolve's python split loop
    goes quadratic (133 s on a 10k-segment corpus case) while the
    ladder's vectorized noder handles the same input in seconds — big
    inputs route to the ladder directly (identical semantics; the
    dissolve exists for exact piece-granularity parity on the small
    TestUnaryUnion corpus outputs)."""
    from geos_spark.kernels import overlay as OV

    n_seg = sum(
        len(p.data) - 1
        for p in g.geoms()
        if p.type_id == G.LINESTRING and len(p.data) > 1
    )
    if n_seg <= 2000:
        try:
            out = _union_lines_dissolve(g)
            segs, _sz, _rf, _sid = OV._collect_segments(out, 0, 0)
            OV._validate_noding(segs)
            return out
        except Exception:
            pass
    return OV.overlay_robust(g, G.Geom.empty(G.LINESTRING), OV.UNION)


def _union_lines_dissolve(g: G.Geom) -> G.Geom:
    from geos_spark.kernels.relate import _line_parts, _param_on_seg
    from geos_spark.kernels.segments import (
        COLLINEAR_INTERSECTION,
        POINT_INTERSECTION,
        intersect_pairs,
    )

    lines = _line_parts(g)
    segs = []
    owner = []  # (line_idx, pos)
    for li, c in enumerate(lines):
        pos = 0
        for i in range(len(c) - 1):
            if np.array_equal(c[i], c[i + 1]):
                continue
            segs.append([c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1]])
            owner.append((li, pos, i))
            pos += 1
    segs = np.asarray(segs, dtype=np.float64).reshape(-1, 4)
    n = len(segs)
    if n == 0:
        return G.Geom.empty(G.MULTILINESTRING)

    params: list[list[float]] = [[] for _ in range(n)]
    node_keys: set[tuple] = set()
    ia, ib = np.triu_indices(n, k=1)
    cls = intersect_pairs(segs[ia], segs[ib])
    for k in np.flatnonzero(cls != 0):
        i, j = int(ia[k]), int(ib[k])
        li, pi, _ = owner[i]
        lj, pj, _ = owner[j]
        if li == lj and abs(pi - pj) == 1:
            if cls[k] == COLLINEAR_INTERSECTION:
                # backtracking line: still a node at the fold
                pass
            else:
                continue  # trivial shared vertex of consecutive segs
        A, B = segs[i], segs[j]
        if cls[k] == POINT_INTERSECTION:
            from geos_spark.kernels.relate import _seg_seg_point

            p = _seg_seg_point(A, B)
            if p is None:
                continue
            for s, arr in ((i, A), (j, B)):
                t = _param_on_seg(arr, p)
                if 0.0 < t < 1.0:
                    params[s].append(t)
            node_keys.add(_key(p[0], p[1]))
        else:  # collinear overlap: split each at the other's endpoints
            for s, arr, other in ((i, A, B), (j, B, A)):
                for q in (other[:2], other[2:]):
                    t = _param_on_seg(arr, q)
                    if 0.0 < t < 1.0:
                        params[s].append(t)
                    if 0.0 <= t <= 1.0:
                        node_keys.add(_key(q[0], q[1]))

    # walk each original chain, cutting at interior params and at
    # original vertices that are intersection nodes
    seg_by_line: dict[int, list[int]] = {}
    for sidx, (li, pos, _orig_i) in enumerate(owner):
        seg_by_line.setdefault(li, []).append(sidx)

    pieces: dict[tuple, np.ndarray] = {}

    def emit(chain: list):
        if len(chain) < 2:
            return
        arr = np.asarray(chain, dtype=np.float64)
        fwd = tuple(map(tuple, arr))
        rev = tuple(map(tuple, arr[::-1]))
        pieces.setdefault(min(fwd, rev), arr)

    for li in sorted(seg_by_line):
        chain: list = []
        for sidx in seg_by_line[li]:
            seg = segs[sidx]
            p0 = seg[:2]
            d = seg[2:] - seg[:2]
            if not chain:
                chain = [tuple(p0)]
            ts = sorted({t for t in params[sidx] if 0.0 < t < 1.0})
            for t in ts:
                pt = tuple(p0 + t * d)
                chain.append(pt)
                emit(chain)
                chain = [pt]
            end = tuple(seg[2:])
            chain.append(end)
            # cut at a vertex that is an intersection node
            if _key(*end) in node_keys:
                emit(chain)
                chain = [end]
        emit(chain)

    if not pieces:
        return G.Geom.empty(G.MULTILINESTRING)
    parts = [
        G.Geom(G.LINESTRING, arr) for _k, arr in sorted(pieces.items())
    ]
    if len(parts) == 1:
        return parts[0]
    return G.Geom(G.MULTILINESTRING, parts)


def cascaded_polygon_union(
    polys: list[G.Geom], scale: float | None = None
) -> G.Geom:
    """Balanced binary union merge tree
    (CascadedPolygonUnion::binaryUnion,
    src/operation/union/CascadedPolygonUnion.cpp:89-122) — the same
    partial/final associative-merge shape the distributed aggregate
    uses per cell.  ``scale`` runs every merge under a FIXED
    PrecisionModel, as OverlayNGRobust does when the inputs' factory
    carries one (OverlayNGRobust.cpp:96-100)."""
    from geos_spark.kernels import overlay as OV

    def area_only(g: G.Geom) -> G.Geom:
        # strict-mode union semantics (OverlayNG::geomunion sets
        # strict mode): keep polygonal components only
        parts = [p for p in g.geoms() if p.type_id == G.POLYGON and p.data]
        if not parts:
            return G.Geom(G.POLYGON, [])
        if len(parts) == 1:
            return parts[0]
        return G.Geom.collection(G.MULTIPOLYGON, parts)

    def union2(x: G.Geom, y: G.Geom) -> G.Geom:
        if scale is not None:
            return OV.overlay(x, y, OV.UNION, scale)
        return OV.overlay_robust(x, y, OV.UNION)

    def merge(lo: int, hi: int) -> G.Geom:
        if hi - lo == 1:
            return polys[lo]
        mid = (lo + hi) // 2
        return area_only(union2(merge(lo, mid), merge(mid, hi)))

    if not polys:
        return G.Geom(G.POLYGON, [])
    return merge(0, len(polys))


def unary_union(g: G.Geom) -> G.Geom:
    """UnaryUnionOp::Union (src/operation/union/UnaryUnionOp.cpp:67-119):
    per-dimension unions (points dedupe, lines noding-union, polygons
    cascaded), then lines+polys via overlay union, then uncovered
    points merged in."""
    from geos_spark.kernels import overlay as OV

    pts = [p for p in g.geoms() if p.type_id == G.POINT and len(p.data)]
    lns = [
        p for p in g.geoms() if p.type_id == G.LINESTRING and len(p.data)
    ]
    pls = [p for p in g.geoms() if p.type_id == G.POLYGON and p.data]

    u_pts = union_points(G.Geom(G.MULTIPOINT, pts)) if pts else None
    u_lns = union_lines(G.Geom(G.MULTILINESTRING, lns)) if lns else None
    u_pls = cascaded_polygon_union(pls) if pls else None

    parts = [x for x in (u_lns, u_pls) if x is not None]
    if not parts:
        la = None
    elif len(parts) == 1:
        la = parts[0]
    else:
        la = OV.overlay_robust(parts[0], parts[1], OV.UNION)
    if u_pts is None:
        return la if la is not None else G.Geom.empty(G.GEOMETRYCOLLECTION)
    if la is None:
        return u_pts
    return _merge_points_into(u_pts, la)


def _merge_points_into(u_pts: G.Geom, la: G.Geom) -> G.Geom:
    """PointGeometryUnion (src/operation/union/PointGeometryUnion.cpp):
    union of a point set with an arbitrary (possibly mixed-dimension)
    geometry = the geometry plus the points not covered by any
    component.  Overlay is never invoked, so a mixed line/polygon
    union result (line poking out of a polygon) is handled exactly
    like the reference instead of tripping the homogeneous-operand
    check in ``overlay._flatten_operand``."""
    from geos_spark.kernels import overlay as OV
    from geos_spark.kernels.relate import (
        _line_parts,
        _locate_in_polys,
        _locate_on_lines,
        _point_parts,
        _poly_parts,
    )

    coords = OV._unique_pts(_point_parts(u_pts))
    pts = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    polys = _poly_parts(la)
    lines = _line_parts(la)
    covered = np.zeros(len(pts), dtype=bool)
    if len(pts) and polys:
        covered |= np.array(
            [int(v) != OV._EXT for v in _locate_in_polys(pts, polys)]
        )
    if len(pts) and lines:
        covered |= np.array(
            [int(v) != OV._EXT for v in _locate_on_lines(pts, lines)]
        )
    free = sorted(
        (float(x), float(y))
        for (x, y), cv in zip(coords, covered)
        if not cv
    )
    if not free:
        return la
    poly_geoms = [g for g in la.geoms() if g.type_id == G.POLYGON and g.data]
    line_geoms = [
        g for g in la.geoms() if g.type_id == G.LINESTRING and len(g.data)
    ]
    pt_geoms = [G.Geom.point(x, y) for x, y in free]
    return OV._build_result(poly_geoms, line_geoms, pt_geoms, la.dimension())


def disjoint_subset_union(g: G.Geom) -> G.Geom:
    """GEOSDisjointSubsetUnion (capi/geos_c.h.in:1085;
    include/geos/operation/union/DisjointSubsetUnion.h): partition the
    input's components into intersects-connected clusters
    (GeometryIntersectsClusterFinder: envelope prefilter, then the
    real predicate) and union each cluster independently; the combined
    result equals unaryUnion but never overlays across clusters.

    Cluster discovery is union-find over the component list with an
    envelope sweep prefilter, so the quadratic intersects probe only
    runs on envelope-overlapping pairs.
    """
    from geos_spark.kernels.relate import intersects

    comps = [p for p in g.geoms() if not p.is_empty]
    n = len(comps)
    if n == 0:
        return unary_union(g)
    envs = [c.envelope() for c in comps]
    parent = list(range(n))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def link(i: int, j: int) -> None:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    # sweep on xmin to bound the candidate pairs
    order = sorted(range(n), key=lambda i: envs[i][0])
    for a in range(n):
        i = order[a]
        for b in range(a + 1, n):
            j = order[b]
            if envs[j][0] > envs[i][2]:
                break
            if find(i) == find(j):
                continue
            if (
                envs[i][1] <= envs[j][3]
                and envs[j][1] <= envs[i][3]
                and intersects(comps[i], comps[j])
            ):
                link(i, j)

    clusters: dict[int, list[G.Geom]] = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(comps[i])
    parts: list[G.Geom] = []
    for members in clusters.values():
        if len(members) == 1:
            parts.append(members[0])
        else:
            parts.append(
                unary_union(G.Geom(G.GEOMETRYCOLLECTION, members))
            )
    if len(parts) == 1:
        return parts[0]
    # combine: the per-cluster results are pairwise disjoint, so a
    # structural merge is the union
    flat: list[G.Geom] = []
    for p in parts:
        flat.extend(p.geoms() if p.is_collection else [p])
    dims = {p.dimension() for p in flat}
    if dims == {0}:
        return G.Geom(G.MULTIPOINT, flat) if len(flat) > 1 else flat[0]
    if dims == {1}:
        return (
            G.Geom(G.MULTILINESTRING, flat) if len(flat) > 1 else flat[0]
        )
    if dims == {2}:
        return G.Geom(G.MULTIPOLYGON, flat) if len(flat) > 1 else flat[0]
    return G.Geom(G.GEOMETRYCOLLECTION, flat)
