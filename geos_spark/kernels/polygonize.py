"""Polygonize / BuildArea / MakeValid kernels.

- ``polygonize``: faces of a fully-noded linework arrangement —
  the role of ``operation/polygonize/Polygonizer.cpp``; implemented
  by tracing every half-edge with the overlay kernel's minimal-ring
  machinery (faces kept on the left) and pairing hole cycles with
  their smallest strictly-containing shells.
- ``build_area``: ``operation/polygonize/BuildArea.cpp`` — polygonize,
  nest faces whose shell equals another face's hole, keep faces with
  an even ancestor count, dissolve with cascaded union.
- ``make_valid``: ``operation/valid/MakeValid.cpp`` — the PostGIS
  linework method: node boundaries by unioning with a point,
  iteratively build areas from cut edges and symmetric-difference
  them together, report leftover cut edges and collapsed points.

Oracle gate: ``tests/xmltester/tests/misc/{buildarea,makevalid}.xml``
golden outputs, compared normalized.
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels import overlay as OV
from geos_spark.kernels.scalars import ring_signed_area
from geos_spark.kernels.valid import is_valid


def _ring_key(r: np.ndarray) -> frozenset:
    return frozenset((float(x), float(y)) for x, y in r)


def _rings_equal_any_direction(r1: np.ndarray, r2: np.ndarray) -> bool:
    """BuildArea.cpp ringsEqualAnyDirection: same cyclic sequence in
    either direction."""
    if len(r1) != len(r2):
        return False
    n = len(r1) - 1
    if n <= 0:
        return True
    a = [tuple(p) for p in r1[:-1]]
    b = [tuple(p) for p in r2[:-1]]
    try:
        off = b.index(a[0])
    except ValueError:
        return False
    if all(a[i] == b[(i + off) % n] for i in range(1, n)):
        return True
    return all(a[i] == b[(off - i) % n] for i in range(1, n))


def _polygonize_rings(undirected: set) -> list[np.ndarray]:
    """Segment-level entry (each undirected segment its own chain) —
    used where the linework is a dissolved unit-segment arrangement
    (coverage cleaning)."""
    return _polygonize_chains(
        [np.asarray([p, q], dtype=np.float64) for p, q in undirected]
    )


def _polygonize_chains(chains: list[np.ndarray]) -> list[np.ndarray]:
    """PolygonizeGraph edge-ring extraction
    (src/operation/polygonize/PolygonizeGraph.cpp:173-280).

    Faithful to the reference's graph granularity: one edge per
    linestring CHAIN, nodes only at chain endpoints
    (PolygonizeGraph::addEdge) — a chain passing through another
    chain's endpoint does NOT create a node there, which is what
    keeps self-touching rings (a ring whose interior vertex lies on
    another ring's node) from being woven together at the touch
    point.  Pipeline: delete dangles and cut edges, build maximal
    rings with the next-CW-edge pairing (sym(out_i).next = out_{i+1}
    in CCW star order), then convert to minimal rings by re-pairing
    each ring's edges CCW at nodes it passes through more than
    once."""
    import math

    def key(p):
        return (float(p[0]), float(p[1]))

    # removeRepeatedPoints + drop degenerate chains (addEdge guards)
    alive: list[np.ndarray] = []
    for c in chains:
        c = np.asarray(c, dtype=np.float64)
        if len(c) < 2:
            continue
        keep = np.ones(len(c), dtype=bool)
        keep[1:] = (c[1:] != c[:-1]).any(axis=1)
        c = c[keep]
        if len(c) >= 2:
            alive.append(c)

    # dangle removal to fixpoint (deleteDangles)
    while True:
        deg: dict = {}
        for c in alive:
            deg[key(c[0])] = deg.get(key(c[0]), 0) + 1
            deg[key(c[-1])] = deg.get(key(c[-1]), 0) + 1
        nxt_alive = [
            c
            for c in alive
            if deg[key(c[0])] > 1 and deg[key(c[-1])] > 1
        ]
        if len(nxt_alive) == len(alive):
            break
        alive = nxt_alive
    if not alive:
        return []

    def build(chs):
        # directed edge e = 2*chain + d; d=0 forward, d=1 backward
        n2 = 2 * len(chs)

        def frm(e):
            c = chs[e >> 1]
            return key(c[0]) if (e & 1) == 0 else key(c[-1])

        def dirpt(e):
            c = chs[e >> 1]
            return key(c[1]) if (e & 1) == 0 else key(c[-2])

        out_at: dict = {}
        for e in range(n2):
            out_at.setdefault(frm(e), []).append(e)
        for a, lst in out_at.items():
            lst.sort(
                key=lambda e: math.atan2(
                    dirpt(e)[1] - a[1], dirpt(e)[0] - a[0]
                )
            )
        nxt = [None] * n2
        for a, lst in out_at.items():
            m = len(lst)
            for i in range(m):
                nxt[lst[i] ^ 1] = lst[(i + 1) % m]
        # maximal rings
        label = [-1] * n2
        rings_edges = []
        for e in range(n2):
            if label[e] != -1:
                continue
            lab = len(rings_edges)
            cur = e
            path = []
            while label[cur] == -1:
                label[cur] = lab
                path.append(cur)
                cur = nxt[cur]
            rings_edges.append(path)
        return out_at, nxt, label, rings_edges

    _, _, label, _ = build(alive)
    # cut edges: both directions in the same maximal ring
    cut = {
        e >> 1 for e in range(2 * len(alive)) if label[e] == label[e ^ 1]
    }
    if cut:
        alive = [c for i, c in enumerate(alive) if i not in cut]
        if not alive:
            return []
    out_at, nxt, label, rings_edges = build(alive)

    # minimal conversion: CCW re-pairing at multiply-visited nodes
    def frm(e):
        c = alive[e >> 1]
        return key(c[0]) if (e & 1) == 0 else key(c[-1])

    for lab, path in enumerate(rings_edges):
        counts: dict = {}
        for e in path:
            a = frm(e)
            counts[a] = counts.get(a, 0) + 1
        for node, cnt in counts.items():
            if cnt <= 1:
                continue
            star = out_at[node]
            first_out = None
            prev_in = None
            for de in reversed(star):  # CW iteration over CCW star
                out_de = de if label[de] == lab else None
                in_de = (de ^ 1) if label[de ^ 1] == lab else None
                if out_de is None and in_de is None:
                    continue
                if in_de is not None:
                    prev_in = in_de
                if out_de is not None:
                    if prev_in is not None:
                        nxt[prev_in] = out_de
                        prev_in = None
                    if first_out is None:
                        first_out = out_de
            if prev_in is not None:
                nxt[prev_in] = first_out

    visited = [False] * (2 * len(alive))
    rings = []
    for e in range(2 * len(alive)):
        if visited[e]:
            continue
        cur = e
        pts: list = []
        while not visited[cur]:
            visited[cur] = True
            c = alive[cur >> 1]
            seq = c[:-1] if (cur & 1) == 0 else c[::-1][:-1]
            pts.extend(map(tuple, seq))
            cur = nxt[cur]
        if cur == e and len(pts) >= 3:
            pts.append(pts[0])
            rings.append(np.asarray(pts, dtype=np.float64))
    return rings


def polygonize(g: G.Geom) -> list[G.Geom]:
    """Faces of a noded linework (Polygonizer.getPolygons)."""
    # LinearComponentExtracter semantics: lines AND polygon rings
    chains = []
    for part in g.geoms():
        if part.type_id == G.LINESTRING and len(part.data) > 1:
            chains.append(part.data)
        elif part.type_id == G.POLYGON:
            chains.extend(r for r in part.data if len(r) > 1)
    # chain-level graph, nodes at chain endpoints only
    # (PolygonizeGraph::addEdge); duplicated chains become cut edges
    rings = _polygonize_chains(chains)

    return _assemble_faces(rings)


def _assemble_faces(rings: list[np.ndarray]) -> list[G.Geom]:
    # JTS EdgeRing convention: shells trace CW (isHole == isCCW);
    # output shells re-oriented CCW for the Geom convention
    shells = [r[::-1].copy() for r in rings if ring_signed_area(r) < 0]
    holes = [r for r in rings if ring_signed_area(r) > 0]
    if not shells:
        return []
    shell_area = [abs(ring_signed_area(s)) for s in shells]
    assigned: list[list[np.ndarray]] = [[] for _ in shells]
    for h in holes:
        best = -1
        best_area = np.inf
        for si, s in enumerate(shells):
            if shell_area[si] >= best_area:
                continue
            loc = _ring_contains_cycle(s, h)
            if loc:
                best = si
                best_area = shell_area[si]
        if best >= 0:
            assigned[best].append(h)
    return [
        G.Geom(G.POLYGON, [s] + assigned[i]) for i, s in enumerate(shells)
    ]


def _extract_chains(g: G.Geom) -> list[np.ndarray]:
    """LinearComponentExtracter: lines and polygon rings, cleaned of
    repeated points, degenerate chains dropped (addEdge guards)."""
    raw = []
    for part in g.geoms():
        if part.type_id == G.LINESTRING and len(part.data) > 1:
            raw.append(part.data)
        elif part.type_id == G.POLYGON:
            raw.extend(r for r in part.data if len(r) > 1)
    out: list[np.ndarray] = []
    for c in raw:
        c = np.asarray(c, dtype=np.float64)
        keep = np.ones(len(c), dtype=bool)
        keep[1:] = (c[1:] != c[:-1]).any(axis=1)
        c = c[keep]
        if len(c) >= 2:
            out.append(c)
    return out


def polygonize_full(
    g: G.Geom,
) -> tuple[list[G.Geom], list[G.Geom], list[G.Geom], list[G.Geom]]:
    """GEOSPolygonize_full (capi geos_ts_c.cpp:2479-2540):
    -> (polygons, cut_edges, dangles, invalid_ring_lines).

    Cut edges are duplicated chains (every copy reported, one kept
    in the graph); dangles are the chains deleted by the fixpoint
    low-degree removal; rings that do not form a valid single-ring
    polygon (e.g. a self-crossing bowtie ring) are reported as
    invalid ring lines instead of faces (JTS EdgeRing::isValidRing).
    """
    from geos_spark.kernels.valid import is_valid

    chains = _extract_chains(g)

    def key(p):
        return (float(p[0]), float(p[1]))

    def canon(c: np.ndarray):
        f = tuple(map(tuple, c))
        r = tuple(map(tuple, c[::-1]))
        return min(f, r)

    groups: dict = {}
    for c in chains:
        groups.setdefault(canon(c), []).append(c)
    cuts: list[G.Geom] = []
    alive: list[np.ndarray] = []
    for members in groups.values():
        if len(members) > 1:
            cuts.extend(G.Geom(G.LINESTRING, m.copy()) for m in members)
        alive.append(members[0])

    # dangle fixpoint (deleteDangles), recording the removals
    dangles: list[G.Geom] = []
    while True:
        deg: dict = {}
        for c in alive:
            deg[key(c[0])] = deg.get(key(c[0]), 0) + 1
            deg[key(c[-1])] = deg.get(key(c[-1]), 0) + 1
        nxt = []
        for c in alive:
            if deg[key(c[0])] > 1 and deg[key(c[-1])] > 1:
                nxt.append(c)
            else:
                dangles.append(G.Geom(G.LINESTRING, c.copy()))
        if len(nxt) == len(alive):
            break
        alive = nxt

    rings = _polygonize_chains(alive)
    valid_rings: list[np.ndarray] = []
    invalid: list[G.Geom] = []
    seen_cycles: set = set()
    for r in rings:
        try:
            ok = is_valid(G.Geom(G.POLYGON, [r]))
        except Exception:
            ok = False
        if ok:
            valid_rings.append(r)
        else:
            # an invalid closed chain is walked in both directions by
            # the maximal-ring extraction; report the cycle once
            # (canonical: open ring, rotated to min vertex, direction
            # with the smaller successor)
            open_r = r[:-1]
            verts = [tuple(v) for v in open_r]
            k = verts.index(min(verts))
            rot = verts[k:] + verts[:k]
            rev = [rot[0]] + rot[1:][::-1]
            cyc = tuple(min(rot, rev))
            if cyc in seen_cycles:
                continue
            seen_cycles.add(cyc)
            invalid.append(G.Geom(G.LINESTRING, r.copy(), is_ring=False))
    return _assemble_faces(valid_rings), cuts, dangles, invalid


def polygonize_valid(g: G.Geom) -> G.Geom:
    """GEOSPolygonize_valid (geos_ts_c.cpp:2299-2327, Polygonizer's
    extract-only-polygonal mode): keep only outermost shells (with
    their holes) so the combined result is a valid polygonal
    geometry — a face whose shell is another face's hole ring is
    dropped."""
    polys, _, _, _ = polygonize_full(g)
    if not polys:
        return G.Geom.collection(G.GEOMETRYCOLLECTION, [])
    outer: list[G.Geom] = []
    for i, p in enumerate(polys):
        shell = p.data[0]
        contained = False
        for j, q in enumerate(polys):
            if i == j:
                continue
            if _ring_contains_cycle(q.data[0], shell):
                contained = True
                break
        if not contained:
            outer.append(p)
    if len(outer) == 1:
        return outer[0]
    return G.Geom(G.MULTIPOLYGON, outer)


def _ring_contains_cycle(shell: np.ndarray, h: np.ndarray) -> bool:
    """EdgeRing::findEdgeRingContaining candidate test
    (src/operation/polygonize/EdgeRing.cpp): reject equal envelopes
    (self/coincident rings), require envelope containment, then
    point-in-ring (boundary-inclusive, PointLocation::isInRing) of
    the first hole VERTEX not present in the shell's coordinate list
    — an original exact coordinate, so the on-boundary decision is
    exact, unlike a computed midpoint."""
    from geos_spark.kernels.orientation import orientation_index
    from geos_spark.kernels.overlay import _point_in_ring_parity

    senv = (
        shell[:, 0].min(), shell[:, 1].min(),
        shell[:, 0].max(), shell[:, 1].max(),
    )
    henv = (
        h[:, 0].min(), h[:, 1].min(), h[:, 0].max(), h[:, 1].max(),
    )
    if senv == henv:
        return False
    if not (
        senv[0] <= henv[0]
        and senv[1] <= henv[1]
        and henv[2] <= senv[2]
        and henv[3] <= senv[3]
    ):
        return False
    sset = {(float(x), float(y)) for x, y in shell}
    pt = None
    for x, y in h[:-1]:
        k = (float(x), float(y))
        if k not in sset:
            pt = k
            break
    if pt is None:
        return False  # every hole vertex on the candidate (ptNotInList)
    segs = np.hstack([shell[:-1], shell[1:]])
    inx = (np.minimum(segs[:, 0], segs[:, 2]) <= pt[0]) & (
        pt[0] <= np.maximum(segs[:, 0], segs[:, 2])
    )
    iny = (np.minimum(segs[:, 1], segs[:, 3]) <= pt[1]) & (
        pt[1] <= np.maximum(segs[:, 1], segs[:, 3])
    )
    cand = np.flatnonzero(inx & iny)
    if len(cand):
        s = segs[cand]
        o = orientation_index(
            s[:, 0], s[:, 1], s[:, 2], s[:, 3], pt[0], pt[1]
        )
        if bool((np.asarray(o) == 0).any()):
            return True  # on the ring: isInRing is boundary-inclusive
    return _point_in_ring_parity(pt, shell)


def build_area(g: G.Geom, scale: float | None = None) -> G.Geom:
    """BuildArea.cpp::build.  ``scale`` = the input factory's FIXED
    PrecisionModel scale, inherited by the dissolving cascaded union
    (OverlayNGRobust.cpp:96-100); None = floating."""
    from geos_spark.kernels.union import cascaded_polygon_union

    polys = polygonize(g)
    if not polys:
        return G.Geom(G.GEOMETRYCOLLECTION, [])
    if len(polys) == 1:
        return polys[0]
    # nest faces: a face whose shell equals another face's hole
    n = len(polys)
    env_area = []
    for p in polys:
        x0, y0, x1, y1 = p.envelope()
        env_area.append((x1 - x0) * (y1 - y0))
    order = sorted(range(n), key=lambda i: -env_area[i])
    parent = [None] * n
    for oi, i in enumerate(order):
        for hole in polys[i].data[1:]:
            for j in order[oi + 1:]:
                if parent[j] is not None:
                    continue
                if _rings_equal_any_direction(polys[j].data[0], hole):
                    parent[j] = i
                    break

    def ancestors(i: int) -> int:
        c = 0
        while parent[i] is not None:
            c += 1
            i = parent[i]
        return c

    keep = [polys[i] for i in range(n) if ancestors(i) % 2 == 0]
    if not keep:
        return G.Geom(G.GEOMETRYCOLLECTION, [])
    u = cascaded_polygon_union(keep, scale)
    return u


def _node_line_with_first_coordinate(
    g: G.Geom, scale: float | None = None
) -> G.Geom | None:
    """MakeValid.cpp nodeLineWithFirstCoordinate: noding union of a
    lineal geometry with one of its own points.  Under a FIXED input
    PrecisionModel the union snap-rounds (OverlayNGRobust.cpp:96)."""
    if g.is_empty:
        return None
    first = None
    for p in g.geoms():
        if p.type_id == G.LINESTRING and len(p.data):
            first = (float(p.data[0, 0]), float(p.data[0, 1]))
            break
    if first is None:
        return None
    pt = G.Geom.point(first[0], first[1])
    if scale is not None:
        return OV.overlay(g, pt, OV.UNION, scale)
    return OV.overlay_robust(g, pt, OV.UNION)


def _unique_points(g: G.Geom) -> G.Geom:
    seen = set()
    pts = []
    for p in g.geoms():
        data = p.data if not isinstance(p.data, list) else None
        if p.type_id in (G.POINT, G.LINESTRING):
            for x, y in p.data:
                k = (float(x), float(y))
                if k not in seen:
                    seen.add(k)
                    pts.append(G.Geom.point(k[0], k[1]))
        elif p.type_id == G.POLYGON:
            for r in p.data:
                for x, y in r:
                    k = (float(x), float(y))
                    if k not in seen:
                        seen.add(k)
                        pts.append(G.Geom.point(k[0], k[1]))
    if not pts:
        return G.Geom.empty(G.MULTIPOINT)
    return G.Geom.collection(G.MULTIPOINT, pts)


def _make_valid_line(g: G.Geom, scale: float | None = None) -> G.Geom | None:
    return _node_line_with_first_coordinate(g, scale)


def _make_valid_poly(g: G.Geom, scale: float | None = None) -> G.Geom:
    from geos_spark.kernels.scalars import geom_boundary

    def _ov(x, y, op):
        if scale is not None:
            return OV.overlay(x, y, op, scale)
        return OV.overlay_robust(x, y, op)

    bound = geom_boundary(g)
    cut_edges = _node_line_with_first_coordinate(bound, scale)
    if cut_edges is None:
        return G.Geom(G.POLYGON, [])
    collapse_points = _ov(
        _unique_points(bound), _unique_points(cut_edges), OV.DIFFERENCE
    )
    area: G.Geom = G.Geom(G.POLYGON, [])
    while not cut_edges.is_empty and any(
        p.type_id == G.LINESTRING for p in cut_edges.geoms()
    ):
        new_area = build_area(cut_edges, scale)
        if new_area.is_empty:
            break
        new_bound = geom_boundary(new_area)
        area = _ov(area, new_area, OV.SYMDIFFERENCE)
        cut_edges = _ov(cut_edges, new_bound, OV.DIFFERENCE)
    items = []
    if not area.is_empty:
        items.append(area)
    if not cut_edges.is_empty:
        items.append(cut_edges)
    if not collapse_points.is_empty:
        items.append(collapse_points)
    if not items:
        return area
    if len(items) == 1:
        return items[0]
    return G.Geom.collection(G.GEOMETRYCOLLECTION, items)


def make_valid(g: G.Geom, scale: float | None = None) -> G.Geom:
    """MakeValid::build.  ``scale`` = the input factory's FIXED
    PrecisionModel scale — every internal overlay then snap-rounds,
    matching OverlayNGRobust's fixed-PM dispatch."""
    try:
        if is_valid(g):
            return g
    except Exception:
        pass
    t = g.type_id
    if t == G.LINESTRING:
        out = _make_valid_line(g, scale)
        return out if out is not None else G.Geom.empty(G.LINESTRING)
    if t == G.MULTILINESTRING:
        points = []
        lines = []
        for part in g.geoms():
            v = _make_valid_line(part, scale)
            if v is None or v.is_empty:
                continue
            if v.type_id == G.POINT:
                points.append(v)
            else:
                for q in v.geoms():
                    if q.type_id == G.LINESTRING:
                        lines.append(q)
                    elif q.type_id == G.POINT:
                        points.append(q)
        prt = None
        if points:
            prt = (
                points[0]
                if len(points) == 1
                else G.Geom.collection(G.MULTIPOINT, points)
            )
        lrt = None
        if lines:
            lrt = (
                lines[0]
                if len(lines) == 1
                else G.Geom.collection(G.MULTILINESTRING, lines)
            )
        if prt is not None and lrt is not None:
            return G.Geom.collection(G.GEOMETRYCOLLECTION, [prt, lrt])
        if prt is not None:
            return prt
        if lrt is not None:
            return lrt
        return G.Geom.empty(G.MULTILINESTRING)
    if t in (G.POLYGON, G.MULTIPOLYGON):
        return _make_valid_poly(g, scale)
    if t == G.GEOMETRYCOLLECTION:
        return G.Geom.collection(
            G.GEOMETRYCOLLECTION, [make_valid(p, scale) for p in g.data]
        )
    return g
