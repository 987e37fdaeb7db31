"""Constrained Delaunay triangulation of a polygon with holes.

Replaces the reference's ConstrainedDelaunayTriangulator
(src/triangulate/polygon/ConstrainedDelaunayTriangulator.cpp: hole
joining + ear-clip + Delaunay improvement): here hole joining uses the
Eberly max-x bridge rule, ear clipping is the classic O(n^2) scan, and
Lawson edge flips (constrained boundary edges pinned) converge to the
constrained Delaunay triangulation — which is unique for inputs in
general position, so downstream consumers (ConcaveHullOfPolygons)
reproduce the reference's results.
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels.delaunay import _incircle, _orient


def _ring_area(pts: list) -> float:
    s = 0.0
    for i in range(len(pts) - 1):
        s += pts[i][0] * pts[i + 1][1] - pts[i + 1][0] * pts[i][1]
    return s / 2.0


def _join_holes(shell: list, holes: list) -> list:
    """Return a single ring (list of points, open) covering the
    polygon with holes via max-x bridges (Eberly's algorithm)."""
    outer = list(shell)
    if _ring_area(outer + [outer[0]]) < 0:
        outer = outer[::-1]
    hs = []
    for h in holes:
        h = list(h)
        if (h[0][0] == h[-1][0]) and (h[0][1] == h[-1][1]):
            h = h[:-1]
        if _ring_area(h + [h[0]]) > 0:
            h = h[::-1]  # holes clockwise
        hs.append(h)
    if (outer[0][0] == outer[-1][0]) and (outer[0][1] == outer[-1][1]):
        outer = outer[:-1]
    # process holes by decreasing max-x
    hs.sort(key=lambda h: -max(p[0] for p in h))
    for h in hs:
        mi = max(range(len(h)), key=lambda i: (h[i][0], h[i][1]))
        M = h[mi]
        # closest +x ray hit on current outer ring
        best_t = None
        best_edge = None
        best_pt = None
        n = len(outer)
        for i in range(n):
            a, b = outer[i], outer[(i + 1) % n]
            if (a[1] > M[1]) == (b[1] > M[1]):
                continue
            t = a[0] + (M[1] - a[1]) * (b[0] - a[0]) / (b[1] - a[1])
            if t >= M[0] and (best_t is None or t < best_t):
                best_t = t
                best_edge = i
                best_pt = (t, M[1])
        if best_edge is None:
            # hole outside outer? append unjoined (degenerate input)
            continue
        a = outer[best_edge]
        b = outer[(best_edge + 1) % n]
        P_idx = best_edge if a[0] > b[0] else (best_edge + 1) % n
        P = outer[P_idx]
        # reflex vertices inside triangle (M, I, P) -> pick min angle
        cand = P_idx
        Ix, Iy = best_pt
        for j in range(n):
            if j == P_idx:
                continue
            v = outer[j]
            prv = outer[(j - 1) % n]
            nxt = outer[(j + 1) % n]
            reflex = (
                _orient(prv[0], prv[1], v[0], v[1], nxt[0], nxt[1]) <= 0
            )
            if not reflex:
                continue
            if _point_in_tri(M, (Ix, Iy), P, v):
                # closer angular to +x axis wins; tie: closer to M
                def score(idx):
                    q = outer[idx]
                    dx, dy = q[0] - M[0], q[1] - M[1]
                    hyp = (dx * dx + dy * dy) ** 0.5 or 1.0
                    return (abs(dy) / hyp, dx * dx + dy * dy)

                if score(j) < score(cand):
                    cand = j
        P_idx = cand
        # splice: outer[..P_idx], hole[mi..], hole[..mi], outer[P_idx..]
        hole_cycle = [h[(mi + k) % len(h)] for k in range(len(h))]
        outer = (
            outer[: P_idx + 1]
            + hole_cycle
            + [h[mi]]
            + outer[P_idx:]
        )
    return outer


def _point_in_tri(a, b, c, p) -> bool:
    s1 = _orient(a[0], a[1], b[0], b[1], p[0], p[1])
    s2 = _orient(b[0], b[1], c[0], c[1], p[0], p[1])
    s3 = _orient(c[0], c[1], a[0], a[1], p[0], p[1])
    if _orient(a[0], a[1], b[0], b[1], c[0], c[1]) < 0:
        s1, s2, s3 = -s1, -s2, -s3
    return s1 >= 0 and s2 >= 0 and s3 >= 0


def _ear_clip(ring: list) -> list[tuple[int, int, int]]:
    """Triangulate a simple (possibly bridge-joined) CCW ring; returns
    index triangles into ``ring``."""
    n = len(ring)
    if n < 3:
        return []
    nxt = [(i + 1) % n for i in range(n)]
    prv = [(i - 1) % n for i in range(n)]
    tris = []
    alive = n
    i = 0
    guard = 0
    while alive > 3 and guard < 2 * n * n:
        guard += 1
        p, q, r = prv[i], i, nxt[i]
        a, b, c = ring[p], ring[q], ring[r]
        is_ear = False
        if _orient(a[0], a[1], b[0], b[1], c[0], c[1]) > 0:
            is_ear = True
            j = nxt[r]
            while j != p:
                v = ring[j]
                if (
                    (v[0] != a[0] or v[1] != a[1])
                    and (v[0] != b[0] or v[1] != b[1])
                    and (v[0] != c[0] or v[1] != c[1])
                    and _point_in_tri(a, b, c, v)
                ):
                    is_ear = False
                    break
                j = nxt[j]
        if is_ear:
            tris.append((p, q, r))
            nxt[p] = r
            prv[r] = p
            alive -= 1
            i = p
            guard = 0
        else:
            i = nxt[i]
    if alive == 3:
        p, q, r = prv[i], i, nxt[i]
        a, b, c = ring[p], ring[q], ring[r]
        if _orient(a[0], a[1], b[0], b[1], c[0], c[1]) > 0:
            tris.append((p, q, r))
    return tris


def constrained_delaunay_polygon(
    shell: np.ndarray, holes: list[np.ndarray]
):
    """Triangulate the polygon (shell minus holes).

    Returns (pts (m,2) float array of distinct vertices, tris list of
    (ia, ib, ic) CCW index triangles into pts)."""
    ring = _join_holes(
        [tuple(p) for p in shell], [[tuple(p) for p in h] for h in holes]
    )
    ear_tris = _ear_clip(ring)

    # collapse duplicated bridge vertices to canonical indices
    pt_ids: dict = {}
    pts: list = []

    def pid(p):
        k = (p[0], p[1])
        v = pt_ids.get(k)
        if v is None:
            v = len(pts)
            pt_ids[k] = v
            pts.append(k)
        return v

    tris = []
    for p, q, r in ear_tris:
        ia, ib, ic = pid(ring[p]), pid(ring[q]), pid(ring[r])
        if ia == ib or ib == ic or ic == ia:
            continue
        tris.append([ia, ib, ic])
    pts_arr = np.asarray(pts, dtype=np.float64)

    # constrained edges: boundary edges of shell + holes, keyed ONLY to
    # ids already assigned while registering triangles (pts_arr is
    # frozen — allocating here would key constraints to points the
    # triangulation doesn't have, leaving real boundary edges
    # unconstrained). A ring vertex absent from pt_ids appears only in
    # dropped degenerate (collinear) triangles, so the triangulation's
    # actual boundary segment connects its surviving neighbors: mark
    # consecutive *known* ring vertices, skipping through unknowns.
    constrained = set()
    n_ids_frozen = len(pts)

    def mark(rpts):
        ids = [pt_ids.get((float(p[0]), float(p[1]))) for p in rpts[:-1]]
        known = [i for i in ids if i is not None]
        if len(known) < 2:
            return
        m = len(known)
        for i in range(m):
            a, b = known[i], known[(i + 1) % m]
            if a != b:
                constrained.add((min(a, b), max(a, b)))

    sh = shell if (shell[0] == shell[-1]).all() else np.vstack([shell, shell[:1]])
    mark(sh)
    for h in holes:
        hh = h if (h[0] == h[-1]).all() else np.vstack([h, h[:1]])
        mark(hh)
    assert len(pts) == n_ids_frozen, "mark() must not allocate point ids"

    _lawson_flips(pts_arr, tris, constrained)
    return pts_arr, [tuple(t) for t in tris]


def _lawson_flips(pts, tris, constrained) -> None:
    """Flip non-constrained diagonals until locally Delaunay.

    Work-queue Lawson: every interior edge starts suspect; a flip
    re-enqueues only the four quad boundary edges, and the edge map is
    updated incrementally — no full-pass rebuilds, no fixed round cap.
    With exact incircle/orient predicates Lawson terminates (each flip
    strictly decreases the triangulation's angle vector), so the
    O(n^2)-proportional iteration bound is a pure safety net; hitting
    it raises rather than silently returning a non-Delaunay result.
    """
    from collections import deque

    em: dict = {}

    def ekey(u, v):
        return (u, v) if u < v else (v, u)

    def add_tri(ti):
        a, b, c = tris[ti]
        for u, v in ((a, b), (b, c), (c, a)):
            em.setdefault(ekey(u, v), set()).add(ti)

    def remove_tri(ti):
        a, b, c = tris[ti]
        for u, v in ((a, b), (b, c), (c, a)):
            k = ekey(u, v)
            s = em.get(k)
            if s is not None:
                s.discard(ti)
                if not s:
                    del em[k]

    for ti in range(len(tris)):
        add_tri(ti)

    queue = deque(k for k in em if k not in constrained)
    in_queue = set(queue)
    max_iter = 1000 + 6 * len(tris) * len(tris)
    it = 0
    while queue:
        it += 1
        if it > max_iter:
            raise RuntimeError(
                "constrained Delaunay flips did not converge "
                f"({it} iterations, {len(tris)} triangles)"
            )
        key = queue.popleft()
        in_queue.discard(key)
        users = em.get(key)
        if users is None or len(users) != 2:
            continue
        u, v = key
        t1, t2 = sorted(users)
        w1 = next(x for x in tris[t1] if x != u and x != v)
        w2 = next(x for x in tris[t2] if x != u and x != v)
        # incircle: flip if w2 inside circumcircle of (u, v, w1)
        a, b, c, d = pts[u], pts[v], pts[w1], pts[w2]
        # orient the (u,v,w1) triangle CCW for incircle sign
        if _orient(a[0], a[1], b[0], b[1], c[0], c[1]) < 0:
            a, b = b, a
            u2, v2 = v, u
        else:
            u2, v2 = u, v
        if _incircle(a[0], a[1], b[0], b[1], c[0], c[1], d[0], d[1]) > 0:
            # check flip quad convex: w1 and w2 on opposite sides
            o1 = _orient(
                pts[w1][0], pts[w1][1], pts[w2][0], pts[w2][1],
                pts[u][0], pts[u][1],
            )
            o2 = _orient(
                pts[w1][0], pts[w1][1], pts[w2][0], pts[w2][1],
                pts[v][0], pts[v][1],
            )
            if o1 == 0 or o2 == 0 or o1 == o2:
                continue
            remove_tri(t1)
            remove_tri(t2)
            tris[t1] = [w1, w2, u2]
            tris[t2] = [w2, w1, v2]
            # normalize orientation CCW
            for ti in (t1, t2):
                x, y, z = tris[ti]
                if (
                    _orient(
                        pts[x][0], pts[x][1], pts[y][0], pts[y][1],
                        pts[z][0], pts[z][1],
                    )
                    < 0
                ):
                    tris[ti] = [x, z, y]
            add_tri(t1)
            add_tri(t2)
            # the quad's outer edges become suspect again
            for q in (
                ekey(u, w1), ekey(u, w2), ekey(v, w1), ekey(v, w2)
            ):
                if q not in constrained and q not in in_queue:
                    queue.append(q)
                    in_queue.add(q)
