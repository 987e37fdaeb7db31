"""Maximum inscribed circle and largest empty circle.

Re-derivations of the reference's branch-and-bound grid searches:

- ``src/algorithm/construct/MaximumInscribedCircle.cpp``: successive
  quad-tree refinement of the polygon envelope, cells prioritized by
  max possible boundary distance (dist + hSize*sqrt(2)), pruned when
  the potential improvement is below tolerance.
- ``src/algorithm/construct/LargestEmptyCircle.cpp``: same search over
  the boundary envelope with the signed constraint distance (negative
  outside the boundary, else distance to the obstacles).

Point-to-geometry distance uses a vectorized segment/point scan (the
role of the reference's IndexedFacetDistance).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from geos_spark.kernels import geom as G

_SQRT2 = math.sqrt(2.0)


class _FacetDistance:
    """Vectorized min distance from a query point to a geometry's
    facets (segments + isolated points)."""

    def __init__(self, g: G.Geom):
        from geos_spark.kernels.scalars import _segments

        self.segs = _segments(g)
        pts = [p.data for p in g.geoms() if p.type_id == G.POINT and len(p.data)]
        self.pts = (
            np.concatenate(pts) if pts else np.zeros((0, 2), dtype=np.float64)
        )

    def distance(self, x: float, y: float) -> float:
        best = math.inf
        s = self.segs
        if len(s):
            dx = s[:, 2] - s[:, 0]
            dy = s[:, 3] - s[:, 1]
            l2 = dx * dx + dy * dy
            t = np.zeros(len(s))
            nz = l2 > 0
            t[nz] = ((x - s[nz, 0]) * dx[nz] + (y - s[nz, 1]) * dy[nz]) / l2[nz]
            t = np.clip(t, 0.0, 1.0)
            qx = s[:, 0] + t * dx
            qy = s[:, 1] + t * dy
            d2 = (x - qx) ** 2 + (y - qy) ** 2
            k = int(np.argmin(d2))
            best = math.sqrt(float(d2[k]))
            self._last = (float(qx[k]), float(qy[k]))
        if len(self.pts):
            d2p = (self.pts[:, 0] - x) ** 2 + (self.pts[:, 1] - y) ** 2
            k = int(np.argmin(d2p))
            d = math.sqrt(float(d2p[k]))
            if d < best:
                best = d
                self._last = (float(self.pts[k, 0]), float(self.pts[k, 1]))
        return best

    def nearest_point(self, x: float, y: float):
        self.distance(x, y)
        return self._last


def _max_iterations(env, tol: float) -> int:
    """MaximumInscribedCircle::computeMaximumIterations."""
    x0, y0, x1, y1 = env
    diam = math.hypot(x1 - x0, y1 - y0)
    ncells = diam / tol if tol > 0 else 1.0
    factor = int(math.log(ncells)) if ncells > 1 else 1
    if factor < 1:
        factor = 1
    return 2000 + 2000 * factor


def _locator(polygonal: G.Geom):
    from geos_spark.kernels.pip import EXTERIOR, PolygonPack, locate_points

    polys = [
        p.data for p in polygonal.geoms() if p.type_id == G.POLYGON and p.data
    ]
    pack = PolygonPack.from_rings(polys)
    n = len(polys)

    def locate_is_outside(x: float, y: float) -> bool:
        pts = np.array([[x, y]], dtype=np.float64)
        loc = locate_points(
            pts, pack,
            np.zeros(n, dtype=np.int64), np.arange(n, dtype=np.int64),
        )
        return bool((loc == EXTERIOR).all())

    return locate_is_outside


def maximum_inscribed_circle(polygonal: G.Geom, tolerance: float):
    """-> (center (x,y), radius_point (x,y)). MIC of a polygonal
    geometry to within ``tolerance``."""
    from geos_spark.kernels.scalars import geom_area, geom_boundary, interior_point

    if polygonal.type_id not in (G.POLYGON, G.MULTIPOLYGON):
        raise ValueError("Input must be a Polygon or MultiPolygon")
    if polygonal.is_empty:
        raise ValueError("Empty input is not supported")
    if geom_area(polygonal) == 0.0:
        c = tuple(map(float, polygonal.all_coords()[0]))
        return c, c
    if tolerance <= 0:
        raise ValueError("Tolerance must be positive")

    fd = _FacetDistance(geom_boundary(polygonal))
    is_outside = _locator(polygonal)

    def dist_to_boundary(x: float, y: float) -> float:
        d = fd.distance(x, y)
        return -d if is_outside(x, y) else d

    x0, y0, x1, y1 = polygonal.envelope()
    cell_size = max(x1 - x0, y1 - y0)
    heap: list = []
    counter = 0

    def push(x, y, h):
        nonlocal counter
        d = dist_to_boundary(x, y)
        heapq.heappush(heap, (-(d + h * _SQRT2), counter, x, y, h, d))
        counter += 1

    if cell_size > 0:
        push((x0 + x1) / 2.0, (y0 + y1) / 2.0, cell_size / 2.0)

    ix, iy = interior_point(polygonal)
    far = (float(ix), float(iy), 0.0, dist_to_boundary(ix, iy))

    max_iter = _max_iterations(polygonal.envelope(), tolerance)
    it = 0
    while heap and it < max_iter:
        negmax, _, cx, cy, h, d = heapq.heappop(heap)
        it += 1
        max_d = -negmax
        if max_d < far[3]:
            break
        if d > far[3]:
            far = (cx, cy, h, d)
        if max_d - far[3] > tolerance:
            h2 = h / 2.0
            push(cx - h2, cy - h2, h2)
            push(cx + h2, cy - h2, h2)
            push(cx - h2, cy + h2, h2)
            push(cx + h2, cy + h2, h2)
    center = (far[0], far[1])
    radius_pt = fd.nearest_point(*center)
    return center, radius_pt


def largest_empty_circle(
    obstacles: G.Geom, boundary: G.Geom | None, tolerance: float
):
    """-> (center (x,y), radius_point (x,y)). LEC among obstacles,
    center constrained to the boundary (default: obstacles' convex
    hull)."""
    from geos_spark.kernels.scalars import (
        convex_hull,
        geom_boundary,
        geom_centroid,
    )

    if obstacles.is_empty:
        raise ValueError("Empty obstacles geometry is not supported")
    if boundary is None or boundary.is_empty:
        boundary = convex_hull(obstacles)

    if boundary.dimension() < 2:
        c = tuple(map(float, obstacles.all_coords()[0]))
        return c, c

    obstacle_fd = _FacetDistance(obstacles)
    boundary_fd = _FacetDistance(geom_boundary(boundary))
    is_outside = _locator(boundary)

    def dist_to_constraints(x: float, y: float) -> float:
        if is_outside(x, y):
            return -boundary_fd.distance(x, y)
        return obstacle_fd.distance(x, y)

    x0, y0, x1, y1 = boundary.envelope()
    cell_size = max(x1 - x0, y1 - y0)
    heap: list = []
    counter = 0

    def push(x, y, h):
        nonlocal counter
        d = dist_to_constraints(x, y)
        heapq.heappush(heap, (-(d + h * _SQRT2), counter, x, y, h, d))
        counter += 1

    if cell_size > 0:
        push((x0 + x1) / 2.0, (y0 + y1) / 2.0, cell_size / 2.0)

    cx0, cy0 = geom_centroid(obstacles)
    far = (float(cx0), float(cy0), 0.0, dist_to_constraints(cx0, cy0))

    max_iter = _max_iterations(boundary.envelope(), tolerance)
    it = 0
    while heap and it < max_iter:
        negmax, _, cx, cy, h, d = heapq.heappop(heap)
        it += 1
        max_d = -negmax
        if d > far[3]:
            far = (cx, cy, h, d)
        # mayContainCircleCenter (LargestEmptyCircle.cpp:118-151)
        if d + h * _SQRT2 < 0.0:
            continue  # fully outside the boundary
        if d < 0.0:
            refine = max_d > tolerance
        else:
            refine = max_d - far[3] > tolerance
        if refine:
            h2 = h / 2.0
            push(cx - h2, cy - h2, h2)
            push(cx + h2, cy - h2, h2)
            push(cx - h2, cy + h2, h2)
            push(cx + h2, cy + h2, h2)
    center = (far[0], far[1])
    radius_pt = obstacle_fd.nearest_point(*center)
    return center, radius_pt
