"""Z/M population of overlay results — the reference's OverlayNG Z
handling re-expressed as a post-pass.

GEOS threads Z/M through noding (input vertices keep their ordinate,
intersection points are interpolated along both parent segments —
``include/geos/algorithm/Interpolate.h``) and back-fills whatever is
still NaN from a 3x3 grid of per-cell Z averages over the union
envelope (``src/operation/overlayng/ElevationModel.cpp``,
``OverlayNG::getResult`` at ``src/operation/overlayng/OverlayNG.cpp:150-199``).

This engine's overlay kernel is strictly XY, so the same three tiers
run as a post-pass over the finished result instead:

1. vertex match — a result vertex XY-equal to an input vertex takes
   the first non-NaN input ordinate (``Interpolate::zGet``);
2. segment interpolation — a result vertex lying exactly on an input
   segment (robust orientation == 0) interpolates along it; when both
   inputs contribute, the two values average
   (``Interpolate::interpolate<Ord,C1,C2>``);
3. elevation model (Z only) — remaining NaNs fill from the 3x3
   average grid, exactly the reference's cell/average semantics
   (including the ring-closing duplicate vertex counting twice).

The pass is a no-op unless an input declares the channel, so the 2D
hot paths never pay for it. Verified against the reference's own
OverlayNGZTest.cpp suite (tests/test_overlay_z.py).
"""

from __future__ import annotations

import math

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.orientation import _orientation_exact

_NAN = float("nan")


# ----------------------------------------------------------------------
# ElevationModel (ElevationModel.cpp:84-205; DEFAULT_CELL_NUM = 3)
# ----------------------------------------------------------------------


class ElevationModel:
    CELLS = 3

    def __init__(self, extent: tuple[float, float, float, float]):
        self.x0, self.y0, x1, y1 = extent
        self.nx = self.ny = self.CELLS
        self.csx = (x1 - self.x0) / self.nx
        self.csy = (y1 - self.y0) / self.ny
        if self.csx <= 0.0:
            self.nx = 1
        if self.csy <= 0.0:
            self.ny = 1
        self.sum = np.zeros((self.nx, self.ny))
        self.cnt = np.zeros((self.nx, self.ny), dtype=np.int64)
        self.has_value = False
        self.avg = _NAN

    def _cell(self, x: float, y: float) -> tuple[int, int]:
        ix = iy = 0
        if self.nx > 1:
            ix = min(max(int((x - self.x0) / self.csx), 0), self.nx - 1)
        if self.ny > 1:
            iy = min(max(int((y - self.y0) / self.csy), 0), self.ny - 1)
        return ix, iy

    def add_geom(self, g: G.Geom) -> None:
        """Every coordinate of every Z-declared sequence, including the
        ring-closing duplicate (the reference's CoordinateSequenceFilter
        walks the raw sequence, ElevationModel.cpp:106-142)."""
        for coords, zs, _ in _leaf_seqs(g):
            if zs is None:
                continue
            for i in range(len(coords)):
                z = zs[i]
                if not math.isnan(z):
                    self.has_value = True
                    ix, iy = self._cell(coords[i, 0], coords[i, 1])
                    self.sum[ix, iy] += z
                    self.cnt[ix, iy] += 1

    def _init_avg(self) -> None:
        nz = self.cnt > 0
        if nz.any():
            self.avg = float(
                (self.sum[nz] / self.cnt[nz]).sum() / nz.sum()
            )

    def get_z(self, x: float, y: float) -> float:
        if math.isnan(self.avg):
            self._init_avg()
        ix, iy = self._cell(x, y)
        if self.cnt[ix, iy] == 0:
            return self.avg
        return float(self.sum[ix, iy] / self.cnt[ix, iy])


# ----------------------------------------------------------------------
# Leaf walking
# ----------------------------------------------------------------------


def _leaf_seqs(g: G.Geom):
    """Yield (coords(k,2), zs|None, ms|None) per leaf sequence."""
    if g.type_id in (G.POINT, G.LINESTRING, G.CIRCULARSTRING):
        yield g.data, g.zs, g.ms
    elif g.type_id == G.POLYGON:
        nr = len(g.data)
        zl = g.zs if g.zs is not None else [None] * nr
        ml = g.ms if g.ms is not None else [None] * nr
        for r, z, m in zip(g.data, zl, ml):
            yield r, z, m
    else:
        for p in g.data:
            yield from _leaf_seqs(p)


def _vertex_map(g: G.Geom, attr_idx: int) -> dict:
    """(x, y) -> first non-NaN ordinate over the input's vertices."""
    out: dict = {}
    for coords, zs, ms in _leaf_seqs(g):
        ch = zs if attr_idx == 0 else ms
        if ch is None:
            continue
        for i in range(len(coords)):
            v = ch[i]
            if math.isnan(v):
                continue
            k = (float(coords[i, 0]), float(coords[i, 1]))
            if k not in out:
                out[k] = float(v)
    return out


def _segment_list(g: G.Geom, attr_idx: int) -> list:
    """Linework segments (x1,y1,v1,x2,y2,v2) from channel-declared
    sequences (v may be NaN; Interpolate's NaN rules handle it)."""
    segs = []
    for coords, zs, ms in _leaf_seqs(g):
        ch = zs if attr_idx == 0 else ms
        if ch is None or len(coords) < 2:
            continue
        for i in range(len(coords) - 1):
            segs.append(
                (
                    float(coords[i, 0]),
                    float(coords[i, 1]),
                    float(ch[i]),
                    float(coords[i + 1, 0]),
                    float(coords[i + 1, 1]),
                    float(ch[i + 1]),
                )
            )
    return segs


# ----------------------------------------------------------------------
# Interpolation (Interpolate.h:30-85)
# ----------------------------------------------------------------------


def _interp_seg(px: float, py: float, seg) -> float:
    """Interpolate::interpolate(p, p1, p2): NaN endpoints fall back to
    the other; exact endpoint matches return that value; flat segments
    return p1's; else linear by distance fraction."""
    x1, y1, v1, x2, y2, v2 = seg
    if math.isnan(v1):
        return v2
    if math.isnan(v2):
        return v1
    if px == x1 and py == y1:
        return v1
    if px == x2 and py == y2:
        return v2
    dv = v2 - v1
    if dv == 0.0:
        return v1
    seglen = (x2 - x1) ** 2 + (y2 - y1) ** 2
    plen = (px - x1) ** 2 + (py - y1) ** 2
    return v1 + dv * math.sqrt(plen / seglen)


def _on_segment(px: float, py: float, seg) -> bool:
    x1, y1, _, x2, y2, _ = seg
    if not (
        min(x1, x2) <= px <= max(x1, x2)
        and min(y1, y2) <= py <= max(y1, y2)
    ):
        return False
    if x1 == x2 and y1 == y2:
        return px == x1 and py == y1
    return _orientation_exact(x1, y1, x2, y2, px, py) == 0


def _interp_input(px: float, py: float, segs) -> float:
    """First containing segment's interpolation (the reference uses
    the single noded parent segment; any containing input segment
    yields the same value for a strictly interior point)."""
    for seg in segs:
        if _on_segment(px, py, seg):
            v = _interp_seg(px, py, seg)
            if not math.isnan(v):
                return v
    return _NAN


# ----------------------------------------------------------------------
# The post-pass
# ----------------------------------------------------------------------


def populate_zm(res: G.Geom, a: G.Geom, b: G.Geom | None) -> G.Geom:
    """Rebuild ``res`` (in place) with Z/M channels populated from the
    overlay inputs, iff an input declares the channel. Mirrors
    OverlayNG::getResult ordering: per-vertex zGet / interpolate during
    noding, then ElevationModel::populateZ for leftover NaN Z."""
    want_z = a.has_z or (b is not None and b.has_z)
    want_m = a.has_m or (b is not None and b.has_m)
    if not want_z and not want_m:
        return res

    inputs = [a] + ([b] if b is not None else [])
    chans = []
    if want_z:
        chans.append(0)
    if want_m:
        chans.append(1)
    vmaps = {c: [_vertex_map(g, c) for g in inputs] for c in chans}
    slists = {c: [_segment_list(g, c) for g in inputs] for c in chans}

    elev = None
    if want_z:
        env = [math.inf, math.inf, -math.inf, -math.inf]
        for g in inputs:
            if g.is_empty:
                continue
            e = g.envelope()
            env[0] = min(env[0], e[0])
            env[1] = min(env[1], e[1])
            env[2] = max(env[2], e[2])
            env[3] = max(env[3], e[3])
        elev = ElevationModel(tuple(env))
        for g in inputs:
            elev.add_geom(g)

    def value(px: float, py: float, c: int) -> float:
        # tier 1: vertex match, first non-NaN input (Interpolate::zGet)
        for vm in vmaps[c]:
            v = vm.get((px, py))
            if v is not None:
                return v
        # tier 2: per-input segment interpolation, averaged when both
        # contribute (Interpolate::interpolate<Ord,C1,C2>)
        vals = [
            _interp_input(px, py, sl) for sl in slists[c]
        ]
        vals = [v for v in vals if not math.isnan(v)]
        if vals:
            return sum(vals) / len(vals)
        # tier 3: elevation model (Z only)
        if c == 0 and elev is not None and elev.has_value:
            return elev.get_z(px, py)
        return _NAN

    def fill(g: G.Geom) -> None:
        if g.type_id in (G.POINT, G.LINESTRING, G.CIRCULARSTRING):
            n = len(g.data)
            if want_z:
                g.zs = np.array(
                    [value(g.data[i, 0], g.data[i, 1], 0) for i in range(n)]
                )
            if want_m:
                g.ms = np.array(
                    [value(g.data[i, 0], g.data[i, 1], 1) for i in range(n)]
                )
        elif g.type_id == G.POLYGON:
            if want_z:
                g.zs = [
                    np.array(
                        [value(r[i, 0], r[i, 1], 0) for i in range(len(r))]
                    )
                    for r in g.data
                ]
            if want_m:
                g.ms = [
                    np.array(
                        [value(r[i, 0], r[i, 1], 1) for i in range(len(r))]
                    )
                    for r in g.data
                ]
        else:
            for p in g.data:
                fill(p)

    fill(res)
    return res


def overlay_zm(a: G.Geom, b: G.Geom, op: int) -> G.Geom:
    """overlay_robust + the reference's Z/M population
    (OverlayNG::getResult elevation-model pass). XY inputs take the
    exact overlay_robust path with zero extra work."""
    from geos_spark.kernels.overlay import overlay_robust

    res = overlay_robust(a, b, op)
    return populate_zm(res, a, b)
