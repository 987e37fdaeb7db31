"""Distributed spatial join: the engine's flagship operator.

Two-phase plan (SURVEY §2.5, §3.1):

1. **global phase (native)** — both sides are assigned Hilbert tile
   cells: points get their containing tile via the JVM-native bitwise
   cell chain (zero python); polygons explode to every tile their
   envelope overlaps (pUDF producing an int array, then ``explode``).
   A Catalyst equijoin on ``cell`` plus a codegen'd bbox
   containment/overlap filter reproduces the reference's envelope
   short-circuit (``src/geom/Geometry.cpp:295``) *before* any python
   runs.
2. **local refine (pUDF)** — surviving candidate pairs cross the Arrow
   boundary once; the batch kernel factorizes the polygon column,
   decodes each distinct WKB once per batch (the distributed analogue
   of GEOS prepared geometries, ``src/geom/prep/PreparedPolygon.cpp``),
   and evaluates the vectorized ray-crossing locator.

Pair dedup: a point lives in exactly one tile, so point joins produce
no duplicates. (Polygon-polygon joins use reference-point dedup — see
``polygon_join``.)

Scale notes: the poly side is broadcast when small (Catalyst/AQE
decides); the skew knob is the hot-cell salting in ``salted`` mode —
hot cells are replicated on the build side and salted on the probe
side so one popular tile cannot pin a single task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geos_spark.functions.hilbert_native import (
    with_tile_cell,
    with_tile_cells_exploded,
)
from geos_spark.functions.st import DEFAULT_EXTENT

# Location codes (geom::Location)
_INTERIOR, _BOUNDARY, _EXTERIOR = 0, 1, 2

# predicate -> set of accepted point locations in the polygon
_POINT_PREDICATES = {
    "intersects": (_INTERIOR, _BOUNDARY),
    "covers": (_INTERIOR, _BOUNDARY),       # polygon covers point
    "coveredby": (_INTERIOR, _BOUNDARY),    # point coveredBy polygon
    "contains": (_INTERIOR,),               # polygon contains point
    "within": (_INTERIOR,),                 # point within polygon
    "touches": (_BOUNDARY,),
}


@pandas_udf(T.IntegerType())
def pip_refine(px: pd.Series, py: pd.Series, wkb: pd.Series) -> pd.Series:
    """Batch point-in-polygon location refine.

    Decodes each distinct polygon once per Arrow batch (prepared-
    geometry semantics), then runs the vectorized ray-crossing kernel
    over the (pair x segment) expansion.
    """
    import numpy as np

    from geos_spark.kernels.pip import locate_points
    from geos_spark.kernels.wkb import decode_polygons

    n = len(px)
    if n == 0:
        return pd.Series([], dtype="int32")
    codes, uniques = pd.factorize(wkb.map(bytes))
    pack, geom_offsets = decode_polygons(list(uniques))
    pts = np.column_stack([px.to_numpy(), py.to_numpy()])

    # expand: pair i targets geometry codes[i] -> packed polygons
    # geom_offsets[c]..geom_offsets[c+1] (multipolygons contribute >1)
    counts = geom_offsets[codes + 1] - geom_offsets[codes]
    pair_rep = np.repeat(np.arange(n), counts)
    cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
    intra = np.arange(int(counts.sum())) - np.repeat(cum, counts)
    poly_idx = np.repeat(geom_offsets[codes], counts) + intra

    loc = locate_points(pts, pack, pair_rep, poly_idx)
    # reduce multi-poly geometries: min location (0 beats 1 beats 2)
    out = np.full(n, _EXTERIOR, dtype=np.int64)
    np.minimum.at(out, pair_rep, loc.astype(np.int64))
    return pd.Series(out.astype("int32"))


def pip_refine_by_id(bc, id_order):
    """Factory: PIP refine where candidates carry only the polygon ID
    (8 bytes/row through Arrow instead of the full WKB). The polygon
    dim rides a SparkContext broadcast and is decoded into ONE
    PolygonPack per python worker, reused across every batch — the
    per-worker analogue of a shared prepared-geometry index.

    ``id_order`` is the sorted array of polygon ids; ``bc.value`` maps
    id -> wkb bytes."""

    state: dict = {}

    @pandas_udf(T.IntegerType())
    def _refine(px: pd.Series, py: pd.Series, pid: pd.Series) -> pd.Series:
        import numpy as np

        from geos_spark.kernels.pip import locate_points
        from geos_spark.kernels.wkb import decode_polygons

        n = len(px)
        if n == 0:
            return pd.Series([], dtype="int32")
        if "pack" not in state:
            d = bc.value
            pack, offs = decode_polygons([d[int(k)] for k in id_order])
            state["pack"] = pack
            state["offs"] = offs
            state["ids"] = np.asarray(id_order, dtype=np.int64)
        pack = state["pack"]
        geom_offsets = state["offs"]
        codes = np.searchsorted(
            state["ids"], pid.to_numpy(np.int64)
        )
        pts = np.column_stack([px.to_numpy(), py.to_numpy()])
        counts = geom_offsets[codes + 1] - geom_offsets[codes]
        pair_rep = np.repeat(np.arange(n), counts)
        cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
        intra = np.arange(int(counts.sum())) - np.repeat(cum, counts)
        poly_idx = np.repeat(geom_offsets[codes], counts) + intra
        loc = locate_points(pts, pack, pair_rep, poly_idx)
        out = np.full(n, _EXTERIOR, dtype=np.int64)
        np.minimum.at(out, pair_rep, loc.astype(np.int64))
        return pd.Series(out.astype("int32"))

    return _refine


_EDGES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("x1", T.DoubleType()),
            T.StructField("y1", T.DoubleType()),
            T.StructField("x2", T.DoubleType()),
            T.StructField("y2", T.DoubleType()),
        ]
    )
)


@pandas_udf(_EDGES_SCHEMA)
def _wkb_edges(wkb: pd.Series) -> pd.Series:
    """All boundary segments of each (multi)polygon as an array column
    (dim-table prep for the native_edges strategy)."""
    from geos_spark.kernels import geom as G
    from geos_spark.kernels.wkb import parse_wkb

    def _one(b):
        if b is None:
            return None
        g = parse_wkb(bytes(b))
        out = []
        for p in g.geoms():
            if p.type_id != G.POLYGON:
                continue
            for r in p.data:
                for i in range(len(r) - 1):
                    out.append(
                        {
                            "x1": float(r[i, 0]),
                            "y1": float(r[i, 1]),
                            "x2": float(r[i + 1, 0]),
                            "y2": float(r[i + 1, 1]),
                        }
                    )
        return out

    return wkb.map(_one)


def _native_pip_location(px: Column, py: Column, edges: Column) -> Column:
    """RayCrossingCounter (src/algorithm/RayCrossingCounter.cpp:
    130-192) as pure Catalyst higher-order-function expressions over
    an edge-array column — the whole locate stays inside whole-stage
    codegen. Double arithmetic (exact for integer-coordinate
    polygons); the prepared (pUDF) strategy keeps the robust
    orientation filter for degenerate float inputs."""

    def crossing(e):
        upward = (e["y1"] > py) & (e["y2"] <= py)
        downward = (e["y2"] > py) & (e["y1"] <= py)
        orient = (e["x2"] - e["x1"]) * (py - e["y1"]) - (
            e["y2"] - e["y1"]
        ) * (px - e["x1"])
        sign = F.when(e["y2"] < e["y1"], -orient).otherwise(orient)
        return (upward | downward) & (sign > 0)

    def on_boundary(e):
        at_end = (px == e["x2"]) & (py == e["y2"])
        horiz = (
            (e["y1"] == py) & (e["y2"] == py)
            & (px >= F.least(e["x1"], e["x2"]))
            & (px <= F.greatest(e["x1"], e["x2"]))
        )
        orient = (e["x2"] - e["x1"]) * (py - e["y1"]) - (
            e["y2"] - e["y1"]
        ) * (px - e["x1"])
        in_span = ((e["y1"] > py) & (e["y2"] <= py)) | (
            (e["y2"] > py) & (e["y1"] <= py)
        )
        return at_end | horiz | (in_span & (orient == 0))

    n_cross = F.size(F.filter(edges, crossing))
    on = F.exists(edges, on_boundary)
    return (
        F.when(on, F.lit(_BOUNDARY))
        .when(F.pmod(n_cross, F.lit(2)) == 1, F.lit(_INTERIOR))
        .otherwise(F.lit(_EXTERIOR))
    )


def _native_within_distance(
    px: Column, py: Column, edges: Column, distance: float
) -> Column:
    """Point within ``distance`` of a polygon, as pure Catalyst
    higher-order functions over the same ``__edges`` arrays the
    native_edges PIP strategy uses: ray-crossing parity (interior)
    OR some boundary segment within distance (point-to-segment
    squared distance with the closest-point parameterization of
    ``geos::algorithm::Distance::pointToSegment``,
    src/algorithm/Distance.cpp:60-100). Every multiply is written in
    exactly the order the SQL oracle uses, so membership decisions
    at the d^2 threshold agree bit-for-bit."""
    d2 = F.lit(float(distance) * float(distance))

    def crossing(e):
        upward = (e["y1"] > py) & (e["y2"] <= py)
        downward = (e["y2"] > py) & (e["y1"] <= py)
        orient = (e["x2"] - e["x1"]) * (py - e["y1"]) - (
            e["y2"] - e["y1"]
        ) * (px - e["x1"])
        sign = F.when(e["y2"] < e["y1"], -orient).otherwise(orient)
        return (upward | downward) & (sign > 0)

    def seg_near(e):
        # projection form: dist^2 = |p-a|^2 - t_raw^2/len2 inside the
        # segment span, |p-a|^2 / |p-b|^2 past the ends. One CASE, no
        # repeated closest-point subtree (Catalyst lambdas don't CSE,
        # so the naive clamp+closest-point form evaluates t four
        # times per edge).
        dx = e["x2"] - e["x1"]
        dy = e["y2"] - e["y1"]
        len2 = dx * dx + dy * dy
        t_raw = (px - e["x1"]) * dx + (py - e["y1"]) * dy
        pa2 = (px - e["x1"]) * (px - e["x1"]) + (py - e["y1"]) * (
            py - e["y1"]
        )
        pb2 = (px - e["x2"]) * (px - e["x2"]) + (py - e["y2"]) * (
            py - e["y2"]
        )
        dist2 = (
            F.when(t_raw <= 0, pa2)
            .when(t_raw >= len2, pb2)
            .otherwise(pa2 - t_raw * t_raw / len2)
        )
        return dist2 <= d2

    n_cross = F.size(F.filter(edges, crossing))
    return (F.pmod(n_cross, F.lit(2)) == 1) | F.exists(edges, seg_near)


def within_distance_join_polygons(
    points: DataFrame,
    polygons: DataFrame,
    distance: float,
    *,
    x_col: str = "x",
    y_col: str = "y",
    wkb_col: str = "wkb",
    bbox_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    level: int = 6,
    extent=DEFAULT_EXTENT,
    poly_id_col: str | None = None,
    broadcast_build: bool = True,
) -> DataFrame:
    """Within-distance join of points to POLYGONS — the native_edges
    zero-python strategy extended to distance (GEOSDistanceWithin for
    point-vs-polygonal operands, capi geos_c.h.in DistanceWithin).

    Global phase: each polygon explodes to every tile its d-expanded
    envelope overlaps; points join on their containing tile; a codegen
    expanded-bbox filter prunes. Refine: ``_native_within_distance``
    higher-order expressions over the boundary edge arrays — the whole
    plan stays inside whole-stage codegen, so it scales like
    pip_native (no Arrow boundary, no python workers)."""
    xmin, ymin, xmax, ymax = bbox_cols
    pts = with_tile_cell(points, x_col, y_col, level, extent, out="__cell")
    build = polygons.select(
        *([poly_id_col] if poly_id_col else []),
        *bbox_cols,
        _wkb_edges(F.col(wkb_col)).alias("__edges"),
    )
    polys = with_tile_cells_exploded(
        build, bbox_cols, level, extent, out="__cell", pad=distance
    )
    if broadcast_build:
        # the explode defeats size estimation (see point_in_polygon_join)
        polys = F.broadcast(polys)
    d = F.lit(float(distance))
    cand = pts.join(polys, "__cell").where(
        (F.col(x_col) >= F.col(xmin) - d)
        & (F.col(x_col) <= F.col(xmax) + d)
        & (F.col(y_col) >= F.col(ymin) - d)
        & (F.col(y_col) <= F.col(ymax) + d)
    )
    out = cand.where(
        _native_within_distance(
            F.col(x_col), F.col(y_col), F.col("__edges"), distance
        )
    ).drop("__cell", "__edges")
    if poly_id_col is not None:
        # re-attach remaining polygon columns (incl. wkb): output
        # contract matches point_in_polygon_join
        rest = polygons.drop(*bbox_cols)
        if len(rest.columns) > 1:
            out = out.join(F.broadcast(rest), poly_id_col)
    return out


def relate_refine(predicate: str):
    """Factory: pUDF evaluating a named DE-9IM predicate on WKB pairs.

    Each distinct WKB decodes once per batch; the predicate runs on
    the relate kernel (general path). ``predicate`` may also be a
    9-char DE-9IM pattern.
    """

    @pandas_udf(T.BooleanType())
    def _refine(wkb_a: pd.Series, wkb_b: pd.Series) -> pd.Series:
        from geos_spark.kernels import relate as R
        from geos_spark.kernels.wkb import parse_wkb

        ca, ua = pd.factorize(wkb_a.map(bytes))
        cb, ub = pd.factorize(wkb_b.map(bytes))
        ga = [parse_wkb(u) for u in ua]
        gb = [parse_wkb(u) for u in ub]
        if len(predicate) == 9:
            fn = lambda a, b: R.relate_pattern(a, b, predicate)  # noqa: E731
        elif predicate == "intersects":
            # vectorized fast path: for valid polygonal operands,
            # intersects == any segment crossing OR mutual vertex
            # containment — all numpy (blocked segment matrix +
            # stripe-indexed PIP), no per-pair IM computation
            fn = _polys_intersect_fast
        elif predicate in ("contains", "covers"):
            fb = getattr(R, predicate)
            fn = lambda a, b: _polys_superset_fast(a, b, fb)  # noqa: E731
        elif predicate in ("within", "coveredby"):
            fb = getattr(R, predicate)
            fn = lambda a, b: _polys_superset_fast(  # noqa: E731
                b, a, lambda x, y: fb(y, x)
            )
        elif predicate == "touches":
            fn = _polys_touches_fast
        elif predicate == "overlaps":
            fn = _polys_overlaps_fast
        else:
            fn = getattr(R, "equals_topo" if predicate == "equalstopo" else predicate)
        cache: dict[tuple[int, int], bool] = {}
        out = []
        for i, j in zip(ca, cb):
            k = (int(i), int(j))
            v = cache.get(k)
            if v is None:
                v = bool(fn(ga[i], gb[j]))
                cache[k] = v
            out.append(v)
        return pd.Series(out, dtype=bool)

    return _refine


def _polys_intersect_fast(ga, gb) -> bool:
    """Polygon-polygon intersects without the IM machinery: any
    boundary segment pair crosses, or one contains a vertex of the
    other (complete for valid polygons — if boundaries are disjoint
    and neither contains the other, they are disjoint). Falls back to
    the general relate for non-areal operands."""
    import numpy as np

    from geos_spark.kernels import geom as G
    from geos_spark.kernels import relate as R
    from geos_spark.kernels.scalars import _segments
    from geos_spark.kernels.segments import segments_intersect_any

    pa = [p for p in ga.geoms() if p.type_id == G.POLYGON and p.data]
    pb = [p for p in gb.geoms() if p.type_id == G.POLYGON and p.data]
    if not pa or not pb:
        return R.intersects(ga, gb)
    sa = _segments(ga)
    sb = _segments(gb)
    if len(sa) and len(sb) and segments_intersect_any(sa, sb):
        return True
    # one shell vertex per PART (a part can be contained while its
    # siblings are not, with no boundary crossing)
    va = np.asarray([p.data[0][0] for p in pa])
    vb = np.asarray([p.data[0][0] for p in pb])
    from geos_spark.kernels.pip import EXTERIOR

    if (R._locate_in_polys(va, pb) != EXTERIOR).any():
        return True
    return bool((R._locate_in_polys(vb, pa) != EXTERIOR).any())


def _areal_summary(ga, gb):
    """Blocked boundary-intersection summary for an areal pair.

    Returns (pa, pb, any_int, any_proper) with pa/pb the polygonal
    parts, any_int = any segment-pair intersection (incl. touches),
    any_proper = any transversal crossing (all four orientations
    strictly nonzero).  None when either operand has no areal part.
    Reference semantics: IntersectionMatrix.cpp:279-284 via the
    prepared-geometry shortcuts (PreparedPolygonContains.cpp).
    """
    import numpy as np

    from geos_spark.kernels import geom as G
    from geos_spark.kernels.orientation import orientation_index
    from geos_spark.kernels.scalars import _segments
    from geos_spark.kernels.segments import _env_overlap, intersect_pairs

    # GC parts may overlap each other (RelateNG union semantics), so
    # a segment crossing there can be interior to the union and the
    # boundary reasoning below is unsound — purely polygonal operands
    # only (valid MultiPolygon parts have disjoint interiors)
    if ga.type_id not in (G.POLYGON, G.MULTIPOLYGON) or gb.type_id not in (
        G.POLYGON,
        G.MULTIPOLYGON,
    ):
        return None
    pa = [p for p in ga.geoms() if p.type_id == G.POLYGON and p.data]
    pb = [p for p in gb.geoms() if p.type_id == G.POLYGON and p.data]
    if not pa or not pb:
        return None
    sa = _segments(ga)
    sb = _segments(gb)
    any_int = False
    any_proper = False
    BLOCK = 512
    for i in range(0, len(sa), BLOCK):
        ca = sa[i : i + BLOCK]
        for j in range(0, len(sb), BLOCK):
            cb = sb[j : j + BLOCK]
            ia = np.repeat(np.arange(len(ca)), len(cb))
            ib = np.tile(np.arange(len(cb)), len(ca))
            A, B = ca[ia], cb[ib]
            env = _env_overlap(A, B)
            if not env.any():
                continue
            cls = intersect_pairs(A[env], B[env])
            if (cls > 0).any():
                any_int = True
                Ae, Be = A[env], B[env]
                o1 = orientation_index(
                    Ae[:, 0], Ae[:, 1], Ae[:, 2], Ae[:, 3], Be[:, 0], Be[:, 1]
                )
                o2 = orientation_index(
                    Ae[:, 0], Ae[:, 1], Ae[:, 2], Ae[:, 3], Be[:, 2], Be[:, 3]
                )
                o3 = orientation_index(
                    Be[:, 0], Be[:, 1], Be[:, 2], Be[:, 3], Ae[:, 0], Ae[:, 1]
                )
                o4 = orientation_index(
                    Be[:, 0], Be[:, 1], Be[:, 2], Be[:, 3], Ae[:, 2], Ae[:, 3]
                )
                if (
                    (o1.astype(np.int8) * o2.astype(np.int8) < 0)
                    & (o3.astype(np.int8) * o4.astype(np.int8) < 0)
                ).any():
                    any_proper = True
                    return pa, pb, True, True
    return pa, pb, any_int, any_proper


def _polys_superset_fast(ga, gb, fallback):
    """Decide gb ⊆ ga (contains/covers for valid areal pairs) without
    the IM machinery; touch-only pairs fall back to ``fallback``.

    With zero boundary intersections each part of B is wholly inside
    or outside A (one shell vertex decides), and the only other leak
    is a hole of A poking into B's interior (one vertex per A hole
    ring decides).  A transversal boundary crossing puts part of B's
    closure in ext(A) -> False."""
    import numpy as np

    from geos_spark.kernels import relate as R
    from geos_spark.kernels.pip import EXTERIOR, INTERIOR

    s = _areal_summary(ga, gb)
    if s is None:
        return fallback(ga, gb)
    pa, pb, any_int, any_proper = s
    if any_proper:
        return False
    if not any_int:
        vb = np.asarray([p.data[0][0] for p in pb])
        locs = R._locate_in_polys(vb, pa)
        if (locs == EXTERIOR).any():
            return False
        hole_pts = [r[0] for p in pa for r in p.data[1:]]
        if hole_pts and (
            R._locate_in_polys(np.asarray(hole_pts), pb) == INTERIOR
        ).any():
            return False
        return True
    return fallback(ga, gb)


def _polys_touches_fast(ga, gb):
    """touches() for areal pairs: a transversal crossing or interior
    overlap -> False; disjoint/contained with no boundary contact ->
    False; boundary-contact-only pairs go to the full relate."""
    from geos_spark.kernels import relate as R

    s = _areal_summary(ga, gb)
    if s is None:
        return R.touches(ga, gb)
    pa, pb, any_int, any_proper = s
    if any_proper:
        return False
    if not any_int:
        return False
    return R.touches(ga, gb)


def _polys_overlaps_fast(ga, gb):
    """overlaps() for areal pairs: a transversal crossing proves
    int∩int, int(B)∩ext(A) and int(A)∩ext(B) all nonempty -> True;
    with no boundary contact, decide from per-part containment (a
    hole of one poking into the other's interior breaks subset-ness
    without any boundary contact)."""
    import numpy as np

    from geos_spark.kernels import relate as R
    from geos_spark.kernels.pip import INTERIOR

    s = _areal_summary(ga, gb)
    if s is None:
        return R.overlaps(ga, gb)
    pa, pb, any_int, any_proper = s
    if any_proper:
        return True
    if not any_int:
        vb = np.asarray([p.data[0][0] for p in pb])
        va = np.asarray([p.data[0][0] for p in pa])
        lb = R._locate_in_polys(vb, pa)
        la = R._locate_in_polys(va, pb)
        int_int = (lb == INTERIOR).any() or (la == INTERIOR).any()
        if not int_int:
            return False
        a_holes = [r[0] for p in pa for r in p.data[1:]]
        b_holes = [r[0] for p in pb for r in p.data[1:]]
        b_sub = (lb == INTERIOR).all() and not (
            a_holes
            and (
                R._locate_in_polys(np.asarray(a_holes), pb) == INTERIOR
            ).any()
        )
        a_sub = (la == INTERIOR).all() and not (
            b_holes
            and (
                R._locate_in_polys(np.asarray(b_holes), pa) == INTERIOR
            ).any()
        )
        return not b_sub and not a_sub
    return R.overlaps(ga, gb)


def polygon_join(
    a: DataFrame,
    b: DataFrame,
    predicate: str = "intersects",
    *,
    a_bbox: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    b_bbox: tuple[str, str, str, str] = ("bxmin", "bymin", "bxmax", "bymax"),
    a_wkb: str = "wkb",
    b_wkb: str = "bwkb",
    level: int = 6,
    extent: tuple[float, float, float, float] = DEFAULT_EXTENT,
) -> DataFrame:
    """Generic geometry-geometry spatial join (both sides non-point).

    Both sides explode to overlapping tiles; candidates pass the
    envelope short-circuit, then the reference-point rule keeps each
    pair only in the tile containing (max(xmin_a, xmin_b),
    max(ymin_a, ymin_b)) — no duplicate pairs, no second distinct
    shuffle (SURVEY §3.1 dedup). Refine = relate-kernel pUDF.
    """
    minx, miny, maxx, maxy = extent
    n = 1 << level
    sx = (maxx - minx) / n
    sy = (maxy - miny) / n
    axmin, aymin, axmax, aymax = a_bbox
    bxmin, bymin, bxmax, bymax = b_bbox

    ea = with_tile_cells_exploded(
        a, a_bbox, level, extent, out="__cell", keep_grid=True
    )
    eb = with_tile_cells_exploded(b, b_bbox, level, extent, out="__cell")

    cand = ea.join(eb, "__cell").where(
        (F.col(axmin) <= F.col(bxmax))
        & (F.col(bxmin) <= F.col(axmax))
        & (F.col(aymin) <= F.col(bymax))
        & (F.col(bymin) <= F.col(aymax))
    )
    # reference-point dedup (codegen'd, no shuffle)
    rx = F.greatest(F.col(axmin), F.col(bxmin))
    ry = F.greatest(F.col(aymin), F.col(bymin))
    rgx = F.greatest(
        F.lit(0), F.least(F.lit(n - 1), F.floor((rx - F.lit(minx)) / F.lit(sx)))
    )
    rgy = F.greatest(
        F.lit(0), F.least(F.lit(n - 1), F.floor((ry - F.lit(miny)) / F.lit(sy)))
    )
    cand = cand.where((F.col("gx") == rgx) & (F.col("gy") == rgy))

    refined = cand.withColumn(
        "__ok", relate_refine(predicate)(F.col(a_wkb), F.col(b_wkb))
    )
    return (
        refined.where(F.col("__ok"))
        .drop("__ok", "__cell", "gx", "gy")
    )


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    predicate: str = "intersects",
    *,
    x_col: str = "x",
    y_col: str = "y",
    wkb_col: str = "wkb",
    bbox_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    level: int = 6,
    extent: tuple[float, float, float, float] = DEFAULT_EXTENT,
    keep_location: bool = False,
    salt: int = 0,
    broadcast_build: bool = True,
    poly_id_col: str | None = None,
    strategy: str = "prepared",
) -> DataFrame:
    """Join points to polygons on a spatial predicate.

    Returns all columns of both inputs (plus ``location`` if
    requested). Inputs must not share column names.

    ``salt > 0`` enables explicit hot-cell salting for shuffle joins
    of two large sides: the probe side adds a deterministic salt in
    [0, salt) and the build side replicates each cell row ``salt``
    times, so one dense tile fans out over ``salt`` shuffle
    partitions instead of pinning a single task. (With a broadcastable
    build side salting is unnecessary — there is no shuffle — and AQE
    skew-join remains on as the backstop.)
    """
    if predicate not in _POINT_PREDICATES:
        raise ValueError(
            f"unsupported point predicate {predicate!r}; "
            f"one of {sorted(_POINT_PREDICATES)}"
        )
    accepted = _POINT_PREDICATES[predicate]

    xmin, ymin, xmax, ymax = bbox_cols
    pts = with_tile_cell(points, x_col, y_col, level, extent, out="__cell")

    # slim-build path: a broadcastable polygon dim with an id column
    # never ships WKB through the join or the Arrow boundary — the
    # candidates carry (x, y, poly_id); the geometry rides a python
    # broadcast decoded once per worker. Cuts shuffled+Arrow bytes per
    # candidate ~10x, the dominant cost at memory-bandwidth-bound
    # parallelism.
    slim = poly_id_col is not None and broadcast_build and salt == 0
    bc = None
    id_order = None
    if strategy == "native_edges":
        # physical strategy for dim-sized polygon tables: the polygon
        # boundaries become an edge-array column and the whole locate
        # runs as Catalyst higher-order functions — zero python in the
        # hot path, so the join scales like any JVM compute job
        build = polygons.select(
            *(
                [poly_id_col] if poly_id_col else []
            ),
            *bbox_cols,
            _wkb_edges(F.col(wkb_col)).alias("__edges"),
        )
        slim = poly_id_col is not None
    elif slim:
        rows = polygons.select(poly_id_col, wkb_col).collect()
        mapping = {int(r[0]): bytes(r[1]) for r in rows}
        id_order = sorted(mapping)
        sc = polygons.sparkSession.sparkContext
        bc = sc.broadcast(mapping)
        build = polygons.select(poly_id_col, *bbox_cols)
    else:
        build = polygons

    polys = with_tile_cells_exploded(
        build, bbox_cols, level, extent, out="__cell"
    )

    # the exploded build side defeats Catalyst's size estimation (an
    # explode's output size is unknown), which silently degrades the
    # plan to a sort-merge join that shuffles the full probe side.
    # Broadcast explicitly when the build side is dimension-sized; for
    # large-large joins pass broadcast_build=False (+ salt for skew).
    if broadcast_build and salt == 0:
        polys = F.broadcast(polys)

    join_keys = ["__cell"]
    if salt > 0:
        pts = pts.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(F.col(x_col), F.col(y_col)), F.lit(salt)
            ),
        )
        polys = polys.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        join_keys.append("__salt")

    # global phase: cell equijoin + envelope short-circuit (codegen)
    cand = pts.join(polys, join_keys).where(
        (F.col(x_col) >= F.col(xmin))
        & (F.col(x_col) <= F.col(xmax))
        & (F.col(y_col) >= F.col(ymin))
        & (F.col(y_col) <= F.col(ymax))
    )

    if strategy == "native_edges":
        loc_expr = _native_pip_location(
            F.col(x_col), F.col(y_col), F.col("__edges")
        )
    elif slim:
        loc_expr = pip_refine_by_id(bc, id_order)(
            F.col(x_col), F.col(y_col), F.col(poly_id_col)
        )
    else:
        loc_expr = pip_refine(F.col(x_col), F.col(y_col), F.col(wkb_col))
    if keep_location:
        refined = cand.withColumn("location", loc_expr)
        out = refined.where(F.col("location").isin(list(accepted)))
    else:
        # filter directly on the pUDF: withColumn + where would make
        # Catalyst evaluate the python UDF twice (once in the filter,
        # once in the projection that is then dropped)
        out = cand.where(loc_expr.isin(list(accepted)))
    out = out.drop("__cell", "__salt", "__edges")
    if slim:
        # re-attach the remaining polygon columns (incl. wkb) so the
        # output contract is unchanged — a broadcast equijoin on the
        # id over the (small) result set
        rest = polygons.drop(*bbox_cols)
        if len(rest.columns) > 1:
            out = out.join(F.broadcast(rest), poly_id_col)
    return out
