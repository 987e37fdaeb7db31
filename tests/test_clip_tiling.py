"""Clip-by-rect kernel + tile materialization tests.

Kernel: hand-computed rectangle clips plus the partition invariant
(fragment areas over all tiles sum to the polygon area — the defining
property of a clip-based tiling). Operator: distributed results match
the local kernel brute force exactly."""

import numpy as np
import pytest

from geos_spark.kernels import geom as G
from geos_spark.kernels.clip import clip_geom, clip_line, clip_ring
from geos_spark.kernels.scalars import geom_area, ring_signed_area
from geos_spark.kernels.wkt import parse_wkt

SQUARE = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")


def test_clip_ring_basic():
    r = clip_ring(SQUARE.data[0], 5, 5, 20, 20)
    assert abs(ring_signed_area(r)) == 25.0


def test_clip_fully_inside():
    out = clip_geom(SQUARE, -5, -5, 20, 20)
    assert geom_area(out) == 100.0


def test_clip_disjoint():
    out = clip_geom(SQUARE, 20, 20, 30, 30)
    assert out.is_empty


def test_clip_concave_star_partition_invariant():
    from geos_spark.sources.pages import star_vertices

    for p in (0, 7, 100, 255):
        star = G.Geom(G.POLYGON, [star_vertices(p)])
        total = geom_area(star)
        xmin, ymin, xmax, ymax = star.envelope()
        # 4x4 tile grid over the envelope
        acc = 0.0
        for i in range(4):
            for j in range(4):
                x0 = xmin + (xmax - xmin) * i / 4
                x1 = xmin + (xmax - xmin) * (i + 1) / 4
                y0 = ymin + (ymax - ymin) * j / 4
                y1 = ymin + (ymax - ymin) * (j + 1) / 4
                acc += geom_area(clip_geom(star, x0, y0, x1, y1))
        assert acc == pytest.approx(total, rel=1e-12)


def test_clip_polygon_with_hole():
    g = parse_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    out = clip_geom(g, 0, 0, 5, 5)
    # quarter of the square minus quarter of the hole
    assert geom_area(out) == 25.0 - 1.0


def test_clip_line():
    line = np.array([[-5.0, 5.0], [15.0, 5.0]])
    subs = clip_line(line, 0, 0, 10, 10)
    assert len(subs) == 1
    assert np.array_equal(subs[0], [[0, 5], [10, 5]])
    zig = np.array([[-5.0, -5.0], [5.0, 5.0], [15.0, -5.0]])
    subs = clip_line(zig, 0, 0, 10, 10)
    assert len(subs) == 1  # contiguous through the corner
    total = sum(
        np.hypot(*np.diff(s, axis=0).T).sum() for s in subs
    )
    assert total == pytest.approx(np.hypot(5, 5) * 2, rel=1e-12)


def test_tile_materialize_matches_bruteforce(spark):
    from geos_spark.kernels import hilbert as H
    from geos_spark.operators.tiling import tile_materialize
    from geos_spark.sources.pages import EXTENT, star_polygons, star_vertices

    level = 4
    out = tile_materialize(
        star_polygons(spark).where("poly_id < 24"), level, extent=EXTENT
    )
    rows = {
        (r.poly_id, r.cell): (r.clipped_area, r.covers_fully)
        for r in out.collect()
    }
    # local brute force with the same kernel over all overlapping tiles
    n = 1 << level
    sx = (EXTENT[2] - EXTENT[0]) / n
    exp = {}
    for p in range(24):
        star = G.Geom(G.POLYGON, [star_vertices(p)])
        xmin, ymin, xmax, ymax = star.envelope()
        for cell in H.cells_for_envelope(level, xmin, ymin, xmax, ymax, EXTENT):
            tx0, ty0, tx1, ty1 = (
                float(v[0]) for v in H.tile_bounds(level, np.array([cell]), EXTENT)
            )
            c = clip_geom(star, tx0, ty0, tx1, ty1)
            if not c.is_empty:
                exp[(p, int(cell))] = geom_area(c)
    assert set(rows) == set(exp)
    for k, (area, full) in rows.items():
        assert area == pytest.approx(exp[k], rel=1e-12), k
        assert full == (area == sx * sx)
    # partition invariant distributed
    import collections

    per_poly = collections.defaultdict(float)
    for (p, _c), (area, _f) in rows.items():
        per_poly[p] += area
    for p in range(24):
        star = G.Geom(G.POLYGON, [star_vertices(p)])
        assert per_poly[p] == pytest.approx(geom_area(star), rel=1e-9)


def test_polygon_join_self_consistency(spark):
    """polygon_join (distributed two-phase + dedup) == brute-force
    relate over all pairs."""
    from pyspark.sql import functions as F

    from geos_spark.kernels import relate as R
    from geos_spark.kernels.wkb import parse_wkb
    from geos_spark.operators.spatial_join import polygon_join
    from geos_spark.sources.pages import EXTENT, star_polygons

    # shifted copy so star arms overlap neighbors
    a = star_polygons(spark).where("poly_id < 64")
    b = (
        star_polygons(spark)
        .where("poly_id < 64")
        .select(
            F.col("poly_id").alias("b_poly_id"),
            F.col("wkb").alias("bwkb"),
            (F.col("xmin") + 150).alias("bxmin"),
            (F.col("ymin") + 100).alias("bymin"),
            (F.col("xmax") + 150).alias("bxmax"),
            (F.col("ymax") + 100).alias("bymax"),
        )
    )
    # shift geometry too
    import numpy as np

    from geos_spark.kernels import geom as G
    from geos_spark.kernels.wkb import write_wkb
    from geos_spark.sources.pages import star_vertices

    shifted = []
    for p in range(64):
        v = star_vertices(p) + np.array([150.0, 100.0])
        shifted.append((p, bytearray(write_wkb(G.Geom(G.POLYGON, [v]))),
                        float(v[:, 0].min()), float(v[:, 1].min()),
                        float(v[:, 0].max()), float(v[:, 1].max())))
    b = spark.createDataFrame(
        shifted,
        "b_poly_id long, bwkb binary, bxmin double, bymin double,"
        " bxmax double, bymax double",
    )
    out = polygon_join(a, b, "intersects", level=5, extent=EXTENT)
    got = {(r.poly_id, r.b_poly_id) for r in out.collect()}

    exp = set()
    ga = [G.Geom(G.POLYGON, [star_vertices(p)]) for p in range(64)]
    gb = [
        G.Geom(G.POLYGON, [star_vertices(p) + np.array([150.0, 100.0])])
        for p in range(64)
    ]
    for i in range(64):
        for j in range(64):
            ei = ga[i].envelope()
            ej = gb[j].envelope()
            if ei[2] < ej[0] or ej[2] < ei[0] or ei[3] < ej[1] or ej[3] < ei[1]:
                continue
            if R.intersects(ga[i], gb[j]):
                exp.add((i, j))
    assert got == exp
