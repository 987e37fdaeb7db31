"""geosop-style driver program (SURVEY §3.2).

The reference ships ``geosop`` — read A/B geometry inputs, run a named
op, print results + timings (``util/geosop/GeosOp.cpp``). This is the
engine's distributed equivalent, runnable via spark-submit:

    spark-submit --py-files geos_spark.zip -m geos_spark.cli \\
        --op intersects --a a.parquet --b b.parquet --out out.parquet

Ops: the spatial joins (intersects/contains/... between a point table
and a polygon table), tile (tile materialization), knn, cell (tile
assignment), plus geosop's scalar-op surface (``geosop --op area``
etc., `util/geosop/GeometryOp.cpp`) applied distributed over the
``wkb`` column — unary ops map the A table, binary ops join A/B on
``id`` first; parametrized ops (simplifyDP, densify, concaveHull,
maxInscribedCircle, ...) take the geosop opArg via ``--arg``. Inputs
are parquet tables with either (x, y) point columns or (wkb, xmin,
ymin, xmax, ymax) geometry columns. Prints a one-line JSON timing
summary per op (the geosop ``-t`` analogue).
"""

from __future__ import annotations

import argparse
import json
import time

# geosop scalar op name -> (st attribute, shape). Shapes: "u" unary
# column udf over wkb; "uf0" unary zero-arg factory; "uf" unary
# factory taking the --arg scalar; "b" binary udf over (wkb, wkb_b);
# "bf0" zero-arg factory returning a binary udf; "bsr" fixed-precision
# overlay (st_overlay(op, scale=--arg) over (wkb, wkb_b)).
SCALAR_OPS = {
    "area": ("st_area", "u"),
    "length": ("st_length", "u"),
    "boundary": ("st_boundary", "u"),
    "convexHull": ("st_convexhull", "u"),
    "envelope": ("st_envelope_struct", "u"),
    "interiorPoint": ("st_pointonsurface", "u"),
    "isEmpty": ("st_isempty", "u"),
    "isSimple": ("st_issimple", "u"),
    "isValid": ("st_isvalid", "u"),
    "fixInvalid": ("st_makevalid", "u"),
    "makeValid": ("st_makevalid", "u"),
    "normalize": ("st_normalize", "u"),
    "reverse": ("st_reverse", "u"),
    "unaryUnion": ("st_unaryunion", "u"),
    "node": ("st_node", "u"),
    "polygonize": ("st_polygonize", "u"),
    "polygonizeValid": ("st_polygonizevalid", "u"),
    "buildArea": ("st_buildarea", "u"),
    "minAreaRectangle": ("st_minimumrotatedrectangle", "u"),
    "minDiameter": ("st_minimumwidth", "u"),
    "minBoundingCircle": ("st_minimumboundingcircle", "u"),
    "minClearance": ("st_minclearance", "u"),
    "delaunay": ("st_delaunaytriangles", "uf0"),
    "voronoi": ("st_voronoidiagram", "uf0"),
    "lineMerge": ("st_linemerge", "uf0"),
    "simplifyDP": ("st_simplify", "uf"),
    "simplifyTP": ("st_simplifytp", "uf"),
    "densify": ("st_densify", "uf"),
    "concaveHull": ("st_concavehull", "uf"),
    "offsetCurve": ("st_offsetcurve", "uf"),
    "maxInscribedCircle": ("st_maximuminscribedcircle", "uf"),
    "largestEmptyCircle": ("st_largestemptycircle", "uf"),
    "reducePrecision": ("st_setprecision", "uf"),
    # float overlay binaries (lowercase aliases are handled by the
    # dedicated branch in main(); these are the geosop spellings)
    "symDifference": ("st_symdifference", "b"),
    # fixed-precision (snap-rounding) overlay: --arg is the PM scale
    "intersectionSR": ("intersection", "bsr"),
    "unionSR": ("union", "bsr"),
    "differenceSR": ("difference", "bsr"),
    "symDifferenceSR": ("symdifference", "bsr"),
    # "buffer" itself has a dedicated branch in main() (--distance)
    "bufferSingleSided": ("st_singlesidedbuffer", "uf"),
    "interpolate": ("st_interpolate", "uf"),
    "project": ("st_project", "bf0"),
    "hasZ": ("st_hasz", "u"),
    "hasM": ("st_hasm", "u"),
    "concaveHullByLength": ("st_concavehullbylength", "uf"),
    "relate": ("st_relate", "b"),
    "distance": ("st_distance", "b"),
    "hausdorffDistance": ("st_hausdorffdistance", "b"),
    "frechetDistance": ("st_frechetdistance", "b"),
    "nearestPoints": ("st_nearestpoints", "b"),
    "sharedPaths": ("st_sharedpaths", "b"),
    "equalsIdentical": ("st_equalsidentical", "b"),
}
# `centroid` is handled explicitly: st_centroid_x/_y (two doubles).


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("geos-spark")
    ap.add_argument("--op", required=True)
    ap.add_argument("--a", required=True, help="probe table (parquet)")
    ap.add_argument("--b", help="build table (parquet)")
    ap.add_argument("--out", help="output parquet path")
    ap.add_argument("--level", type=int, default=8)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--distance", type=float, default=50.0)
    ap.add_argument(
        "--extent", type=float, nargs=4, default=[0.0, 0.0, 4096.0, 4096.0]
    )
    ap.add_argument("--repeat", type=int, default=1, help="geosop -r analogue")
    ap.add_argument(
        "--arg", type=float, default=None,
        help="scalar op argument (geosop opArg): tolerance/ratio/scale",
    )
    args = ap.parse_args(argv)

    from geos_spark.session import get_spark

    spark = get_spark(f"geosop_{args.op}")
    extent = tuple(args.extent)
    a = spark.read.parquet(args.a)
    b = spark.read.parquet(args.b) if args.b else None

    def run():
        if args.op in (
            "intersects", "contains", "within", "covers", "coveredby", "touches",
        ):
            from geos_spark.operators.spatial_join import point_in_polygon_join

            return point_in_polygon_join(
                a, b, args.op, level=args.level, extent=extent
            )
        if args.op == "cell":
            from geos_spark.functions.hilbert_native import with_tile_cell

            return with_tile_cell(a, "x", "y", args.level, extent)
        if args.op == "tile":
            from geos_spark.operators.tiling import tile_materialize

            return tile_materialize(a, args.level, extent=extent)
        if args.op == "knn":
            from geos_spark.operators.knn import knn_join

            return knn_join(
                a, b, args.k, level=max(args.level - 4, 2), extent=extent
            )
        if args.op == "withindistance":
            from geos_spark.operators.knn import within_distance_join

            return within_distance_join(
                a, b, args.distance, level=args.level, extent=extent
            )
        if args.op in ("intersection", "union", "difference", "symdifference"):
            # pairwise overlay of wkb columns (wkb in a, wkb_b in b-table
            # joined by row id, or self-table columns wkb/wkb_b)
            from geos_spark.functions import st

            f = st.st_overlay(args.op)
            src = a if b is None else a.join(b, "id")
            return src.withColumn("result_wkb", f("wkb", "wkb_b"))
        if args.op == "buffer":
            from geos_spark.functions import st

            return a.withColumn(
                "result_wkb", st.st_buffer(args.distance)("wkb")
            )
        if args.op == "unaryunion":
            from geos_spark.functions import st

            return a.withColumn("result_wkb", st.st_unaryunion("wkb"))
        if args.op == "makevalid":
            from geos_spark.functions import st

            return a.withColumn("result_wkb", st.st_makevalid("wkb"))
        if args.op == "centroid":
            from geos_spark.functions import st

            return a.withColumn(
                "centroid_x", st.st_centroid_x("wkb")
            ).withColumn("centroid_y", st.st_centroid_y("wkb"))
        if args.op in SCALAR_OPS:
            from pyspark.sql import functions as F

            from geos_spark.functions import st

            name, shape = SCALAR_OPS[args.op]
            # "bsr" carries the overlay op name, not an st attribute
            f = getattr(st, name) if shape != "bsr" else None
            if shape == "u":
                return a.withColumn("result", f(F.col("wkb")))
            if shape == "uf0":
                return a.withColumn("result", f()(F.col("wkb")))
            if shape == "uf":
                if args.arg is None:
                    raise SystemExit(
                        f"--op {args.op} needs --arg (geosop opArg)"
                    )
                return a.withColumn("result", f(args.arg)(F.col("wkb")))
            # binary shapes: join A/B on id (geosop -a/-b pairing)
            if b is None:
                raise SystemExit(f"--op {args.op} needs --b")
            bb = b.select(
                F.col("id"), F.col("wkb").alias("wkb_b")
            )
            joined = a.join(bb, "id")
            if shape == "bf0":
                return joined.withColumn(
                    "result", f()(F.col("wkb"), F.col("wkb_b"))
                )
            if shape == "bsr":
                if args.arg is None:
                    raise SystemExit(
                        f"--op {args.op} needs --arg (precision scale)"
                    )
                return joined.withColumn(
                    "result",
                    st.st_overlay(name, float(args.arg))(
                        F.col("wkb"), F.col("wkb_b")
                    ),
                )
            return joined.withColumn(
                "result", f(F.col("wkb"), F.col("wkb_b"))
            )
        if args.op == "cluster":
            from geos_spark.operators.cluster import cluster_within_distance

            return cluster_within_distance(
                a.withColumnRenamed("doc_id", "id"), args.distance,
                level=args.level, extent=extent,
            )
        raise SystemExit(f"unknown op {args.op!r}")

    rows = 0
    times = []
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        df = run()
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            rows = spark.read.parquet(args.out).count()
        else:
            rows = df.count()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {"op": args.op, "rows": rows, "sec": min(times), "runs": times}
        )
    )


if __name__ == "__main__":
    main()
