"""kNN and within-distance joins over point geometries.

- ``within_distance_join``: the global phase assigns each build-side
  geometry to every tile its d-expanded envelope overlaps (exactly the
  DBSCAN-style expanded-envelope query of the reference,
  ``include/geos/operation/cluster/DBSCANClusterFinder.h:34-38``);
  probe points join on their containing tile; a native squared-
  distance filter refines. No python in the plan at all for
  point-to-point distance.

- ``knn_join_broadcast``: exact kNN against a small build side —
  broadcast + window top-k (ties by id, matching GEOSSTRtree_nearest
  determinism).

- ``knn_join``: cell-ring-expansion kNN for large build sides:
  candidates from the probe's tile ring r=0,1,2... until the k-th
  candidate distance is below the ring lower bound. Implemented as a
  bounded iterative DataFrame loop (driver-side ring counter, no
  collect of data rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geos_spark.functions.hilbert_native import (
    with_tile_cell,
    with_tile_cells_exploded,
)
from geos_spark.functions.st import DEFAULT_EXTENT


def within_distance_join(
    probe: DataFrame,
    build: DataFrame,
    distance: float,
    *,
    probe_xy: tuple[str, str] = ("x", "y"),
    build_xy: tuple[str, str] = ("cx", "cy"),
    level: int = 6,
    extent=DEFAULT_EXTENT,
    broadcast_build: bool = True,
) -> DataFrame:
    """Pairs (probe, build) with euclidean distance <= d. Native-only
    plan: tile equijoin + codegen'd squared-distance filter."""
    px, py = probe_xy
    bx, by = build_xy
    p = with_tile_cell(probe, px, py, level, extent, out="__cell")
    b = with_tile_cells_exploded(
        build, (bx, by, bx, by), level, extent, out="__cell", pad=distance
    )
    if broadcast_build:
        # exploded side has no size estimate -> hint (see spatial_join)
        b = F.broadcast(b)
    d2 = (F.col(px) - F.col(bx)) ** 2 + (F.col(py) - F.col(by)) ** 2
    return p.join(b, "__cell").where(d2 <= F.lit(distance * distance)).drop(
        "__cell"
    )


def knn_join_broadcast(
    probe: DataFrame,
    build: DataFrame,
    k: int,
    *,
    probe_id: str = "doc_id",
    build_id: str = "poly_id",
    probe_xy: tuple[str, str] = ("x", "y"),
    build_xy: tuple[str, str] = ("cx", "cy"),
) -> DataFrame:
    """Exact kNN vs a broadcastable build side.

    Returns probe columns + (rank, build_id, dist2). Ties break by
    build id ascending (GEOSSTRtree_nearest tie determinism).
    """
    px, py = probe_xy
    bx, by = build_xy
    d2 = (F.col(px) - F.col(bx)) ** 2 + (F.col(py) - F.col(by)) ** 2
    scored = probe.join(F.broadcast(build)).withColumn("dist2", d2)
    w = Window.partitionBy(probe_id).orderBy(
        F.col("dist2").asc(), F.col(build_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def knn_join(
    probe: DataFrame,
    build: DataFrame,
    k: int,
    *,
    probe_id: str = "doc_id",
    build_id: str = "poly_id",
    probe_xy: tuple[str, str] = ("x", "y"),
    build_xy: tuple[str, str] = ("cx", "cy"),
    level: int = 4,
    extent=DEFAULT_EXTENT,
) -> DataFrame:
    """Cell-ring-expansion kNN (scale path for large build sides).

    Round with radius r: each *pending* probe explodes to the
    (2r+1)^2 grid cells within Chebyshev distance r of its own cell
    and equijoins the build side on (gx, gy) — a plain hash join, no
    theta/cross join anywhere. A probe is final once it has k
    candidates whose k-th squared distance <= (r * tile_side)^2 — the
    minimum possible distance to any cell beyond radius r (a point in
    an adjacent unexplored cell can be arbitrarily close to the shared
    border, hence the bound uses r, not r+1; exactly the
    branch-and-bound lower-bound reasoning of GEOSSTRtree_nearest,
    src/index/strtree/BoundablePair.cpp, transplanted to the grid).
    Radii double per round; when r covers the grid every probe is
    final by construction. Exact results; ties by build id.
    """
    minx, miny, maxx, maxy = extent
    n = 1 << level
    sx = (maxx - minx) / n
    sy = (maxy - miny) / n
    px, py = probe_xy
    bx, by = build_xy

    def grid(df: DataFrame, xc: str, yc: str, pre: str) -> DataFrame:
        gx = F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor((F.col(xc) - F.lit(minx)) / F.lit(sx))),
        )
        gy = F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor((F.col(yc) - F.lit(miny)) / F.lit(sy))),
        )
        return df.withColumn(pre + "gx", gx).withColumn(pre + "gy", gy)

    p = grid(probe, px, py, "p_")
    b = grid(build, bx, by, "b_")

    d2 = (F.col(px) - F.col(bx)) ** 2 + (F.col(py) - F.col(by)) ** 2
    tile_min = min(sx, sy)
    out_cols = [c for c in probe.columns] + ["rank", build_id, "dist2"]

    results = None
    pending = p
    r = 1
    while True:
        exploded = (
            pending.withColumn(
                "__ngx",
                F.explode(
                    F.sequence(F.col("p_gx") - r, F.col("p_gx") + r)
                ),
            )
            .withColumn(
                "__ngy",
                F.explode(
                    F.sequence(F.col("p_gy") - r, F.col("p_gy") + r)
                ),
            )
        )
        cand = exploded.join(
            b,
            (F.col("__ngx") == F.col("b_gx"))
            & (F.col("__ngy") == F.col("b_gy")),
        ).withColumn("dist2", d2)
        w = Window.partitionBy(probe_id).orderBy(
            F.col("dist2").asc(), F.col(build_id).asc()
        )
        topk = cand.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )
        exhausted = r >= n  # whole grid explored
        if exhausted:
            final_ids = pending.select(probe_id)
        else:
            bound = (r * tile_min) ** 2
            kth = topk.groupBy(probe_id).agg(
                F.count(F.lit(1)).alias("__n"), F.max("dist2").alias("__kth")
            )
            final_ids = kth.where(
                (F.col("__n") >= k) & (F.col("__kth") <= F.lit(bound))
            ).select(probe_id)
        done = topk.join(final_ids, probe_id, "left_semi").select(*out_cols)
        results = done if results is None else results.unionByName(done)
        if exhausted:
            break
        pending = pending.join(final_ids, probe_id, "left_anti")
        if pending.limit(1).count() == 0:
            break
        r = min(r * 2, n)
    return results
